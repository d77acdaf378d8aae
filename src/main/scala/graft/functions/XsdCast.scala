package graft.functions

import java.time._
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lenient xsd:dateTime parser as a custom Catalyst expression
  * (SURVEY §2.11 / §7.5 hard-part 1; reference:
  * core/util/xsd_parser.pl + speculative_parse.pl — DCG parsers that
  * accept ISO timestamps with/without zone, date-only, gYear, negative
  * years). Spark's `to_timestamp` handles only one format at a time;
  * this expression tries the xsd family in order. Scalar, null-safe,
  * CodegenFallback (interpreted eval is fine: parsing dominates). */
case class XsdTimestampCast(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xsd_ts"

  protected override def nullSafeEval(input: Any): Any = {
    XsdTimestampCast.parseMicros(input.asInstanceOf[UTF8String].toString).orNull
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XsdTimestampCast {
  private val localDateTime = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  /** Epoch micros for the xsd:dateTime / date / gYear family; None if
    * unparseable. Zone-less values are UTC (session convention). */
  def parseMicros(raw: String): Option[java.lang.Long] = {
    val s = raw.trim
    def micros(i: Instant): java.lang.Long =
      java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    val attempts: Seq[() => Instant] = Seq(
      () => Instant.parse(s),                                  // ...Z
      () => OffsetDateTime.parse(s).toInstant,                 // ...+05:00
      () => LocalDateTime.parse(s, localDateTime).toInstant(ZoneOffset.UTC),
      () => LocalDateTime.parse(s.replace(' ', 'T'), localDateTime)
        .toInstant(ZoneOffset.UTC),                            // space sep
      () => LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC), // date / -0044-03-15
      () => Year.parse(s).atDay(1).atStartOfDay.toInstant(ZoneOffset.UTC)) // gYear
    attempts.foreach { f =>
      try return Some(micros(f())) catch { case _: Exception => }
    }
    None
  }

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Register once per session; use via [[xsdTs]]. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_xsd_ts", exprs => XsdTimestampCast(exprs.head), "built-in")
    }

  def xsdTs(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_xsd_ts", c)
  }
}
