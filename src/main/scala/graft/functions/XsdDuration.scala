package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xsd:duration lexical validation + canonicalization (reference:
  * core/triple/casting.pl duration clauses — the one typed cast the
  * xsd matrix still lacked). XSD 1.0 canonical form: the year/month
  * block reduces to total months re-expressed as Y/M with M < 12; the
  * day/time block reduces to total seconds re-expressed as D/H/M/S
  * with H < 24, M < 60, S < 60; zero components are omitted; the zero
  * duration renders as `PT0S`. All arithmetic is exact (BigInteger
  * months, BigDecimal seconds at scale 9 — the documented precision
  * bound of this cast), so the canonical string is bit-identical
  * across engines; invalid lexicals → null, consistent with the
  * lenient cast matrix.
  *
  * Implemented as a custom Catalyst expression whose generated code is
  * ONE static call (SURVEY §2.11 preference order, like [[IsubSim]]).
  * The previous pure-Column formulation repeated the 7-group
  * regexp_extract at every use site of every intermediate — the
  * expanded tree generated > 64 KB of Java for a single method, so
  * Janino rejected it and the WHOLE stage (scan + every fused
  * neighbor) fell back to interpreted execution. One static call keeps
  * the stage inside whole-stage codegen like any regexp-style
  * built-in. */
case class DurationCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_duration_canon"

  protected override def nullSafeEval(input: Any): Any =
    XsdDuration.canonU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.XsdDuration.canonU($c);
      |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XsdDuration {

  // validity: something must follow P; a T block must contain at least
  // one time component (lookaheads keep "P" / "P1YT" / "PT" invalid)
  private val validRe = java.util.regex.Pattern.compile(
    "^-?P(?=.)(?:\\d+Y)?(?:\\d+M)?(?:\\d+D)?(?:T(?=\\d)(?:\\d+H)?(?:\\d+M)?(?:\\d+(?:\\.\\d+)?S)?)?$")
  private val extractRe = java.util.regex.Pattern.compile(
    "^(-)?P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$")

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_duration_canon", exprs => DurationCanon(exprs.head), "built-in")
    }

  /** Validated lexical → canonical lexical (null when invalid). */
  def canonical(c: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_duration_canon", c)
  }

  /** UTF8String shim for generated code / nullSafeEval. */
  def canonU(in: UTF8String): UTF8String = {
    val r = canon(in.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  private val Twelve = BigInteger.valueOf(12)
  private val SecD = new JBigDecimal(86400)
  private val SecH = new JBigDecimal(3600)
  private val SecM = new JBigDecimal(60)

  /** The canonicalization itself — plain static method on Strings so
    * the generated call site stays trivial. Trims ASCII spaces only
    * (matching SQL trim on both engines). */
  def canon(raw: String): String = {
    var a = 0; var b = raw.length
    while (a < b && raw.charAt(a) == ' ') a += 1
    while (b > a && raw.charAt(b - 1) == ' ') b -= 1
    val s = raw.substring(a, b)
    if (!validRe.matcher(s).matches()) return null
    val m = extractRe.matcher(s)
    if (!m.matches()) return null
    val neg = m.group(1) != null
    def grp(i: Int): BigInteger = {
      val g = m.group(i)
      if (g == null || g.isEmpty) BigInteger.ZERO else new BigInteger(g)
    }
    val months = grp(2).multiply(Twelve).add(grp(3))
    val intSecs = grp(4).multiply(BigInteger.valueOf(24)).add(grp(5))
      .multiply(BigInteger.valueOf(60)).add(grp(6))
      .multiply(BigInteger.valueOf(60))
    val fracG = m.group(7)
    val frac =
      if (fracG == null || fracG.isEmpty) JBigDecimal.ZERO
      else new JBigDecimal(fracG).setScale(9, RoundingMode.HALF_UP)
    val secs = new JBigDecimal(intSecs).setScale(9).add(frac)
    val cy = months.divide(Twelve)
    val cm = months.mod(Twelve)
    val cd = secs.divideToIntegralValue(SecD).toBigInteger
    val rem1 = secs.subtract(new JBigDecimal(cd).multiply(SecD))
    val ch = rem1.divideToIntegralValue(SecH).toBigInteger
    val rem2 = rem1.subtract(new JBigDecimal(ch).multiply(SecH))
    val cmi = rem2.divideToIntegralValue(SecM).toBigInteger
    val cs = rem2.subtract(new JBigDecimal(cmi).multiply(SecM))
    val timeAny = ch.signum > 0 || cmi.signum > 0 || cs.signum > 0
    if (cy.signum == 0 && cm.signum == 0 && cd.signum == 0 && !timeAny)
      return "PT0S"
    val sb = new StringBuilder(if (neg) "-P" else "P")
    def part(v: BigInteger, suffix: Char): Unit =
      if (v.signum > 0) { sb.append(v.toString).append(suffix); () }
    part(cy, 'Y'); part(cm, 'M'); part(cd, 'D')
    if (timeAny) {
      sb.append('T')
      part(ch, 'H'); part(cmi, 'M')
      if (cs.signum > 0) {
        // scale-9 plain rendering: strip an actual fraction's trailing
        // zeros, then a bare trailing dot — never integer digits
        var t = cs.toPlainString
        if (t.indexOf('.') >= 0) {
          var e = t.length
          while (e > 0 && t.charAt(e - 1) == '0') e -= 1
          if (e > 0 && t.charAt(e - 1) == '.') e -= 1
          t = t.substring(0, e)
        }
        sb.append(t).append('S')
      }
    }
    sb.toString
  }
}
