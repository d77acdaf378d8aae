package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** N-Triples / N-Quads string-literal unescape (W3C RDF 1.1 N-Triples
  * grammar, ECHAR + UCHAR productions): `\t \b \n \r \f \" \' \\` plus
  * `\uXXXX` and `\U000XXXXX` (the 8-hex form appends a full code point,
  * so astral-plane characters round-trip through surrogate pairs).
  *
  * The reference's turtle loader performs the same unescape in its
  * parser ([ref:core/triple/turtle_utils.pl]); here the distributed
  * N-Triples reader ([[graft.sources.NTriples]]) runs it per line on
  * executors, so it must stay inside whole-stage codegen — a custom
  * Catalyst expression whose generated code is one static call, exactly
  * like the regexp built-ins it runs beside (SURVEY §2.11 preference
  * order: composition can't express the stateful scan, an `Expression`
  * beats a UDF).
  *
  * Invalid escapes (`\q`, truncated `\u12`) pass the backslash through
  * verbatim instead of raising: at 100 TB a reader that throws on one
  * bad byte in a shard is useless, and the strict/permissive line-level
  * gate in the reader is where malformed input policy lives. */
case class NtUnescape(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nt_unescape"

  protected override def nullSafeEval(v: Any): Any =
    NtUnescape.unescape(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NtUnescape.unescape($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NtUnescape {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nt_unescape", exprs => NtUnescape(exprs.head), "built-in")
    }

  /** Unescaped view of an N-Triples literal-content column. */
  def unescapeCol(c: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_nt_unescape", c)
  }

  /** Static worker the generated code calls. Fast path: no backslash →
    * return the input UTF8String untouched (zero allocation). */
  def unescape(s: UTF8String): UTF8String = {
    val raw = s.toString
    if (raw.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != '\\' || i + 1 >= raw.length) { sb.append(c); i += 1 }
      else raw.charAt(i + 1) match {
        case 't' => sb.append('\t'); i += 2
        case 'b' => sb.append('\b'); i += 2
        case 'n' => sb.append('\n'); i += 2
        case 'r' => sb.append('\r'); i += 2
        case 'f' => sb.append('\f'); i += 2
        case '"' => sb.append('"'); i += 2
        case '\'' => sb.append('\''); i += 2
        case '\\' => sb.append('\\'); i += 2
        case 'u' if i + 6 <= raw.length && isHex(raw, i + 2, 4) =>
          sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
          i += 6
        case 'U' if i + 10 <= raw.length && isHex(raw, i + 2, 8) =>
          sb.appendCodePoint(Integer.parseInt(raw.substring(i + 2, i + 10), 16))
          i += 10
        case _ => sb.append(c); i += 1 // invalid escape: pass through
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private def isHex(s: String, from: Int, n: Int): Boolean = {
    var i = from
    while (i < from + n) {
      val c = s.charAt(i)
      val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      if (!hex) return false
      i += 1
    }
    true
  }
}
