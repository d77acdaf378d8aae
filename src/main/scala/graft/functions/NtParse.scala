package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass N-Triples / N-Quads term extraction: match the line
  * grammar ONCE and return every captured term as a struct field.
  *
  * The composed reader ran one `regexp_extract` per captured group —
  * 10-12 full anchored-regex matches per line. Each is linear, but at
  * 100 TB ingest the parse is the scan's whole CPU budget, so the
  * 10× re-matching is the difference between ingest at storage
  * bandwidth and ingest at regex speed. This expression is the same
  * Java regex (verbatim — `find()` like `rlike`, so validity semantics
  * are bit-identical), one `Matcher`, all groups read off the single
  * match. Returns NULL for a non-matching line — the reader turns that
  * into the strict raise / permissive drop.
  *
  * Group numbering (the grammar of [[graft.sources.NTriples]]):
  * 1 s_iri, 2 s_bn, 3 p, 4 o_iri, 5 o_bn, 6 quoted content, 7 lang,
  * 8 datatype, 9 bare numeric, 10 bare boolean, 11 g_iri, 12 g_bn
  * (11-12 only in quads mode). Non-participating groups are NULL;
  * matched-empty groups are "" (the reader's opt()/nullif law). */
case class NtParse(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = NtParse.schema
  // parse() returns null for malformed lines even when both inputs are
  // non-null, so nullability must not be derived from the children:
  // with a non-nullable line column Catalyst would fold `IS NOT NULL`
  // to true and disable the reader's strict/permissive gates.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nt_parse"

  protected override def nullSafeEval(line: Any, quads: Any): Any =
    NtParse.parse(line.asInstanceOf[UTF8String],
      quads.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, q) => {
      // parse() may return null (no match) — propagate as expression null
      s"""${ev.value} = graft.functions.NtParse.parse($l, $q);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NtParse {

  private val IRI = "<([^>]*)>"
  private val BN = "(_:[^\\s]+)"
  private val LIT =
    "\"((?:[^\"\\\\]|\\\\.)*)\"(?:@([A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)|\\^\\^<([^>]*)>)?"
  private val NUM =
    "([+-]?(?:\\d+\\.\\d+(?:[eE][+-]?\\d+)?|\\.\\d+(?:[eE][+-]?\\d+)?|\\d+[eE][+-]?\\d+|\\d+))"
  private val BOOL = "(true|false)"

  private val tripleBody =
    s"^(?:$IRI|$BN)\\s+$IRI\\s+(?:$IRI|$BN|$LIT|$NUM|$BOOL)"
  /** The full line grammars — also the reference regexes the reader's
    * scaladoc documents. */
  val triplePat: String = tripleBody + "\\s*\\.\\s*(?:#.*)?$"
  val quadPat: String = tripleBody + s"(?:\\s+(?:$IRI|$BN))?\\s*\\.\\s*(?:#.*)?$$"

  private val tripleRe = java.util.regex.Pattern.compile(triplePat)
  private val quadRe = java.util.regex.Pattern.compile(quadPat)

  val fieldNames: Seq[String] = Seq("s_iri", "s_bn", "p", "o_iri", "o_bn",
    "lit", "lang", "dtype", "num", "bool", "g_iri", "g_bn")

  val schema: StructType =
    StructType(fieldNames.map(StructField(_, StringType)))

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_nt_parse", exprs => NtParse(exprs.head, exprs(1)), "built-in")
    }

  /** Parsed-terms struct of a trimmed line column (null = no match). */
  def parseCol(line: Column, quads: Boolean): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_nt_parse", line, lit(quads))
  }

  /** Static worker the generated code calls; null when the line does
    * not match the grammar. */
  def parse(line: UTF8String, quads: Boolean): InternalRow = {
    val m = (if (quads) quadRe else tripleRe).matcher(line.toString)
    if (!m.find()) return null
    val out = new Array[Any](12)
    val n = if (quads) 12 else 10
    var i = 0
    while (i < n) {
      val g = m.group(i + 1)
      out(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericInternalRow(out)
  }
}
