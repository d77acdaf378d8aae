package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types._

/** Fused WordPiece piece-count over a document's word array: apply the
  * ordered merge list to every word and return the total piece count —
  * one imperative loop per row, zero intermediate arrays.
  *
  * The composed form ([[graft.llm.TextAnalysis.wordpieceEncode]]'s
  * original `aggregate(transform(words, fold-of-8-merges))`) stacks
  * higher-order functions 8 merges deep; Spark evaluates lambda
  * functions INTERPRETED (no whole-stage codegen) and the inner
  * accumulator concatenates an array per symbol, so the cost per word
  * OCCURRENCE was ~len² allocations × merges — measured 14 s steady at
  * sf0.1 on the streaming encode path (BenchOne r14, the entry's first
  * standalone measurement). This expression is the [[ArrayDot]]
  * treatment: same algorithm, one static call, whole-stage codegen,
  * allocation only for the per-word symbol buffer.
  *
  * Semantics replicated EXACTLY from the column fold (the DuckDB
  * oracle replays it): symbols = first char + ##-continuations; each
  * merge pass is a left-to-right carry scan — a merged symbol resets
  * the carry, so same-pass chaining is impossible — and passes run in
  * merge-rank order. The merge list rides as a foldable literal
  * array<array<string>> right child: (lhs, rhs, merged) triples. */
case class WordpieceCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wp_count"

  protected override def nullSafeEval(words: Any, merges: Any): Any =
    WordpieceCount.count(words.asInstanceOf[ArrayData],
      merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) =>
      s"${ev.value} = graft.functions.WordpieceCount.count($w, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordpieceCount {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_wp_count", exprs => WordpieceCount(exprs.head, exprs(1)),
        "built-in")
    }

  /** Total WordPiece piece count of a word-array column under the
    * trained merge table. */
  def pieces(words: Column,
             merges: Seq[(Long, String, String, Long, Long)]): Column = {
    ensureRegistered(SparkSession.active)
    val mergeLit = array(merges.map { case (_, l, r, _, _) =>
      array(lit(l), lit(r), lit(l + r.stripPrefix("##")))
    }: _*)
    call_function("graft_wp_count", words, mergeLit)
  }

  /** Static worker the generated code calls. */
  def count(words: ArrayData, merges: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      total += piecesOf(words.getUTF8String(i).toString, merges)
      i += 1
    }
    total
  }

  private def piecesOf(w: String, merges: ArrayData): Long = {
    if (w.isEmpty) return 0L
    // initial symbols: first char bare, continuations ##-prefixed
    var syms = new java.util.ArrayList[String](w.length)
    syms.add(w.substring(0, 1))
    var c = 1
    while (c < w.length) { syms.add("##" + w.charAt(c)); c += 1 }
    var m = 0
    val nm = merges.numElements()
    while (m < nm && syms.size > 1) {
      val t = merges.getArray(m)
      val l = t.getUTF8String(0).toString
      val r = t.getUTF8String(1).toString
      val mg = t.getUTF8String(2).toString
      // left-to-right carry scan (exact replica of the column fold:
      // a merge resets the carry, so no same-pass chaining)
      val out = new java.util.ArrayList[String](syms.size)
      var carry: String = null
      var i = 0
      while (i < syms.size) {
        val s = syms.get(i)
        if (carry == l && s == r) { out.add(mg); carry = null }
        else if (carry != null) { out.add(carry); carry = s }
        else carry = s
        i += 1
      }
      if (carry != null) out.add(carry)
      syms = out
      m += 1
    }
    syms.size.toLong
  }
}
