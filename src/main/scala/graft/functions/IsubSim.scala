package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** isub string similarity (Stoilos, Stamou & Kollias 2005, "A String
  * Metric for Ontology Alignment") — the metric the reference's fuzzy
  * `like/3` uses ([ref:core/util/utils.pl]); shipped beside the Dice
  * default of [[GraftFunctions.dice_similarity]] and selected by
  * `LikeSim(..., metric = "isub")`.
  *
  * score = commonality − dissimilarity + winkler, where commonality
  * iteratively removes the longest common substring (counting only
  * lengths ≥ 3) from both lowercased inputs; dissimilarity is the
  * Stoilos unmatched-fraction term with p = 0.6; winkler is the
  * Jaro-Winkler-style prefix boost (≤ 4 chars, factor 0.1).
  *
  * The published algorithm leaves the longest-common-substring
  * tie-break unspecified; we pin a deterministic spec replayed verbatim
  * by the DuckDB oracle: longest length first, then smallest start in
  * the first string, then the FIRST occurrence in the second string.
  * Both-empty scores 1, one-empty scores 0 (the Java reference
  * implementation's −1 sentinel is an error code, not a similarity).
  *
  * The inner loop is an iterative string rewrite no composition of
  * Spark built-ins expresses, so this is a custom Catalyst expression
  * (SURVEY §2.11 preference order) whose generated code calls
  * [[IsubSim.score]] — one static call, stays inside whole-stage
  * codegen like any regexp-style built-in. */
case class IsubSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_isub"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    IsubSim.score(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IsubSim.score($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IsubSim {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_isub", exprs => IsubSim(exprs.head, exprs(1)), "built-in")
    }

  def isub(a: Column, b: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_isub", a, b)
  }

  /** Stoilos 2005 score over lowercased strings (see class doc for the
    * pinned tie-break spec). Called from generated code — keep it a
    * plain static method on primitive/String types. */
  def score(aRaw: String, bRaw: String): Double = {
    val a = aRaw.toLowerCase
    val b = bRaw.toLowerCase
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    var s1 = a
    var s2 = b
    var common = 0
    var go = true
    while (go && s1.nonEmpty && s2.nonEmpty) {
      // longest common substring ≥ 3; min start in s1; first occ in s2
      var bestLen = 0; var bestI = -1; var bestJ = -1
      var i = 0
      while (i < s1.length) {
        var len = math.max(bestLen, 2) + 1 // only strictly longer, ≥ 3
        var lastLen = 0; var lastJ = -1
        var j = 0
        while (i + len <= s1.length &&
               { j = s2.indexOf(s1.substring(i, i + len)); j >= 0 }) {
          lastLen = len; lastJ = j; len += 1
        }
        if (lastLen > bestLen) { bestLen = lastLen; bestI = i; bestJ = lastJ }
        i += 1
      }
      if (bestLen >= 3) {
        common += bestLen
        s1 = s1.substring(0, bestI) + s1.substring(bestI + bestLen)
        s2 = s2.substring(0, bestJ) + s2.substring(bestJ + bestLen)
      } else go = false
    }
    val commonality = 2.0 * common / (l1 + l2)
    var pre = 0
    val maxPre = math.min(4, math.min(l1, l2))
    while (pre < maxPre && a.charAt(pre) == b.charAt(pre)) pre += 1
    val winkler = pre * 0.1 * (1.0 - commonality)
    val u1 = math.max(l1 - common, 0).toDouble / l1
    val u2 = math.max(l2 - common, 0).toDouble / l2
    val p = 0.6
    val unmatched = u1 * u2
    val dissim = unmatched / (p + (1 - p) * (u1 + u2 - unmatched))
    commonality - dissim + winkler
  }
}
