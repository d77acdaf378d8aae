package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSessionExtensions
import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, GraftExtensions, GraftStrategy, NativeAsof}

/** Native (LogicalPlan + Strategy + SparkPlan) as-of join vs the
  * composed union+window implementation it replaces. */
class NativeAsofSpec extends AnyFunSuite {
  import TestSpark._

  private def quotes = {
    import spark.implicits._
    Seq(
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 20L, 2.5), ("a", 40L, 4.0),
      ("b", 15L, 9.0),
      ("c", 99L, 7.0)
    ).toDF("k", "rts", "px")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      ("a", 5L), ("a", 20L), ("a", 39L), ("a", 41L),
      ("b", 14L), ("b", 15L),
      ("d", 50L)
    ).toDF("k", "lts")
  }

  test("matches the composed union+window implementation row for row") {
    val composed = AsofJoin.backward(trades, quotes, Seq("k"),
      "lts", "rts", Seq("rts", "px"), rightTie = Some("px"))
    val native = NativeAsof.backward(trades, quotes, Seq("k"),
      "lts", "rts", Seq("rts", "px"), rightTie = Some("px"))
    assert(native.columns.toSeq == composed.columns.toSeq)
    val c = composed.orderBy("k", "lts").collect().map(_.toSeq).toSeq
    val n = native.orderBy("k", "lts").collect().map(_.toSeq).toSeq
    assert(n == c)
  }

  test("backward semantics: <= match, ties to max tie, left outer") {
    val got = NativeAsof.backward(trades, quotes, Seq("k"),
      "lts", "rts", Seq("px"), rightTie = Some("px"))
      .orderBy("k", "lts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(got == Seq(
      ("a", 5L, null),    // no quote yet
      ("a", 20L, 2.5),    // co-timestamped quote matches; max tie wins
      ("a", 39L, 2.5),    // carries forward
      ("a", 41L, 4.0),
      ("b", 14L, null),
      ("b", 15L, 9.0),
      ("d", 50L, null)))  // key with no right rows at all
  }

  test("physical plan is the native exec: two narrow shuffles, no union") {
    val native = NativeAsof.backward(trades, quotes, Seq("k"),
      "lts", "rts", Seq("px"))
    val phys = native.queryExecution.executedPlan.toString
    assert(phys.contains("AsofJoin"))
    assert(!phys.contains("Window"))
    assert(!phys.contains("Union"))
    val plan = native.queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(resolved.collect { case e: AsofJoinExec => e }.nonEmpty ||
      phys.contains("AsofJoinExec"))
  }

  test("works on a larger shuffled self-join shape (same-source sides)") {
    import spark.implicits._
    val n = 5000
    val events = (1 to n).map { i =>
      (i % 37L, i.toLong, if (i % 3 == 0) "obs" else "probe", i * 1.5)
    }.toDF("k", "ts", "kind", "v")
    val lefts = events.where($"kind" === "probe").select("k", "ts")
    val rights = events.where($"kind" === "obs")
      .select($"k", $"ts".as("ots"), $"v")
    val composed = AsofJoin.backward(lefts, rights, Seq("k"),
      "ts", "ots", Seq("ots", "v"))
    val native = NativeAsof.backward(lefts, rights, Seq("k"),
      "ts", "ots", Seq("ots", "v"))
    assert(native.orderBy("k", "ts").collect().map(_.toSeq).toSeq ==
      composed.orderBy("k", "ts").collect().map(_.toSeq).toSeq)
  }

  test("GraftExtensions injects the planner strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val built = org.apache.spark.sql.GraftPlanBridge.plannerStrategies(ext, spark)
    assert(built.contains(GraftStrategy))
  }
}
