package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.GroupTopK

/** Native per-group top-k (plans/GroupTopKPlan): row-equality with the
  * window formulation, physical shape, and edge cases. */
class GroupTopKSpec extends AnyFunSuite {
  import TestSpark._

  test("matches the window row_number formulation row for row") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map { i =>
      (rnd.nextInt(7).toLong, i.toLong, rnd.nextInt(1000).toLong) }
      .toDF("g", "id", "v").repartition(9)
    val native = GroupTopK.topK(df, Seq("g"),
        Seq(("v", true), ("id", false)), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val window = df.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(native == window)
  }

  test("groups smaller than k emit all rows; ranks are 1..n") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (2L, 9L)).toDF("g", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", false)), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 2L), (2L, 9L, 1L)))
  }

  private def finalPlan(q: org.apache.spark.sql.DataFrame) =
    q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("physical plan is partial heaps + ONE exchange + final rank") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5, i)).toDF("g", "v").repartition(4)
    val q = GroupTopK.topK(df, Seq("g"), Seq(("v", true)), 3)
    q.collect()
    val plan = finalPlan(q).toString
    assert(plan.contains("GroupTopKPartial"), s"partial phase missing:\n$plan")
    assert(plan.contains("GroupTopKFinal"), s"final phase missing:\n$plan")
    // exactly one shuffle between the phases (the repartition above is
    // a RoundRobin exchange, not hashpartitioning)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 clustered exchange, got $exchanges:\n$plan")
  }

  test("partial phase prunes: the exchange carries at most k rows per group per partition") {
    import spark.implicits._
    // 8 partitions × 1 group × k=2 → final input ≤ 16 rows of 10000
    val df = (1 to 10000).map(i => (0L, i.toLong)).toDF("g", "v").repartition(8)
    val q = GroupTopK.topK(df, Seq("g"), Seq(("v", true)), 2)
    q.collect()
    // descend through AQE query-stage leaves (QueryStageExec hides its
    // subtree from TreeNode.collect)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(s.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val metrics = allNodes(finalPlan(q)).collect {
      case p: graft.plans.GroupTopKPartialExec => p.metrics("numOutputRows").value
    }
    assert(metrics.nonEmpty && metrics.head <= 16,
      s"partial emitted ${metrics.headOption} rows — pruning lost")
  }

  test("null group keys form their own group") {
    import spark.implicits._
    val df = Seq((Some(1L), 1L), (None, 2L), (None, 3L))
      .toDF("g", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", true)), 1)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (-1L, 3L)))
  }
}
