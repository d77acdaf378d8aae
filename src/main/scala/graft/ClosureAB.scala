package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured A/B for UNBOUNDED (both endpoints free) transitive closure:
  * semi-naive DataFrame iteration vs GraphX Pregel, over the full
  * 6-predicate FK alt-union graph.
  * `runMain graft.ClosureAB <sfDir> [reps]` — results recorded in
  * BASELINE.md ("unbounded closure A/B"). */
object ClosureAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Graft.ctx(spark, sfDir)
    val preds = Seq("tpch:l_orderkey", "tpch:o_custkey", "tpch:c_nationkey",
      "tpch:n_regionkey", "tpch:s_nationkey", "tpch:l_suppkey")
    val edges = ctx.triples
      .filter(col("g") === "instance" && col("p").isin(preds: _*) &&
        col("o_kind") === "i")
      .select(col("s").as("src"), col("o_iri").as("dst"))
      .localCheckpoint(true)
    println(s"CLOSUREAB edges=${edges.count()}")
    def run(label: String)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"CLOSUREAB $label pairs=${times.head._2} " +
        s"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"min=${times.map(_._1).min}%.2f")
    }
    run("semi_naive") { graft.core.Paths.transitiveClosure(edges).count() }
    run("pregel") { graft.operators.PregelClosure.closurePairs(spark, edges).count() }
    spark.stop()
  }
}
