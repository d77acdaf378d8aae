package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for selected queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (`runMain graft.PlanDump <sfDir> <dir> <suffix> <query...>`).
  * Session config mirrors Bench.scala so the dumped plan is the plan
  * the battery actually runs (AQE initial plan; iterative operators
  * additionally run their construction-time jobs while the frame is
  * built, which is inherent to dumping them at all). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val dir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dir).mkdirs()
    names.foreach { n =>
      val out = new java.io.File(dir, s"${n}_$suffix.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(out, "UTF-8")
        try { w.println(plan) } finally w.close()
        println(s"[plandump] wrote $out (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $n failed: ${e.getMessage}")
      } finally { val _ = graft.util.Scratch.drain() }
    }
    spark.stop()
  }
}
