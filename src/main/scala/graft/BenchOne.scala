package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: run selected queries N times, print per-run seconds
  * (`runMain graft.BenchOne <sfDir> <reps> <query...>`).
  *
  * Each rep also records its GC-time delta and (with
  * GRAFT_BENCHONE_PLAN=on) the final AQE physical join strategy — the
  * two competing explanations whenever a rep is bimodal: a slow rep
  * whose gc_ms ≈ its wall time is heap pressure; a slow rep with a
  * DIFFERENT join line is AQE replanning. */
object BenchOne {
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val wantPlan = sys.env.getOrElse("GRAFT_BENCHONE_PLAN", "off") == "on"
    // GRAFT_BENCHONE_CONF=bench replicates Bench.scala's AQE session
    // config, so a full-battery slowdown can be bisected to either the
    // config (reproduces here) or in-sequence JVM state (doesn't)
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.getOrElse("GRAFT_BENCHONE_CONF", "") == "bench") {
      builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          sys.env.getOrElse("GRAFT_AQE_ADVISORY", "1m"))
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    }
    // A/B toggle: GRAFT_SHJ=<bytes> allows the planner to pick shuffled
    // hash join and lets AQE convert sort-merge to shuffled-hash when
    // every post-shuffle partition is under the threshold (guide §3.1)
    sys.env.get("GRAFT_SHJ").foreach { t =>
      builder.config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", t)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val _ = Graft.ctx(spark, sfDir) // warm
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        // Construction goes INSIDE the timer: iterative operators (path
        // closures, BFS) do their work eagerly while the DataFrame is
        // being BUILT (per-round checkpoints + counts) — hoisting
        // construction out measures only the final count over already-
        // materialized blocks (~0.05 s for a 3 s query). Bench.scala
        // times fn(...)...count() the same way.
        val g0 = gcMs
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = gcMs - g0
        if (wantPlan) {
          // AQE final plan: join/exchange lines only, enough to see a
          // strategy flip between reps without dumping full plans
          val lines = df.queryExecution.executedPlan.toString().linesIterator
            .map(_.trim).filter(l => l.contains("Join") || l.contains("Exchange"))
            .map(_.takeWhile(_ != '[')).mkString(" | ")
          println(f"BENCHONE_REP $n $sec%.2f gc_ms=$gc $lines")
        }
        (sec, gc)
      }
      val _ = graft.util.Scratch.drain()
      println(f"BENCHONE $n ${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"min=${times.map(_._1).min}%.2f gc_ms=${times.map(_._2).mkString(",")}")
    }
    spark.stop()
  }
}
