package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal gate artifact: run the heavyweight battery entries
  * at sf1 (10× sf0.1, built by [[ScaleUp]]), min-of-N, and write the
  * results as a DIFFABLE markdown table to `BENCH_SF1.md` — so an sf1
  * scale regression surfaces in a file diff between rounds instead of
  * prose in BASELINE.md (r14 verdict #7).
  *
  * `runMain graft.BenchSf1 [sf1Dir] [reps] [outFile]` — defaults
  * `target/sf1`, 3 reps, `BENCH_SF1.md`. The heavyweight list is the
  * 15 most expensive battery entries per BENCH_r14 (eav_encode
  * excluded: ingest diagnostic, not an operator).
  */
object BenchSf1 {

  /** The 15 heaviest gate entries (BENCH_r13/r14) + the round's new
    * heavyweights get appended here as they land. */
  val heavyweights: Seq[String] = Seq(
    "woql_path_plus_alt", "woql_path_shortest", "ext_graphql_path",
    "graph_triangles", "graph_kcore", "graph_wcc", "graph_closeness",
    "graph_lpa", "graph_assortativity", "llm_pipeline_v2",
    "llm_pipeline_v3", "llm_pipeline_v4", "llm_pipeline_clean",
    "stream_stream_join", "sim_topk_mmr", "dedup_substring_clean",
    "graph_diameter", "graph_scc")

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "target/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val outFile = if (args.length > 2) args(2) else "BENCH_SF1.md"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.props.contains("graft.stream.shuffle"))
      sys.props("graft.stream.shuffle") = "8"
    val _ = Graft.ctx(spark, sfDir) // warm encode (uncounted)

    val rows = heavyweights.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to reps).map { _ =>
          val g0 = gcMs; val t0 = System.nanoTime()
          try { val _ = fn(spark, sfDir).count() }
          catch { case e: Throwable =>
            System.err.println(s"[benchsf1] $name failed: ${e.getMessage}") }
          ((System.nanoTime() - t0) / 1e9, gcMs - g0)
        }
        val _ = graft.util.Scratch.drain()
        // unlike the sf0.1 battery, sf1 step-relation caches are
        // edge-sized: left resident they GC-tax every later entry in
        // this single-JVM rehearsal (first run: graph_triangles 96 s
        // min / 20 s gc after the path family, vs 31 s in a dedicated
        // JVM) — drop them so each entry starts from a clean block
        // manager, like the per-entry BenchOne protocol it replaces
        graft.core.Paths.clearRelCache()
        System.gc(); Thread.sleep(150); System.gc()
        val line = f"| $name | ${times.map(_._1).min}%.2f | " +
          f"${times.map(t => f"${t._1}%.2f").mkString(" ")} | " +
          f"${times.map(_._2).max} |"
        println(s"BENCHSF1 $line")
        line
      }
    }
    val md = new StringBuilder
    md ++= "# BENCH_SF1 — heavyweight scale rehearsal (diffable gate artifact)\n\n"
    md ++= s"Data: `$sfDir` (10 key-offset copies of sf0.1 via `graft.ScaleUp`).\n"
    md ++= s"Protocol: warm JVM + warm EAV encode, $reps reps per entry, " +
      "min reported; Scratch drained + double-GC between entries.\n" +
      "Regenerate: `sbt \"runMain graft.BenchSf1\"`.\n\n"
    md ++= "| query | min (s) | reps (s) | max gc_ms/rep |\n|---|---|---|---|\n"
    rows.foreach(r => md ++= r + "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      md.toString.getBytes("UTF-8"))
    println(s"BENCHSF1 wrote $outFile (${rows.size} entries)")
    spark.stop()
  }
}
