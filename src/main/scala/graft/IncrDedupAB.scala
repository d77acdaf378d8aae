package graft

import org.apache.spark.sql.SparkSession

/** A/B of the incremental-dedup strategies at a configurable batch
  * count: `runMain graft.IncrDedupAB <sfDir> <nBatches> [reps]`.
  * Times `stream_incr_dedup` with the prebuilt corpus-index path vs
  * the fused (recompute corpus ∪ batch per micro-batch) path, min of
  * `reps` each, and also reports the one-time index build separately
  * so the amortized regime (build ÷ many future batches) is visible.
  * Results recorded in BASELINE.md. */
object IncrDedupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-incr-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.incr.batches") = nBatches.toString

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(mode: String): Double = {
      sys.props("graft.incr.dedup") = mode
      val secs = (1 to reps).map { _ =>
        val s = time {
          val _ = streaming.DedupIngest
            .streamingIncrementalDedup(spark, sfDir).count()
        }
        val _ = graft.util.Scratch.drain()
        s
      }
      secs.min
    }

    // index build cost, measured alone on a throwaway dir
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(10L)) >= 2)
      .select("doc_id", "text")
    val buildDir = java.nio.file.Files
      .createTempDirectory("graft_incr_ab_idx").toString
    val buildSec = time { llm.Dedup.buildCorpusIndex(corpus, buildDir) }

    val idx = run("index")   // warm path also pre-builds the real index
    val fused = run("fused")
    println(f"""{"metric":"incr_dedup_ab","sf":"$sfDir","batches":$nBatches,"index_sec":$idx%.2f,"fused_sec":$fused%.2f,"index_build_sec":$buildSec%.2f}""")
    spark.stop()
  }
}
