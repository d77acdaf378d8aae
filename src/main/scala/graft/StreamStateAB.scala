package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming state-store A/B in the regime where the providers differ:
  * `runMain graft.StreamStateAB [nKeys] [batches]` (default 1M keys ×
  * 4 micro-batches, every key updated in every batch, update-mode
  * running aggregate with no watermark so ALL keys stay live). The
  * sf0.1 oracle replays (~150 keys) measure commit machinery, not
  * state width; this synthesizes the ~1M-key width the round-6 brief
  * asked for and records wall time, state-store reported memory, and
  * JVM peak heap per provider (RocksDB holds state in native storage —
  * its cost shows up as time and native RSS, not heap; the HDFS
  * provider keeps every live key in JVM hash maps). Results recorded
  * in BASELINE.md. */
object StreamStateAB {
  def main(args: Array[String]): Unit = {
    val nKeys = args.lift(0).map(_.toInt).getOrElse(1000000)
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-state-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_state_ab").toFile
    val dataDir = new java.io.File(root, "data")
    // one file per micro-batch, each touching every key once
    (0 until batches).foreach { i =>
      spark.range(i.toLong * nKeys, (i + 1).toLong * nKeys)
        .select((col("id") % nKeys).as("k"), (col("id") % 1000).as("v"))
        .coalesce(1).write.mode("append").parquet(dataDir.getAbsolutePath)
    }
    val schema = spark.read.parquet(dataDir.getAbsolutePath).schema

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val heapPools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP && p.isValid)

    def run(provider: String): String = {
      val pkg = "org.apache.spark.sql.execution.streaming.state."
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        pkg + (if (provider == "hdfs") "HDFSBackedStateStoreProvider"
               else "RocksDBStateStoreProvider"))
      // state width = 8 partitions: state size per store is the lever
      // under test, not commit machinery width
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      System.gc(); heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      var outRows = 0L
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir.getAbsolutePath)
      val agg = src.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val q = agg.writeStream.outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) => outRows += b.count() }
        .option("checkpointLocation",
          new java.io.File(root, s"ckpt_$provider").getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      val prog = q.lastProgress
      val stateMem = prog.stateOperators.map(_.memoryUsedBytes).sum
      val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
      spark.conf.set("spark.sql.shuffle.partitions", old)
      require(outRows == nKeys.toLong * batches,
        s"update-mode agg must emit every touched key per batch, got $outRows")
      f""""$provider":{"sec":$secs%.2f,"state_mem_mb":${stateMem >> 20},"state_rows":$stateRows,"peak_heap_mb":$peakMb}"""
    }

    val rocks = run("rocksdb")
    val hdfs = run("hdfs")
    println(s"""{"metric":"stream_state_ab","keys":$nKeys,"batches":$batches,$rocks,$hdfs}""")
    spark.stop()
  }
}
