package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.storage.{Eav, LayerStore}
import graft.streaming.Ingest

/** Watermark semantics (late-data drop in append mode) and multi-batch
  * triple ingestion — SURVEY §2.10. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private val evSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("k", StringType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("ts0", "k").select(to_timestamp(col("ts0")).as("ts"), col("k"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    // file-stream sources watch one directory: move part file up
    val part = new java.io.File(s"$dir/$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/$name"))
  }

  test("append-mode watermark drops late data across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    writeBatch(dir, "b1", Seq(
      ("2024-01-01 10:05:00", "a"), ("2024-01-01 10:20:00", "a"),
      ("2024-01-01 13:00:00", "a"))) // advances watermark to 12:00
    val src = spark.readStream.schema(evSchema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("k"), col("n"))
    val q = src.writeStream.outputMode("append")
      .format("memory").queryName("late_test")
      .option("checkpointLocation", s"$dir/_ckpt")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      q.processAllAvailable()
      // batch 2: one on-time-ish and one very late event (before 12:00 wm)
      writeBatch(dir, "b2", Seq(
        ("2024-01-01 10:40:00", "late"),  // 10:00 window already finalized
        ("2024-01-01 13:10:00", "a")))
      q.processAllAvailable()
      // batch 3: push watermark far ahead so open windows finalize
      writeBatch(dir, "b3", Seq(("2024-01-01 20:00:00", "a")))
      q.processAllAvailable()
      val out = spark.table("late_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      // the 10:00 window emitted with only the 2 on-time events; the
      // "late" event was dropped, never re-emitted
      assert(out.contains(("2024-01-01 10:00:00.0", "a", 2L)))
      assert(!out.exists(_._2 == "late"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState carries per-key state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    def stage(name: String, rows: Seq[(Long, Long)]): Unit = {
      rows.toDF("user_id", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    stage("b1", Seq((1L, 10L)))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", LongType)))
    val src = spark.readStream.schema(schema).parquet(s"$dir/src")
      .as[(Long, Long)]
    val out = src.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (u: Long, it: Iterator[(Long, Long)], st: GroupState[Long]) => {
        val s = st.getOption.getOrElse(0L) + it.size
        st.update(s)
        Iterator((u, s))
      }).toDF("user_id", "n")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("state_test")
      .option("checkpointLocation", s"$dir/_ckpt")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      q.processAllAvailable()
      stage("b2", Seq((1L, 11L), (1L, 12L), (2L, 20L)))
      q.processAllAvailable()
      val rows = spark.table("state_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // user 1 emitted the RUNNING aggregate each batch: 1, then 1+2
      assert(rows == Set((1L, 1L), (1L, 3L), (2L, 1L)))
    } finally q.stop()
  }

  test("user stats reduce to one final row per user across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-us").toString
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    stage("b1", Seq((1L, ts(1)), (1L, ts(5))))
    stage("b2", Seq((1L, ts(9)), (2L, ts(4))))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    // maxFilesPerTrigger=1 forces TWO micro-batches: flatMapGroupsWithState
    // emits user 1's running aggregate in each; the final-row reduction
    // must make the result batch-count-independent
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val out = graft.streaming.Events.userStats(spark, src).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 2)
    assert(out(1L) == ((3L, 1000L, 9000L)))
    assert(out(2L) == ((1L, 4000L, 4000L)))
  }

  test("stream-stream join emits the batch range-join result across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def stage(name: String,
              rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit = {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    // clicks land in batch 1, purchases in batch 2 — the join must still
    // match them (right state retained until the watermark passes)
    stage("b1", Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:40:00"), 7L, "click", 2.0),
      (3L, ts("2024-01-01 08:00:00"), 7L, "click", 3.0))) // >1h before: no match
    stage("b2", Seq(
      (4L, ts("2024-01-01 10:50:00"), 7L, "purchase", 9.0),
      (5L, ts("2024-01-01 10:50:00"), 8L, "purchase", 9.0))) // other user: no match
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val out = graft.streaming.Events.ssJoin(spark, src).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getDouble(3))).toSet
    assert(out == Set(
      (4L, ts("2024-01-01 10:00:00"), 1.0),
      (4L, ts("2024-01-01 10:40:00"), 2.0)))
  }

  test("ingestion with maxFilesPerTrigger lands one commit per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-multi")
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    stage("f1", triples((":a", "p", "v1")))
    stage("f2", triples((":b", "p", "v2")))
    val st = LayerStore.open(spark, s"$dir/store")
    val stream = spark.readStream.schema(Eav.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val q = Ingest.streamIntoStore(stream, st, "main")
    q.awaitTermination(120000)
    assert(st.materializeBranch("main").count() == 2)
    assert(st.chain(st.refs("main")).size == 2) // one commit per micro-batch
  }

  test("streaming incremental dedup equals the batch operator across micro-batches") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val sfDir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.DedupIngest
      .streamingIncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.llm.Dedup.incremental(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        pmod(col("doc_id"), lit(10L)) < 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the arrivals replay as TWO micro-batches (repartition(2) staging
    // + maxFilesPerTrigger=1); classification is per-document vs the
    // corpus, so the union must equal the single-batch result exactly
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamed count-min cells equal the batch sketch (linearity)") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Events.streamingCms(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = graft.llm.Sketches.cmsTopK(
        graft.Graft.table(spark, sfDir, "events")
          .select(col("event_type").as("v")),
        org.apache.spark.sql.functions.lit("all"), col("v"),
        d = 4, w = 32, k = 100)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(streamed == batch)
    assert(streamed.keySet == Set("click", "view", "signup", "purchase", "error"))
  }
}
