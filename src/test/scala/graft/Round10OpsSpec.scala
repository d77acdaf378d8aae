package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{BloomJoin, Warehouse}

/** Round-10 operators: warehouse analytics (SCD-2, gaps-and-islands,
  * transitions, z-score outliers), the distributed Bloom build, and
  * the sampling-side domain cap / length buckets. */
class Round10OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  test("scd2 collapses an event log to versioned state intervals") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 1L, "a"), (1L, ts(20), 2L, "a"), (1L, ts(30), 3L, "b"),
      (1L, ts(40), 4L, "b"), (1L, ts(50), 5L, "a"),
      (2L, ts(15), 6L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Warehouse.scd2(events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a", ts(10), Some(ts(30)), 1L),
      (1L, "b", ts(30), Some(ts(50)), 2L),
      (1L, "a", ts(50), None, 3L),
      (2L, "x", ts(15), None, 1L)))
  }

  test("scd2 tie-breaks equal timestamps by the tie column") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 2L, "b"), (1L, ts(10), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Warehouse.scd2(events, "user_id", "ts", "event_id", "event_type")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a", "b")) // id 1 first despite row order
  }

  test("gap islands finds runs, gaps, and the longest streak") {
    import spark.implicits._
    // user 1 active hours 0,1,2 then 5 then 7,8 → 3 islands, longest 3
    def hts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000L)
    val events = Seq(
      (1L, hts(0)), (1L, hts(0)), (1L, hts(1)), (1L, hts(2)),
      (1L, hts(5)), (1L, hts(7)), (1L, hts(8)),
      (2L, hts(3))
    ).toDF("user_id", "ts")
    val got = Warehouse.gapIslands(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 3L, 6L)))
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("transition counts are the adjacent-pair matrix in time order") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "a"),
      (2L, ts(1), 4L, "a"), (2L, ts(2), 5L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Warehouse.transitions(events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("zscore outliers flags exactly the far points") {
    import spark.implicits._
    // group g: nine points at ~0 and one at 100 → only 100 has |z| >= 2
    val df = ((1 to 9).map(i => ("g", i / 100.0)) :+ (("g", 100.0)))
      .toDF("event_type", "value")
    val got = Warehouse.zscoreOutliers(df, "event_type", "value", 2.0).collect()(0)
    assert(got.getLong(1) == 10L)
    assert(got.getLong(2) == 1L)
    assert(got.getDouble(3) > 2.0)
  }

  test("distributed bloom build is bit-identical to the driver-literal build") {
    import spark.implicits._
    val keys = (1 to 500).map(i => (i * 7919L) % 100003L).toDF("k")
      .repartition(7) // partials must merge across partitions
    val m = 1L << 16
    val dist = BloomJoin.distributedFilterBits(keys, $"k", m, 3)
    // reference: the driver-literal path's positions, same hash chain
    val pos = keys.select(explode(array(
        (0 until 3).map(i => pmod(xxhash64($"k".cast("long"), lit(i)), lit(m))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val ref = new Array[Long]((m / 64).toInt)
    pos.foreach(p => ref((p / 64).toInt) |= (1L << (p % 64)))
    assert(dist.toSeq == ref.toSeq)
  }

  test("semiJoinDistributed is the exact semi-join") {
    import spark.implicits._
    val big = (1L to 3000L).map(i => (i, i % 13)).toDF("k", "v")
    val small = Seq(5L, 999L, 2048L, 2999L, 9999L).toDF("sk")
    val got = BloomJoin.semiJoinDistributed(big, "k", small, "sk", 1L << 16)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(5L, 999L, 2048L, 2999L))
  }

  test("bloom semi-joins are exact for INT-typed keys and skip null build keys") {
    import spark.implicits._
    // regression: build hashed keys as long, probe hashed the native
    // int column (different hash) — matching rows silently dropped
    val big = (1 to 3000).map(i => (i, i % 13)).toDF("k", "v")
    val small = Seq[Integer](5, 999, 2048, 2999, 9999, null).toDF("sk")
    val got = BloomJoin.semiJoinDistributed(big, "k", small, "sk", 1L << 16)
      .select("k").as[Int].collect().sorted.toSeq
    assert(got == Seq(5, 999, 2048, 2999))
    val got2 = BloomJoin.semiJoin(big, "k", small, "sk")
      .select("k").as[Int].collect().sorted.toSeq
    assert(got2 == Seq(5, 999, 2048, 2999))
    // string keys cast to null-long (false NEGATIVES) — refused up front
    val sbig = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(sbig, "k", Seq("a").toDF("sk"), "sk")
    }
  }

  test("streaming transitions equal the batch matrix across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tr").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      rows.toDF("user_id", "ts", "event_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    // time-ordered batches; user 1 spans the batch boundary (a→c link
    // must come from carried state, not in-batch pairing)
    stage("b1", Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (1L, ts(3), 3L, "a"), (2L, ts(2), 4L, "x")))
    stage("b2", Seq((1L, ts(9), 5L, "c"), (2L, ts(8), 6L, "x")))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.transitionsStream(spark, src)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("a", "c") -> 1L, ("x", "x") -> 1L))
  }

  test("streaming funnel carries DP state across micro-batch boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fn").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      rows.toDF("user_id", "ts", "event_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    // user 1: click,view in b1; purchase in b2 (within window) → 3.
    // user 2: click in b1, view in b2, purchase OUTSIDE window → 2.
    // user 3: only view → 0.
    def hts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    stage("b1", Seq((1L, hts(10), 1L, "click"), (1L, hts(20), 2L, "view"),
      (2L, hts(10), 3L, "click"), (3L, hts(10), 4L, "view")))
    stage("b2", Seq((1L, hts(30), 5L, "purchase"), (2L, hts(40), 6L, "view"),
      (2L, hts(90), 7L, "purchase")))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.funnelStream(spark, src,
        Seq("click", "view", "purchase"), windowMicros = 50000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 0L -> 1L))
    // and the batch operator agrees on the same flattened log
    val all = Seq((1L, hts(10), 1L, "click"), (1L, hts(20), 2L, "view"),
      (2L, hts(10), 3L, "click"), (3L, hts(10), 4L, "view"),
      (1L, hts(30), 5L, "purchase"), (2L, hts(40), 6L, "view"),
      (2L, hts(90), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val batch = graft.operators.Funnel.windowFunnel(all, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view", "purchase"), 50000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batch == got)
  }

  test("streaming gap islands extends a run across a batch boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gi").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    def hts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000L + 1000L)
    // user 1: hours 0,1 in b1; 2 then 5 in b2 → run {0,1,2} crosses
    // the boundary, then a gap: 2 islands, longest 3
    stage("b1", Seq((1L, hts(0)), (1L, hts(1))))
    stage("b2", Seq((1L, hts(2)), (1L, hts(5))))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.gapIslandsStream(spark, src)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((2L, 3L, 4L))))
    // batch agrees
    val all = Seq((1L, hts(0)), (1L, hts(1)), (1L, hts(2)), (1L, hts(5)))
      .toDF("user_id", "ts")
    val batch = graft.operators.Warehouse.gapIslands(all, "user_id", "ts")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(batch == got)
  }

  test("streaming attribution decides conversions against carried touch state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-at").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      rows.toDF("user_id", "ts", "event_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    // user 1: click in b1, purchase in b2 within window → attributed
    // (the cross-batch case); user 2: purchase with no touch → counted
    // unattributed; user 3: click long before purchase → outside window
    stage("b1", Seq((1L, ts(10), 1L, "click"), (3L, ts(1), 2L, "click"),
      (2L, ts(15), 3L, "purchase")))
    stage("b2", Seq((1L, ts(30), 4L, "purchase"), (3L, ts(90), 5L, "purchase")))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.attributionStream(spark, src,
        "click", "purchase", windowMicros = 50000000L)
      .collect().map(r => (r.getTimestamp(0), (r.getLong(1), r.getLong(2)))).toMap
    val h0 = new java.sql.Timestamp(0L) // all events inside hour 0
    assert(got == Map(h0 -> ((3L, 1L))))
  }

  test("streaming retention carries cohort+mask state across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rt").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    def hts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000L + 60000L)
    // user 1: cohort h0 (b1), active h1 (b1) and h3 (b2) → ret_1, ret_3.
    // user 2: cohort h0 (b1), never again → no flags.
    stage("b1", Seq((1L, hts(0)), (1L, hts(1)), (2L, hts(0))))
    stage("b2", Seq((1L, hts(3))))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.retentionStream(spark, src, Seq(1, 3, 6))
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val h0 = new java.sql.Timestamp(0L)
    assert(got == Map(h0 -> ((2L, 1L, 1L, 0L))))
    // batch operator agrees on the flattened log
    val all = Seq((1L, hts(0)), (1L, hts(1)), (2L, hts(0)), (1L, hts(3)))
      .toDF("user_id", "ts")
    val batch = graft.operators.Retention.cohortRetention(all, "user_id", "ts",
        "hour", Seq(1, 3, 6))
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(batch == got)
  }

  test("streaming retention stays exact when a late batch refines the cohort") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rt2").toString
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/tmp/$name")
      val part = new java.io.File(s"$dir/tmp/$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$dir/src").mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/src", s"$name.parquet"))
    }
    def hts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000L + 60000L)
    // b1 sees user 1 from h2 with a ret_3 hit at h5; b2 delivers a LATE
    // h1 event: the cohort refines to h1, h2 becomes the ret_1 hit, and
    // h5 (now rel 4) must STOP counting as ret_3 — a kept-mask bug
    // would report ret_3=1 and miss ret_1
    stage("b1", Seq((1L, hts(2)), (1L, hts(5))))
    stage("b2", Seq((1L, hts(1))))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val got = graft.streaming.Events.retentionStream(spark, src, Seq(1, 3, 6))
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val h1 = new java.sql.Timestamp(3600L * 1000L)
    assert(got == Map(h1 -> ((1L, 1L, 0L, 0L))))
    // batch operator agrees on the flattened log
    val all = Seq((1L, hts(2)), (1L, hts(5)), (1L, hts(1))).toDF("user_id", "ts")
    val batch = graft.operators.Retention.cohortRetention(all, "user_id", "ts",
        "hour", Seq(1, 3, 6))
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(batch == got)
  }

  test("common neighbors equals the brute set computation") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (5L, 1L), (5L, 2L)
    ).toDF("a", "b")
    val got = graft.operators.Triangles.commonNeighbors(edges,
        minCommon = 1L, maxCenterDeg = 100L, k = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // brute: neighbor sets — 1:{2,3,4,5} 2:{1,3,4,5} 3:{1,2} 4:{1,2} 5:{1,2}
    def nb = Map(1L -> Set(2L, 3L, 4L, 5L), 2L -> Set(1L, 3L, 4L, 5L),
      3L -> Set(1L, 2L), 4L -> Set(1L, 2L), 5L -> Set(1L, 2L))
    val expect = (for {
      a <- nb.keys; b <- nb.keys if a < b
      common = (nb(a) & nb(b)).size if common >= 1
    } yield ((a, b), (common.toLong,
      math.round(common * 1000000.0 / (nb(a).size + nb(b).size - common))))).toMap
    assert(got == expect)
  }

  test("common neighbors: hub centers are excluded from the evidence") {
    import spark.implicits._
    // star: hub 0 connects 1..5; only common neighbor of any (i,j) is
    // the hub (deg 5) — capping at 4 kills every pair
    val edges = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val got = graft.operators.Triangles.commonNeighbors(edges,
      minCommon = 1L, maxCenterDeg = 4L, k = 10).count()
    assert(got == 0L)
  }

  test("skyline equals the brute dominance scan on random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (1 to 400).map(_ => (rnd.nextInt(50).toDouble,
      rnd.nextInt(50).toDouble)).distinct
    val got = graft.operators.Warehouse.skyline2d(
        pts.toDF("p", "q").repartition(7), "p", "q")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val brute = pts.filterNot { case (x, y) =>
      pts.exists { case (bx, by) =>
        bx <= x && by >= y && (bx < x || by > y) } }.toSet
    assert(got == brute)
  }

  test("fuzzy best-match equals the unblocked all-pairs scan") {
    import spark.implicits._
    val dirty = Seq("aplpe", "bananna", "qqq").toDF("probe")
    val canon = Seq("apple", "banana", "cherry").toDF("name")
    val got = graft.operators.FuzzyJoin.bestMatch(dirty, "probe",
        canon, "name", 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // brute check
    def bg(s: String) = s.sliding(2).toSet
    def dice(a: String, b: String) =
      2.0 * (bg(a) & bg(b)).size / (bg(a).size + bg(b).size)
    val brute = (for {
      p <- Seq("aplpe", "bananna", "qqq")
      best = Seq("apple", "banana", "cherry").map(c => (c, dice(p, c)))
        .filter(_._2 >= 0.3).sortBy { case (c, s) => (-s, c) }.headOption
      b <- best
    } yield p -> b._1).toMap
    assert(got == brute)
    assert(!got.contains("qqq")) // below threshold everywhere
  }

  test("domain cap keeps the longest docs and conserves token mass") {
    import spark.implicits._
    val docs = (1 to 10).map(i =>
        (i.toLong, ("w " * i).trim, "s0", i.toLong)) :+
      ((11L, "a b", "s1", 2L))
    val df = docs.toDF("doc_id", "text", "source", "n_chars")
    val got = graft.llm.Sampling.domainCap(df, cap = 3)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // s0: 10 docs, keeps ids 10,9,8 (longest) = 27 tokens; drops 1..7 = 28
    assert(got("s0") == ((10L, 3L, 27L, 28L)))
    assert(got("s1") == ((1L, 1L, 2L, 0L)))
  }

  test("hll estimate lands within the m=64 error envelope") {
    import spark.implicits._
    for (n <- Seq(50, 500, 5000)) {
      val df = (1 to n).map(i => ("g", s"value_$i")).toDF("g", "v")
      val est = graft.llm.Sketches.hllDistinct(df, col("g"), col("v"))
        .collect()(0).getDouble(1)
      // standard error ≈ 1.04/√64 = 13%; allow 4σ
      assert(math.abs(est - n) < 0.52 * n + 10,
        s"n=$n est=$est outside envelope")
    }
  }

  test("hll registers are duplicate-insensitive") {
    import spark.implicits._
    val base = (1 to 300).map(i => ("g", s"v$i"))
    val dup = base ++ base ++ base
    val e1 = graft.llm.Sketches.hllDistinct(base.toDF("g", "v"), col("g"), col("v"))
      .collect()(0).getDouble(1)
    val e2 = graft.llm.Sketches.hllDistinct(dup.toDF("g", "v"), col("g"), col("v"))
      .collect()(0).getDouble(1)
    assert(e1 == e2)
  }

  test("kmv intersection is exact when both sets fit the sketch") {
    import spark.implicits._
    // |A|=50, |B|=51, overlap 21 → θ=1.0, everything retained
    val rows = (1 to 50).map(i => ("a", i.toString)) ++
      (30 to 80).map(i => ("b", i.toString))
    val df = rows.toDF("g", "v")
    val r = graft.llm.Sketches.kmvIntersect(df, col("g"), col("v"),
      k = 100, a = "a", b = "b").collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 51L && r.getLong(2) == 21L)
    assert(r.getDouble(3) == 21.0)
    assert(math.abs(r.getDouble(4) - 21.0 / 80.0) < 1e-6)
  }

  test("kmv intersection estimate lands near truth under truncation") {
    import spark.implicits._
    // |A|=|B|=2000, true overlap 1000; k=256 → sampled estimate
    val rows = (1 to 2000).map(i => ("a", i.toString)) ++
      (1001 to 3000).map(i => ("b", i.toString))
    val df = rows.toDF("g", "v")
    val r = graft.llm.Sketches.kmvIntersect(df, col("g"), col("v"),
      k = 256, a = "a", b = "b").collect()(0)
    val est = r.getDouble(3)
    assert(est > 500 && est < 1500, s"estimate $est too far from 1000")
  }

  test("length buckets partition the corpus and cap the last bucket") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),                      // 3 tok → bucket 0, waste 13
      (2L, ("w " * 20).trim),             // 20 tok → bucket 1, waste 12
      (3L, ("w " * 400).trim)             // 400 tok → bucket 15 (capped), waste 0
    ).toDF("doc_id", "text")
    val got = graft.llm.Sampling.lengthBuckets(docs, width = 16, maxBucket = 15)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((1L, 3L, 13L)))
    assert(got(1L) == ((1L, 20L, 12L)))
    assert(got(15L) == ((1L, 400L, 0L)))
  }
}
