package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis
import graft.operators.{BloomJoin, Triangles}

/** Round-9 operators: degree-ordered triangle counting, Bloom-pruned
  * semi-join, content-defined chunking, RRF hybrid fusion. */
class Round9OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("triangle counts match brute force on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant
    // 4-5 edge and an isolated edge 6-7 (no triangles)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L),
      (2L, 1L), (3L, 1L) // duplicates reversed — must be deduped
    ).toDF("a", "b")
    val got = Triangles.nodeTriangles(edges, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangle count equals the unordered brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 200).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .toDF("a", "b")
    val e = edges.where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b")).distinct()
    val brute = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count() // each triangle a<b<c appears exactly once in this form
    val perNode = Triangles.nodeTriangles(edges, 1000)
      .agg(sum("tri")).collect()(0).getLong(0)
    assert(perNode == 3 * brute) // each triangle credits 3 corners
  }

  test("bloom filter has no false negatives and semiJoin is exact") {
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = Seq(3L, 97L, 512L, 1999L, 4001L).toDF("sk")
    val pruned = BloomJoin.bloomFilter(big, $"k", small, $"sk")
    val keys = pruned.select("k").as[Long].collect().toSet
    assert(Set(3L, 97L, 512L, 1999L).subsetOf(keys), "false negative")
    val exact = BloomJoin.semiJoin(big, "k", small, "sk")
      .select("k").as[Long].collect().sorted.toSeq
    assert(exact == Seq(3L, 97L, 512L, 1999L))
  }

  test("CDC chunks: identical spans chunk identically regardless of prefix") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val docs = Seq(
      (1L, span.trim),
      (2L, ("prefix words shifting everything " + span).trim)
    ).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(docs, 4)
      .select("doc_id", "ch").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    // content-defined: interior chunk hashes of the shared span must
    // coincide despite the position shift (only boundary-adjacent
    // chunks may differ)
    val shared = chunks(1L) intersect chunks(2L)
    assert(shared.nonEmpty, "no shared chunk hash across shifted copies")
  }

  test("CDC chunks partition the document exactly") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p q r s t")).toDF("doc_id", "text")
    val total = TextAnalysis.cdcChunks(docs, 4)
      .agg(sum("n_tok")).collect()(0).getLong(0)
    assert(total == 20L)
  }

  test("count-min estimates dominate exact counts and rollup equals direct build") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i =>
      (s"g${i % 3}", s"tok${rnd.nextInt(40)}")).toDF("g", "v")
    val got = graft.llm.Sketches.cmsTopK(rows, $"g", $"v", d = 4, w = 16, k = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: est $est < exact $exact") }
    // rollup (3 groups) ≡ single-group build — CMS is linear
    val direct = graft.llm.Sketches.cmsTopK(
      rows.withColumn("g", lit("all")), $"g", $"v", d = 4, w = 16, k = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
  }

  test("cdcClean keeps the first copy of duplicated chunks and conserves unique tokens") {
    import spark.implicits._
    val span = (1 to 30).map(i => s"word$i").mkString(" ") // 30 distinct words
    val docs = Seq((1L, span), (2L, span),
      (3L, "entirely different words without any overlap here")).toDF("doc_id", "text")
    val out = TextAnalysis.cdcClean(docs, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1 keeps all 30 tokens; doc 2 is a full duplicate — every one
    // of its chunks already occurred in doc 1, so it vanishes entirely
    assert(out(1L) == 30L)
    assert(!out.contains(2L))
    assert(out(3L) == 7L)
  }

  test("leak-free split never separates a near-dup pair across splits") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = (0L until 40L).map { i =>
      // pairs (2k, 2k+1) are near-dups of each other; distinct pairs differ
      val t = base + s"tail${i / 2} salt${i / 2}"
      (i, t)
    }.toDF("doc_id", "text")
    val split = graft.llm.Sampling.leakFreeSplit(docs, 0.5)
    val byDoc = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.llm.Dedup.minhashNearDups(docs, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture produced no near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"near-dups $a/$b split across ${byDoc(a)}/${byDoc(b)}") }
    // and it is still a split: every doc labeled, labels from the 3 classes
    assert(byDoc.size == 40 && byDoc.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("window funnel matches the brute-force self-join on random event logs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val types = Seq("click", "view", "purchase", "other")
    val events = (1 to 600).map { i =>
      (i.toLong, rnd.nextInt(12).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(500) * 60000L),
        types(rnd.nextInt(4)))
    }.toDF("event_id", "user_id", "ts", "event_type")
    val T = 3600000000L // 1h in micros
    val got = graft.operators.Funnel.windowFunnel(events, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view", "purchase"), T)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force per user via collected scala
    val byUser = events.collect()
      .map(r => (r.getLong(1), (r.getTimestamp(2).getTime * 1000, r.getLong(0),
        r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(e => (e._1, e._2))).toMap
    val brute = byUser.view.mapValues { es =>
      def chains(lvl: Int): Seq[(Long, Long, Long)] = // (startT, endT, endId)
        if (lvl == 1) es.filter(_._3 == "click").map(e => (e._1, e._1, e._2)).toSeq
        else chains(lvl - 1).flatMap { case (s, et, eid) =>
          es.filter(e => (e._3 == Seq("click", "view", "purchase")(lvl - 1)) &&
            (e._1 > et || (e._1 == et && e._2 > eid)))
            .map(e => (s, e._1, e._2))
        }
      (1 to 3).filter(l => chains(l).exists(c => c._2 - c._1 <= T))
        .maxOption.getOrElse(0).toLong
    }.toMap
    val bruteCounts = brute.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == bruteCounts, s"got $got vs brute $bruteCounts")
  }

  test("cohort retention counts a hand-built log correctly") {
    import spark.implicits._
    def t(h: Int, m: Int) = new java.sql.Timestamp(
      java.time.LocalDateTime.of(2024, 1, 1, h, m)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    // user 1: first 09:xx, active 10:xx (+1) and 12:xx (+3)
    // user 2: first 09:xx, never again
    // user 3: first 10:xx, active 11:xx (+1)
    val ev = Seq((1L, t(9, 5)), (1L, t(9, 50)), (1L, t(10, 1)), (1L, t(12, 59)),
      (2L, t(9, 30)), (3L, t(10, 10)), (3L, t(11, 45)))
      .toDF("user_id", "ts")
    val got = graft.operators.Retention.cohortRetention(ev,
        "user_id", "ts", "hour", Seq(1, 3, 6))
      .collect().map(r => (r.getTimestamp(0).toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("2024-01-01 09:00:00.0", 2L, 1L, 1L, 0L),
      ("2024-01-01 10:00:00.0", 1L, 1L, 0L, 0L)))
  }

  test("personalized PageRank confines mass to the seed's reachable set") {
    import spark.implicits._
    // two disjoint chains: 1→2→3 and 10→11; seed = 1
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val pr = graft.operators.PageRank.personalized(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(10L) == 0L && pr(11L) == 0L, "mass leaked outside the seed component")
    assert(pr(1L) == 150000000L) // base only: nothing points at the seed
    assert(pr(2L) > 0L && pr(3L) > 0L)
    // seed's direct successor outranks the 2-hop node
    assert(pr(2L) > pr(3L))
  }

  test("k-core peels to the known core of a constructed graph") {
    import spark.implicits._
    // K5 on {1..5} (every node degree 4) plus a tail 5-6-7: the 3-core
    // is exactly the K5; 6 and 7 peel away (6 first drops 7 to deg 0)
    val edges = (for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)).toSeq ++ Seq((5L, 6L), (6L, 7L))
    val got = graft.operators.KCore.kCore(edges.toDF("a", "b"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
  }

  test("grid quantiles sit within one cell of the exact percentile") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vals = (1 to 5000).map(_ => rnd.nextDouble() * 300.0)
    val df = vals.map(("a", _)).toDF("g", "v")
    val got = graft.llm.Sketches.gridQuantiles(df, $"g", $"v")
      .collect()(0)
    val sorted = vals.sorted
    def exact(q: Double) = sorted((q * 5000).ceil.toInt - 1)
    for ((idx, q) <- Seq((1, 0.50), (2, 0.95), (3, 0.99))) {
      val cellVal = got.getLong(idx) / 100.0
      assert(math.abs(cellVal - exact(q)) <= 0.011,
        s"q=$q grid ${cellVal} vs exact ${exact(q)}")
    }
  }

  test("last-touch attribution respects order, window, and user boundaries") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val ev = Seq(
      (1L, 1L, t(0L), "click"), (2L, 1L, t(60000L), "purchase"), // attributed
      (3L, 2L, t(0L), "purchase"), (4L, 2L, t(1L), "click"),     // click AFTER → no
      (5L, 3L, t(0L), "click"), (6L, 3L, t(3 * 3600 * 1000L), "purchase"), // 3h > 2h → no
      (7L, 4L, t(0L), "click"), (8L, 5L, t(60000L), "purchase")  // other user's click → no
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.operators.Funnel.lastTouchAttribution(ev,
        "user_id", "ts", "event_id", "event_type", "click", "purchase", 7200000000L)
      .agg(org.apache.spark.sql.functions.sum("n_conv"),
        org.apache.spark.sql.functions.sum("n_attributed"))
      .collect()(0)
    assert(got.getLong(0) == 4L && got.getLong(1) == 1L)
  }

  test("rrf fusion ranks ids present in both lists above single-list ids") {
    import spark.implicits._
    // doc that matches the BM25 terms AND is near vec 0 should fuse highest
    val docs = Seq(
      (1L, "spark join vector spark join vector"),
      (2L, "nothing relevant here at all padding"),
      (3L, "spark alone")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length($"text"))
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.rrfHybrid(docs, emb,
      Seq("spark", "join", "vector"), queryId = 0L, pool = 10, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.head._1 == 1L) // in both top lists → max fused score
    assert(got.map(_._2).toSeq == (1L to got.length))
  }
}
