package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-17 additions and hardenings. */
class Round17OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("animated GIF encode is bit-deterministic (double-encode byte-equal)") {
    import spark.implicits._
    // the r16 driver battery caught the writer-quantized variant
    // hash-flaking between JVM runs; with the explicit IndexColorModel
    // two fresh encodes of the same doc MUST be byte-identical, and
    // the decode fold of both must match the closed form
    val docs = Seq(0L, 1L, 7L, 13L, 42L, 255L, 256L).toDF("doc_id")
    def payloads(): Map[Long, Array[Byte]] =
      graft.llm.Multimodal.withGifAnimPayload(docs)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val a = payloads()
    val b = payloads()
    assert(a.keySet == b.keySet && a.nonEmpty)
    for ((id, bytesA) <- a) {
      assert(java.util.Arrays.equals(bytesA, b(id)),
        s"doc $id payload differs between two fresh encodes")
      val ma = graft.llm.Multimodal.GifAnimCodec.meta(bytesA).get
      val mb = graft.llm.Multimodal.GifAnimCodec.meta(b(id)).get
      assert(ma == mb, s"doc $id decode differs between encodes")
      val nf = 1 + id % 4
      val (w, h) = (8 + id % 8, 8 + id % 4)
      val csum = (0L until nf).map(f =>
        (id * 37 + f * 11) % 256 + (id * 59 + f * 17) % 256 +
          (id * 83 + f * 23) % 256).sum
      assert(ma.pxSum == w * h * csum, s"doc $id px fold vs closed form")
      assert(ma.delayCs == 4 + id % 6, s"doc $id GCE delay read-back")
    }
  }

  test("weighted SSSP survives a deep diameter (lineage truncation at 20 rounds)") {
    import spark.implicits._
    // a 21-node weighted chain forces 20 live relaxation rounds — the
    // case the per-4-round localCheckpoint exists for; without the
    // truncation the dist plan tree deepens linearly with rounds
    val n = 20
    val edges = (0 until n).map(i => (s"n$i", s"n${i + 1}", (i + 1).toLong))
      .toDF("src", "dst", "w")
    val got = graft.operators.Sssp
      .weighted(edges, Seq("n0").toDF("node"), maxHops = 24)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (0 to n).map(i => s"n$i" -> (1 to i).map(_.toLong).sum).toMap
    assert(got == want)
  }

  test("walk rank table is hub-safe and identical to the window-rank law") {
    import spark.implicits._
    // adversarial hub: ONE node with 5000 out-edges (the power-law
    // shape that made the r16 per-src window a single straggler task)
    // plus a few normal nodes; the range-partitioned global-index rank
    // must equal the dense dst-order rank law exactly
    val hub = (0 until 5000).map(i => ("hub", f"d$i%05d"))
    val rest = Seq(("a", "x"), ("a", "y"), ("b", "x"))
    val e = (hub ++ rest).toDF("src", "dst")
    val got = graft.operators.GraphWalks.dstRank(e)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.size == 5003)
    // law: rank = 1 + count of same-src edges with smaller dst
    assert(got(("hub", "d00000")) == 1L)
    assert(got(("hub", "d02500")) == 2501L)
    assert(got(("hub", "d04999")) == 5000L)
    assert(got(("a", "x")) == 1L && got(("a", "y")) == 2L)
    assert(got(("b", "x")) == 1L)
    // and the walk corpus over the hub graph stays deterministic
    val w1 = graft.operators.GraphWalks
      .deterministic(e, Seq("hub", "a").toDF("node"), steps = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val w2 = graft.operators.GraphWalks
      .deterministic(e, Seq("hub", "a").toDF("node"), steps = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(w1 == w2 && w1.nonEmpty)
  }

  test("truncated HITS: hand-traced hub/auth on a tiny graph") {
    import spark.implicits._
    // a→b, a→c, b→c with den = 2, scale = 128, rounds = 1:
    //   h1: a = (128+128)/2 = 128, b = 128/2 = 64, c = 0
    //   a1: b = 128/2 = 64, c = (128+64)/2 = 96, a = 0
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = graft.operators.Hits
      .truncated(edges, rounds = 1, den = 2L, scale = 128L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("a" -> ((128L, 0L)), "b" -> ((64L, 64L)),
      "c" -> ((0L, 96L))))
  }

  test("resource allocation: rare shared neighbor outweighs a shared hub") {
    import spark.implicits._
    // x and y share neighbor w (deg 2: only x,y) and hub h (deg 4);
    // RA(x,y) = 1e6/2 + 1e6/4 = 750000, common = 2
    val edges = Seq(("x", "w"), ("y", "w"), ("x", "h"), ("y", "h"),
      ("p", "h"), ("q", "h")).toDF("a", "b")
    val got = graft.operators.Triangles
      .resourceAllocation(edges, minCommon = 2L, maxCenterDeg = 10L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("x", "y")) == ((2L, 750000L)))
    // hub-only pairs (p,q share only h): 1 common < minCommon → absent
    assert(!got.contains(("p", "q")))
  }

  test("DAG longest path: critical path law + cycle refusal") {
    import spark.implicits._
    // s→a(3), s→b(1), b→a(3): longest into a = max(3, 1+3) = 4
    val dag = Seq(("s", "a", 3L), ("s", "b", 1L), ("b", "a", 3L))
      .toDF("src", "dst", "w")
    val got = graft.operators.Sssp.dagLongest(dag, maxHops = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s" -> 0L, "b" -> 1L, "a" -> 4L))
    // a positive-weight cycle keeps improving → must raise, not return
    val cyc = Seq(("u", "v", 1L), ("v", "u", 1L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sssp.dagLongest(cyc, maxHops = 3)
    }
    assert(e.getMessage.contains("still improving"))
  }

  test("multi-page TIFF round-trips pages, dims and the pixel fold; bit-deterministic") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 9L, 37L).toDF("doc_id")
    def payloads(): Map[Long, Array[Byte]] =
      graft.llm.Multimodal.withTiffPayload(docs)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val a = payloads(); val b = payloads()
    for ((id, bytesA) <- a)
      assert(java.util.Arrays.equals(bytesA, b(id)),
        s"doc $id TIFF payload differs between two fresh encodes")
    val got = graft.llm.Multimodal.tiffMeta(
        graft.llm.Multimodal.withTiffPayload(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5)
    for ((id, r) <- got) {
      val np = 1 + id % 3
      val (w, h) = (6 + id % 6, 6 + id % 3)
      assert(r.getLong(1) == np && r.getLong(4) == np, s"pages doc $id")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"dims doc $id")
      val csum = (0L until np).map(p =>
        (id * 29 + p * 13) % 256 + (id * 47 + p * 19) % 256 +
          (id * 71 + p * 31) % 256).sum
      assert(r.getLong(5) == w * h * csum, s"px fold doc $id")
    }
  }

  test("exact containment: embedded quote scores ~1 where jaccard dilutes") {
    import spark.implicits._
    // doc 2 = doc 1's text embedded in a much longer page: containment
    // of the smaller set is 1.0 while jaccard is far below it
    val quote = "alpha beta gamma delta epsilon zeta"
    val page = s"intro words here $quote closing words trail off now" +
      " more filler tokens arrive to dilute the union further still"
    val docs = Seq((1L, quote), (2L, page), (3L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup
      .containmentPairs(docs, thresholdMicro = 600000L, maxDf = 24L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got((1L, 2L)) == 1000000L)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("k-truss: K4 survives at k=4, pendant and lone triangle peel away") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge in 2 triangles → 4-truss (support ≥ 2).
    // The lone triangle {4,5,6} (support 1 each) and pendant (6,7)
    // peel in round 1; round 2 removes nothing (fixpoint).
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val extra = Seq((4, 5), (5, 6), (4, 6), (6, 7))
    val edges = (k4 ++ extra).toDF("a", "b")
    val got = graft.operators.KTruss.kTruss(edges, k = 4, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.keySet == k4.toSet)
    assert(got.values.forall(_ == 2L))
    // not converged within rounds → raises rather than truncating
    val e = intercept[IllegalArgumentException] {
      // a long chain of triangles peels one layer per round
      val chain = (0 until 12).flatMap(i =>
        Seq((i, i + 1), (i + 1, i + 2), (i, i + 2)))
      graft.operators.KTruss.kTruss(chain.toDF("a", "b"), k = 4, rounds = 2)
    }
    assert(e.getMessage.contains("still removing"))
  }

  test("logistic calibration bins restate the scored frame exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = graft.llm.Classifier.logistic(docs, "en", 8, 3, 16L)
      .select(col("score_micro"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = scored.groupBy(s => math.min(s._1 / 100000, 9L))
      .map { case (bin, xs) =>
        bin -> ((xs.size.toLong, xs.map(_._1).sum / xs.size,
          xs.map(_._2).sum * 1000000L / xs.size))
      }
    val got = graft.llm.Classifier.calibration(docs, "en", 8, 3, 16L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("pipeline v5: URL dedup, containment drop and quality gate compose") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat today", "en"),      // kept
      (1L, "alpha beta gamma delta epsilon zeta", "en"), // kept
      (2L, "totally different content about dogs", "en"), // URL dup of 0
      (3L, "intro alpha beta gamma delta epsilon zeta outro words", "en"),
      // ^ contains doc 1's shingles (cont = 1.0) → dropped (higher id)
      (4L, "a a a a a a", "en"),                        // stop_ratio 1 → gated
      (5L, "mots francais interessants ici", "fr"))     // kept
      .toDF("doc_id", "text", "lang")
    val url = when(col("doc_id").isin(0L, 2L), lit("https://x/0"))
      .otherwise(concat(lit("https://x/"), col("doc_id")))
    val got = graft.llm.Pipeline.urlContainCleanStats(docs, url)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("en" -> ((2L, 13L)), "fr" -> ((1L, 4L))))
  }

  test("LSH range search: all pairs at threshold, subset of brute pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = graft.llm.Similarity
      .lshRange(emb, col("vec_id") < 10, 0.25, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= 0.25 - 1e-6))
    // subset law: every range hit appears among the brute pairs at the
    // same rounded cosine (range adds the bucket restriction only)
    val brute = graft.llm.Similarity
      .bruteTopK(emb, col("vec_id") < 10, 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    got.foreach { case (pair, sim) =>
      assert(math.abs(brute(pair) - sim) < 1e-9, s"pair $pair sim mismatch")
    }
  }

  test("GraphQL per-link aggregates: one GroupStats conjunct, exact sums") {
    implicit val ctx: graft.core.Ctx =
      graft.Graft.ctx(spark, "/root/testdata/sf0.001")
    val q =
      """{ Nation(filter: {n_name: {startsWith: "NATION_1"}}) {
        |    n_name
        |    _c_nationkey_of_Customer {
        |      _count
        |      _sum(field: "c_custkey")
        |      _min(field: "c_acctbal") } } }""".stripMargin
    val (_, df) = graft.server.GraphQL.run(q)
    val got = df.select(col("n_name").getField("str"),
        col("_c_nationkey_of_Customer__count").getField("lng"),
        // integer-typed field → the exact-decimal sum path
        col("_c_nationkey_of_Customer__sum_c_custkey").getField("dec")
          .cast("long"),
        col("_c_nationkey_of_Customer__min_c_acctbal").getField("dbl"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val want = nat.filter(col("n_name").startsWith("NATION_1"))
      .join(cust, col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)), sum(col("c_custkey")), min(col("c_acctbal")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("projected scoring and streaming calibration equal the batch path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = graft.llm.Classifier.trainLogisticWeights(docs, "en", 8, 3, 16L)
    // the aggregate-HOF projection is bit-identical to the
    // feature-frame scoring (same integer sum, same sigmoid rounding)
    val batch = graft.llm.Classifier.logistic(docs, "en", 8, 3, 16L)
      .select(col("doc_id"), col("score_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val proj = graft.llm.Classifier.scoreProjected(docs, w, "en", 8)
      .select(col("doc_id"), col("score_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(proj == batch && proj.nonEmpty)
    val bc = graft.llm.Classifier.calibration(docs, "en", 8, 3, 16L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val sc = graft.streaming.Events
      .streamingCalibration(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sc == bc)
  }

  test("streaming URL canon equals the batch table") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = graft.llm.TextAnalysis.urlDedup(docs,
        graft.llm.TextAnalysis.syntheticUrl(col("doc_id")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val streamed = graft.streaming.Events.streamingUrlCanon(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed == batch && streamed.nonEmpty)
  }
}
