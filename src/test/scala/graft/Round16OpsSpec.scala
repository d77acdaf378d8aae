package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 additions: truncated Katz centrality, the streaming IVF
  * drift monitor, and real animated-GIF multi-frame decode. */
class Round16OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("katz: hand-traced damped walk counts on a tiny chain") {
    import spark.implicits._
    // a→b, a→c, b→c with α = 1/2, scale = 128, hops = 2:
    //   t1: b = 128/2 = 64, c = (128+128)/2 = 128, a = 0
    //   t2: b = 0/2 = 0,   c = (0+64)/2 = 32,     a = 0
    //   katz: a = 0, b = 64, c = 160
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = graft.operators.PageRank
      .katz(edges, hops = 2, alphaDen = 2L, scale = 128L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "b" -> 64L, "c" -> 160L))
  }

  test("streaming IVF drift equals the batch upsert drift statistics") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val batchStats = graft.llm.Clustering
      .upsertAssign(emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0), k = 8, iters = 3, dim = 64)
      .select("cluster", "n_new", "drift", "refit_hint").distinct()
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val streamed = graft.streaming.Events.streamingIvfDrift(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(streamed == batchStats)
    assert(streamed.nonEmpty)
  }

  test("animated GIF round-trips frames, delay and the full pixel fold") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 5L, 11L, 42L).toDF("doc_id")
    val got = graft.llm.Multimodal.gifAnimMeta(
        graft.llm.Multimodal.withGifAnimPayload(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5)
    for ((id, r) <- got) {
      val nf = 1 + id % 4
      val (w, h) = (8 + id % 8, 8 + id % 4)
      assert(r.getLong(1) == nf, s"n_frames doc $id")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"dims doc $id")
      assert(r.getLong(4) == 4 + id % 6, s"delay doc $id")
      assert(r.getLong(5) == nf, s"frames_decoded doc $id")
      val csum = (0L until nf).map(f =>
        (id * 37 + f * 11) % 256 + (id * 59 + f * 17) % 256 +
          (id * 83 + f * 23) % 256).sum
      assert(r.getLong(6) == w * h * csum, s"px_sum doc $id")
    }
  }

  test("weighted SSSP: min-plus relaxation picks the cheaper of two paths") {
    import spark.implicits._
    // s→a (1), s→b (10), a→t (10), b→t (1), a→b (2):
    //   dist(t) = min(1+10, 10+1, 1+2+1) = 4 via s→a→b→t
    val edges = Seq(("s", "a", 1L), ("s", "b", 10L), ("a", "t", 10L),
      ("b", "t", 1L), ("a", "b", 2L)).toDF("src", "dst", "w")
    val got = graft.operators.Sssp
      .weighted(edges, Seq("s").toDF("node"), maxHops = 4)
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map("s" -> Some(0L), "a" -> Some(1L),
      "b" -> Some(3L), "t" -> Some(4L)))
  }

  test("weighted SSSP: unreachable nodes stay NULL; negatives refused") {
    import spark.implicits._
    val edges = Seq(("s", "a", 2L), ("x", "y", 1L)).toDF("src", "dst", "w")
    val got = graft.operators.Sssp
      .weighted(edges, Seq("s").toDF("node"), maxHops = 2)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("x").isEmpty && got("y").isEmpty && got("a").contains(2L))
    val neg = Seq(("s", "a", -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      graft.operators.Sssp.weighted(neg, Seq("s").toDF("node"), 2)
    }
  }

  test("k-center coreset: farthest-point picks, lowest-id ties, radius trace") {
    import spark.implicits._
    // 1-d line at codes 0, 25, 102, 127 (values /256): greedy from the
    // lowest id (code 0) picks 127 (d=127²·4? no — dim=4 equal dims →
    // 4·127²), then 25? maxmin: after {0,127}: 25→min(4·25²,4·102²)=2500,
    // 102→min(4·102²,4·25²)=2500 → tie → lowest vec_id wins
    val rows = Seq(
      (0L, Seq.fill(4)(0.0f)), (1L, Seq.fill(4)(25f / 256)),
      (2L, Seq.fill(4)(102f / 256)), (3L, Seq.fill(4)(127f / 256)))
    val got = graft.llm.Sampling
      .kCenterCoreset(rows.toDF("vec_id", "embedding"), k = 3, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 0L, 0.0), (2L, 3L, 4.0 * 127 * 127),
      (3L, 1L, 4.0 * 25 * 25)))
  }

  test("URL canonicalization: case, default port, utm, order, fragment") {
    import spark.implicits._
    val urls = Seq(
      "https://EXAMPLE.com:443/doc/1?b=2&a=1#top",
      "https://example.COM/doc/1?a=1&b=2&utm_source=x",
      "https://example.com:8443/doc/1?a=1", // non-default port survives
      "http://example.com:80/p?utm_only=1&utm_z=2" // all params tracking
    ).toDF("url")
    val got = urls
      .select(graft.llm.TextAnalysis.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(got(0) == "https://example.com/doc/1?a=1&b=2")
    assert(got(1) == got(0))
    assert(got(2) == "https://example.com:8443/doc/1?a=1")
    assert(got(3) == "http://example.com/p")
  }

  test("weighted median: lower-median law on hand-traced weights") {
    import spark.implicits._
    val df = Seq(("x", 1L, 1L), ("x", 2L, 1L), ("x", 3L, 10L),
      ("y", 1L, 1L), ("y", 2L, 1L)).toDF("g", "v", "w")
    val got = graft.operators.Warehouse
      .weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // x: tot=12, cum(1)=1, cum(2)=2, cum(3)=12 → first 2·cum≥tot is 3
    // y: tot=2, cum(1)=1 → 2·1 ≥ 2 → lower median 1
    assert(got == Map("x" -> 3L, "y" -> 1L))
  }

  test("deterministic walks: edges exist, sinks stop, runs replay identically") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d")
      .toDF("src", "dst")
    val starts = Seq("a", "d").toDF("node")
    def run() = graft.operators.GraphWalks
      .deterministic(edges, starts, steps = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val w1 = run(); val w2 = run()
    assert(w1 == w2) // hash-deterministic: bit-identical replays
    // d is a sink: its walk is exactly one step-0 row
    assert(w1.filter(_._1 == "d") == Set(("d", "d", 0L)))
    // a's walk: step 1 ∈ {b,c}, step 2 = d, then stops (d is a sink)
    val aw = w1.filter(_._1 == "a")
    assert(aw.exists(x => x._3 == 1L && Set("b", "c")(x._2)))
    assert(aw.contains(("a", "d", 2L)) && !aw.exists(_._3 == 3L))
    assert(aw.size == 3)
  }

  test("katz rounds localCheckpoint lineage and stay exact at depth") {
    import spark.implicits._
    // 6-cycle: with α=1/2 every node's t halves per hop — katz after
    // 8 hops = Σ_{h=1..8} scale/2^h = scale − scale/2^8
    val n = 6
    val edges = (0 until n)
      .map(i => (s"v$i", s"v${(i + 1) % n}")).toDF("src", "dst")
    val got = graft.operators.PageRank
      .katz(edges, hops = 8, alphaDen = 2L, scale = 256L)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(255L)) // 128+64+32+16+8+4+2+1
  }
}
