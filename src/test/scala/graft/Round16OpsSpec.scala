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
