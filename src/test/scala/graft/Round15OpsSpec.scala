package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 additions: AVI/MJPEG container + real frame decode, the
  * codec chain's AVI slot, frame explosion into the image pipeline. */
class Round15OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def aviDocs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("avi codec walks RIFF header + decodes every MJPEG frame") {
    val payloads = graft.llm.Multimodal.withAviPayload(aviDocs(7))
    val got = graft.llm.Multimodal.aviMeta(payloads)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 7)
    got.foreach { case (id, r) =>
      assert(r.getLong(1) == 1 + id % 3)      // n_frames (header)
      assert(r.getLong(2) == 25)              // fps
      assert(r.getLong(3) == 16 + id % 16)    // container width
      assert(r.getLong(4) == 16 + id % 8)     // container height
      assert(r.getLong(5) == 1 + id % 3)      // movi chunks found
      assert(r.getLong(6) == 1 + id % 3)      // frames ImageIO-decoded
      assert(r.getLong(7) == 16 + id % 16)    // JPEG SOF width
      assert(r.getLong(8) == 16 + id % 8)     // JPEG SOF height
      assert(r.getString(9) == "video/avi")
    }
  }

  test("avi participates in the generic codec chain (decodeMeta slot)") {
    val payloads = graft.llm.Multimodal.withAviPayload(aviDocs(3))
    val meta = graft.llm.Multimodal.decodeMeta(payloads)
      .collect().map(r => r.getLong(0) -> r).toMap
    meta.foreach { case (id, r) =>
      assert(r.getLong(2) == 16 + id % 16 && r.getLong(3) == 16 + id % 8)
      assert(r.getString(4) == "video/avi") // real codec, not fakeDecode
    }
  }

  test("avi frames explode into per-frame image rows that resizeThumb accepts") {
    val payloads = graft.llm.Multimodal.withAviPayload(aviDocs(4))
    val frames = graft.llm.Multimodal.aviFrames(payloads)
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L))
    // frame payloads are standalone JPEGs: the image thumbnail path
    // consumes them directly (frame-sampled video thumbnails)
    val thumbs = graft.llm.Multimodal.resizeThumb(
      frames.select(
        (col("doc_id") * 100 + col("frame_idx")).as("doc_id"),
        col("payload")), 4, 4)
    assert(thumbs.count() == 7)
    assert(thumbs.filter(col("thumb_w") === 4 && col("thumb_h") === 4)
      .count() == 7)
  }

  test("byte-level BPE: space-marked hex byte alphabet, greedy merges") {
    import spark.implicits._
    // corpus: "to to to ta" — byte v0: to = [20,74,6F], ta = [20,74,61]
    // round-1 pairs: (20,74)=4, (74,6F)=3, (74,61)=1 → merge 2074 (4)
    // round-2: to=[2074,6F]×3, ta=[2074,61] → (2074,6F)=3 wins
    val docs = Seq((1L, "to to to ta")).toDF("doc_id", "text")
    graft.llm.TextAnalysis.clearArtifacts()
    val merges = graft.llm.TextAnalysis.byteBpeTrain(docs, 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(("20", "74", 4L), ("2074", "6F", 3L)))
    // apply: to → [20746F] (1 token), ta → [2074, 61] (2 tokens)
    val enc = graft.llm.TextAnalysis.byteBpeApply(docs, 2).collect().head
    assert(enc.getLong(1) == 4L)      // n_words
    assert(enc.getLong(2) == 3 * 1 + 1 * 2) // n_bytebpe_tokens
    graft.llm.TextAnalysis.clearArtifacts()
  }

  test("byte-level BPE alphabet includes digit bytes (x9 → 20,78,39)") {
    import spark.implicits._
    val docs = Seq((1L, "x9 x9 x9")).toDF("doc_id", "text")
    graft.llm.TextAnalysis.clearArtifacts()
    val m = graft.llm.TextAnalysis.byteBpeTrain(docs, 1).collect().head
    // v0: [20, 78, 39]; best pair (20,78) freq 3
    assert((m.getString(1), m.getString(2), m.getLong(3)) == (("20", "78", 3L)))
    graft.llm.TextAnalysis.clearArtifacts()
  }

  test("ivf upsert: batch assigns against the frozen book; hand-traced drift") {
    import spark.implicits._
    graft.llm.Clustering.clearArtifacts()
    // k=2, iters=1 → centroids = sq8 codes of the first two vectors:
    // c0=[0,0,0,0], c1=[64,0,0,0] (sq8 = clamp(floor(x·256)))
    val old = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(0.25f, 0f, 0f, 0f)),
      (2L, Array(0.01f, 0f, 0f, 0f)), (3L, Array(0.26f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // batch codes: v10=[5,..]→c0 d=25; v11=[64,..]→c1 d=0; v12=[8,..]→c0 d=64
    // cluster-0 batch mean = 6.5 → drift 6.5 (>5 ⇒ refit); cluster-1 drift 0
    val batch = Seq(
      (10L, Array(0.02f, 0f, 0f, 0f)), (11L, Array(0.25f, 0f, 0f, 0f)),
      (12L, Array(0.03125f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = graft.llm.Clustering
      .upsertAssign(old, batch, k = 2, iters = 1, dim = 4, driftThreshold = 5.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(got(10L) == ((0L, 25.0, 2L, 6.5, true)))
    assert(got(12L) == ((0L, 64.0, 2L, 6.5, true)))
    assert(got(11L) == ((1L, 0.0, 1L, 0.0, false)))
    graft.llm.Clustering.clearArtifacts()
  }

  test("non-AVI RIFF (WAV) and garbage are not claimed by the AVI codec") {
    assert(graft.llm.Multimodal.AviCodec
      .decode("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")).isEmpty)
    assert(graft.llm.Multimodal.AviCodec
      .decode(Array[Byte](1, 2, 3)).isEmpty)
  }
}
