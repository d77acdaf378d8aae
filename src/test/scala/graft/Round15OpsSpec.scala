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

  test("non-AVI RIFF (WAV) and garbage are not claimed by the AVI codec") {
    assert(graft.llm.Multimodal.AviCodec
      .decode("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")).isEmpty)
    assert(graft.llm.Multimodal.AviCodec
      .decode(Array[Byte](1, 2, 3)).isEmpty)
  }
}
