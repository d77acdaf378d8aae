package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 additions: WordPiece tokenizer (train + apply), GraphQL
  * _count (server-level cases live in ServerSpec), semi-naive
  * closeness early-exit. */
class Round14OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("wordpiece trainer picks the likelihood argmax and strips ## on merge") {
    import spark.implicits._
    // words: aaab×2, cab×1.
    // v0: aaab=[a,##a,##a,##b], cab=[c,##a,##b]
    // units: a=2, ##a=5, ##b=3, c=1
    // pairs: (a,##a)=2, (##a,##a)=2, (##a,##b)=3, (c,##a)=1
    // scores·1e12: 200e9 / 80e9 / 200e9 / 200e9 — three-way tie at
    // 0.2, lexicographic lhs tie-break: '#' < 'a' < 'c' → (##a,##b)
    // wins round 1 (freq 3), merged symbol ##ab (## stripped from rhs).
    // round 2: aaab=[a,##a,##ab], cab=[c,##ab]; units a=2,##a=2,
    // ##ab=3,c=1; scores: (a,##a)=0.5, (##a,##ab)=1/3, (c,##ab)=1/3
    // → (a,##a) wins (freq 2, score 500e9).
    val docs = Seq((1L, "aaab aaab cab")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.wordpieceTrain(docs, 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "##a", "##b", 3L, 200000000000L),
      (2L, "a", "##a", 2L, 500000000000L)))
    // apply: aaab → [aa,##ab] (2 pieces), cab → [c,##ab] (2 pieces);
    // doc 1 has 3 words → 2·2 + 1·2 = 6 pieces
    val app = graft.llm.TextAnalysis.wordpieceApply(docs, 2).collect()
    assert(app.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 6L)))
  }

  test("wordpiece handles single-char words (no pairs) and stops early") {
    import spark.implicits._
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    // every word is one bare symbol — no adjacent pairs, trainer stops
    assert(graft.llm.TextAnalysis.wordpieceTrain(docs, 3).count() == 0L)
    val app = graft.llm.TextAnalysis.wordpieceApply(docs, 3).collect()
    assert(app.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L)))
  }

  test("stateless wordpiece encode equals the batch type-table encoder") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab cab"), (2L, "b aaab"), (3L, "!!!"))
      .toDF("doc_id", "text")
    val merges = graft.llm.TextAnalysis.wordpieceMerges(docs, 2)
    val streamShape = graft.llm.TextAnalysis.wordpieceEncode(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.llm.TextAnalysis.wordpieceApply(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamShape == batch)
    // doc 3 has no letter-words: absent from BOTH (join/filter parity)
    assert(!streamShape.exists(_._1 == 3L))
  }

  test("mp4 codec chain decodes container metadata end-to-end") {
    import spark.implicits._
    val docs = Seq((5L, "x"), (77L, "y")).toDF("doc_id", "text")
    // via the generic chain (ImageIO → WAV → MP4): dims + format
    val meta = graft.llm.Multimodal.decodeMeta(
      graft.llm.Multimodal.withMp4Payload(docs)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(meta(5L) == ((272L, 325L, 245L, "video/mp4")))
    assert(meta(77L) == ((272L, 397L, 317L, "video/mp4")))
    // the rich path adds both clocks
    val full = graft.llm.Multimodal.mp4Meta(
      graft.llm.Multimodal.withMp4Payload(docs.where(col("doc_id") === 5)))
      .collect().head
    assert((full.getLong(2), full.getLong(3), full.getLong(6),
      full.getLong(7)) == ((1000L, 1005L, 48000L, 48240L)))
    // corrupt: ftyp magic but the first box size overruns the buffer
    val junk = Array[Byte]('_', '_', '_', '_', 'f', 't', 'y', 'p') ++
      Array.fill[Byte](8)(0x7f)
    assert(graft.llm.Multimodal.Mp4Codec.decode(junk).isEmpty)
  }

  test("mkv/webm codec walks EBML metadata through the generic chain") {
    import spark.implicits._
    val docs = Seq((5L, "x"), (77L, "y")).toDF("doc_id", "text")
    val meta = graft.llm.Multimodal.decodeMeta(
      graft.llm.Multimodal.withMkvPayload(docs)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(meta(5L) == ((61L, 325L, 245L, "video/webm")))
    assert(meta(77L) == ((61L, 397L, 317L, "video/webm")))
    val full = graft.llm.Multimodal.mkvMeta(
      graft.llm.Multimodal.withMkvPayload(docs.where(col("doc_id") === 5)))
      .collect().head
    assert((full.getLong(2), full.getLong(3)) == ((1000000L, 1005L)))
    // truncated EBML (magic only) falls through to the stub path
    val junk = Array[Byte](0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte)
    assert(graft.llm.Multimodal.MkvCodec.decode(junk).isEmpty)
  }

  test("mp4 codec handles version-1 boxes and skips 0-dim audio tracks") {
    val bb = java.nio.ByteBuffer.allocate(448)
    def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    def matrix(): Unit = Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
      0x40000000).foreach(bb.putInt)
    bb.putInt(16); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
    bb.putInt(432); fourcc("moov")
    bb.putInt(120); fourcc("mvhd")                 // VERSION 1
    bb.putInt(0x01000000)                          // version=1, flags=0
    bb.putLong(0).putLong(0)                       // 64-bit ctime/mtime
    bb.putInt(90000); bb.putLong(123456789L)       // timescale, 64-bit dur
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort)
    bb.put(new Array[Byte](10)); matrix(); bb.put(new Array[Byte](24))
    bb.putInt(3)
    // trak 1: AUDIO — v0 tkhd with 0x0 dims; must be skipped
    bb.putInt(140); fourcc("trak")
    bb.putInt(92); fourcc("tkhd"); bb.putInt(7)
    bb.putInt(0).putInt(0); bb.putInt(1); bb.putInt(0); bb.putInt(100)
    bb.put(new Array[Byte](8)); bb.putShort(0).putShort(0)
    bb.putShort(0x0100.toShort).putShort(0); matrix()
    bb.putInt(0).putInt(0)                         // 0×0 (audio)
    bb.putInt(40); fourcc("mdia")
    bb.putInt(32); fourcc("mdhd"); bb.putInt(0)
    bb.putInt(0).putInt(0); bb.putInt(44100); bb.putInt(44100)
    bb.putShort(0x55C4.toShort).putShort(0)
    // trak 2: VIDEO — v1 tkhd/mdhd
    bb.putInt(164); fourcc("trak")
    bb.putInt(104); fourcc("tkhd"); bb.putInt(0x01000007)
    bb.putLong(0).putLong(0); bb.putInt(2); bb.putInt(0); bb.putLong(100L)
    bb.put(new Array[Byte](8)); bb.putShort(0).putShort(0)
    bb.putShort(0).putShort(0); matrix()
    bb.putInt(1920 << 16).putInt(1080 << 16)
    bb.putInt(52); fourcc("mdia")
    bb.putInt(44); fourcc("mdhd"); bb.putInt(0x01000000)
    bb.putLong(0).putLong(0); bb.putInt(48000); bb.putLong(987654321L)
    bb.putShort(0x55C4.toShort).putShort(0)
    val got = graft.llm.Multimodal.Mp4Codec.meta(bb.array())
    assert(got.contains(graft.llm.Multimodal.Mp4Codec.Mp4Meta(
      90000L, 123456789L, 1920L, 1080L, 48000L, 987654321L)))
  }

  test("LPA at rounds>=4 (the eager-checkpoint path) stays correct") {
    import spark.implicits._
    // rounds=8 crosses the i%4 lineage cut twice; the two-triangle
    // fixture's labels are already converged by round 3, so the extra
    // rounds must be a fixed point — any checkpoint corruption shows
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("a3", "b1")).toDF("src", "dst")
    val got = graft.operators.Lpa.communities(edges, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "a3", "b2" -> "a3", "b3" -> "a3"))
  }

  test("tokenizer artifacts round-trip through parquet persistence") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab cab")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    // WordPiece merges: save → load preserves order and scores, and
    // the stateless encoder under the LOADED artifact equals the
    // in-memory one (the cross-JVM serving path)
    val wp = graft.llm.TextAnalysis.wordpieceMerges(docs, 2)
    graft.llm.TextAnalysis.saveWordpieceMerges(spark, s"$dir/wp", wp)
    val wp2 = graft.llm.TextAnalysis.loadWordpieceMerges(spark, s"$dir/wp")
    assert(wp2 == wp)
    assert(graft.llm.TextAnalysis.wordpieceEncode(docs, wp2).collect().toSeq ==
      graft.llm.TextAnalysis.wordpieceEncode(docs, wp).collect().toSeq)
    // BPE merges + unigram vocab round-trip too
    val bpe = graft.llm.TextAnalysis.bpeMerges(docs, 3)
    graft.llm.TextAnalysis.saveBpeMerges(spark, s"$dir/bpe", bpe)
    assert(graft.llm.TextAnalysis.loadBpeMerges(spark, s"$dir/bpe") == bpe)
    val uni = graft.llm.TextAnalysis.unigramVocab(docs, 8, 3, 1, 16)
    graft.llm.TextAnalysis.saveUnigramVocab(spark, s"$dir/uni", uni)
    assert(graft.llm.TextAnalysis.loadUnigramVocab(spark, s"$dir/uni")
      .sortBy(_._1) == uni.sortBy(_._1))
  }

  test("closeness early-exits when the frontier empties before maxHops") {
    import spark.implicits._
    // diameter-1 graph with maxHops 6: the hop-2 frontier is empty,
    // so the loop must stop (result identical either way)
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = graft.operators.Centrality.landmarkCloseness(edges, k = 2, maxHops = 6)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "a" -> ((2L, 1L, 2000000L)), "b" -> ((2L, 1L, 2000000L))))
  }

  test("resize thumbnail: exact NN resample of a hand-built raster") {
    import spark.implicits._
    // 2×2 source (TL=1, TR=2, BL=3, BR=4) resized to 4×2: columns 0-1
    // sample sx=0, columns 2-3 sample sx=1; rows 0 → sy=0, 1 → sy=1
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 1); img.setRGB(1, 0, 2)
    img.setRGB(0, 1, 3); img.setRGB(1, 1, 4)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((7L, bos.toByteArray)).toDF("doc_id", "payload")
    val r = graft.llm.Multimodal.resizeThumb(df, 4, 2).collect().head
    // expected pixels row0: 1,1,2,2 (weights 1..4); row1: 3,3,4,4 (5..8)
    val expected = 1 * 1 + 1 * 2 + 2 * 3 + 2 * 4 + 3 * 5 + 3 * 6 + 4 * 7 + 4 * 8
    assert((r.getLong(1), r.getLong(2), r.getLong(5)) ==
      ((2L, 2L, expected.toLong)))
  }

  test("harmonic centrality: exact integer 1/d terms over the shared BFS") {
    import spark.implicits._
    // path a—b—c, landmarks = 2 least ids (a, b); self dist-0 excluded:
    // a: 1/1 from b; b: 1/1 from a; c: 1/2 from a + 1/1 from b
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = graft.operators.Centrality.landmarkHarmonic(edges, k = 2,
      maxHops = 6).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((1L, 1000000L)), "b" -> ((1L, 1000000L)),
      "c" -> ((2L, 1500000L))))
  }

  test("skew profile: heavy keys, shares, straggler ratio, entropy") {
    import spark.implicits._
    // key distribution 8/4/2/2: total 16, 4 keys, mean 4, max 8,
    // entropy = -(1/2 lg 1/2 + 1/4 lg 1/4 + 2 * 1/8 lg 1/8) = 1.75
    val df = (Seq.fill(8)("hot") ++ Seq.fill(4)("warm") ++
      Seq.fill(2)("c1") ++ Seq.fill(2)("c2")).toDF("k")
    val got = graft.operators.Warehouse.skewProfile(df, col("k"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))
    assert(got.toSeq == Seq(
      (1L, "hot", 8L, 0.5, 4L, 4.0, 8L, 2.0, 1.75),
      (2L, "warm", 4L, 0.25, 4L, 4.0, 8L, 2.0, 1.75)))
  }

  test("zipf fit: OLS over ln(rank), ln(freq) matches the closed form") {
    import spark.implicits._
    // counts a:4 b:2 c:1 → points (ln1,ln4) (ln2,ln2) (ln3,ln1)
    val docs = Seq((1L, "a a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = graft.llm.TextAnalysis.zipfFit(docs, topN = 10).collect().head
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == r6(slope))
    assert(r.getDouble(2) == r6((sy - slope * sx) / n))
    assert(slope < -1.0 && slope > -1.5) // sane zipf range for the fixture
  }

  test("double-sweep diameter: exact bounds on a path graph") {
    import spark.implicits._
    // path a—b—c—d: start = a (least id), far = d at ecc 3;
    // second sweep from d also reaches 3 → lb 3, ub 6
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val r = graft.operators.Centrality.doubleSweepDiameter(edges, maxHops = 6)
      .collect().head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("a", "d", 3L, 3L, 6L)))
  }

  test("join cardinality: exact sum of per-key count products") {
    import spark.implicits._
    val left = Seq("a", "a", "b").toDF("k")
    val right = Seq("a", "b", "b", "c").toDF("k")
    val got = graft.operators.Warehouse.joinCardinality(
      left, col("k"), right, col("k"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
        r.getLong(11)))
    // a: 2·1=2, b: 1·2=2 → est 4; c never matches
    assert(got.toSeq == Seq(
      (1L, "a", 2L, 1L, 2L, 0.5, 4L, 2L, 3L, 2L, 4L, 3L),
      (2L, "b", 1L, 2L, 2L, 0.5, 4L, 2L, 3L, 2L, 4L, 3L)))
  }

  test("skew profile plan: top-k is a heap (TakeOrdered), not a full sort") {
    import spark.implicits._
    // topK must be < the scan's static maxRows or EliminateLimits
    // removes the limit outright (and with it the TakeOrdered shape)
    val df = ('a' to 'h').map(_.toString).toDF("k")
    val plan = graft.operators.Warehouse.skewProfile(df, col("k"), topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
