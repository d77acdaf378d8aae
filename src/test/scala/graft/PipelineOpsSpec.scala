package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Sampling, Similarity}
import graft.operators.RangeJoin

/** Round-5 pipeline operators: binned range join, sq8 quantized
  * similarity, incremental dedup, shard manifest. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("binned range join equals the nested-loop join, any bin width") {
    import spark.implicits._
    val points = (1 to 300).map(i => (i.toLong, java.sql.Timestamp.valueOf(
      s"2024-01-01 ${"%02d".format(i % 24)}:${"%02d".format(i % 60)}:00")))
      .toDF("pid", "ts")
    val ivals = (1 to 40).map { i =>
      val s = java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(i % 20)}:00:00")
      val e = java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(i % 20)}:${"%02d".format((i * 7) % 60)}:59")
      (i.toLong, s, e)
    }.toDF("wid", "ws", "we")
    val brute = points.crossJoin(ivals)
      .where($"ts" >= $"ws" && $"ts" <= $"we")
      .select("pid", "wid").orderBy("pid", "wid").collect().toSeq
    for (binUs <- Seq(60L * 1000000, 17L * 60 * 1000000, 3600L * 1000000)) {
      val got = RangeJoin.binned(points, "ts", ivals, "ws", "we", binUs)
        .select("pid", "wid").orderBy("pid", "wid").collect().toSeq
      assert(got == brute, s"binMicros=$binUs")
    }
  }

  test("range join rejects colliding column names") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("ts", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.binned(a, "ts", a, "ts", "x", 1000)
    }
  }

  test("sq8 quantization codes are exact integers in [-128, 127]") {
    import spark.implicits._
    val df = Seq((1L, Seq(-0.9f, -0.004f, 0.0f, 0.003f, 0.49f, 0.9f)))
      .toDF("vec_id", "embedding")
    val codes = df.select(Similarity.sq8(col("embedding"))).head()
      .getSeq[Double](0)
    assert(codes == Seq(-128.0, -2.0, 0.0, 0.0, 125.0, 127.0))
  }

  test("sq8 top-k ranks nearly like exact cosine on the testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.sq8TopK(emb, col("vec_id") < 10, 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization perturbs ranks only marginally: demand >= 80%
    // agreement on the top-5 sets (exactly 50 pairs each)
    assert(quant.size == 50)
    assert((exact intersect quant).size >= 40,
      s"recall too low: ${(exact intersect quant).size}/50")
  }

  test("incremental dedup: exact beats near, unmatched docs are new") {
    import spark.implicits._
    val corpusDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, corpusDoc),                       // corpus
      (1L, "totally different text about completely other things entirely"),
      (10L, corpusDoc),                      // new: exact dup of 0
      (11L, "Alpha beta GAMMA delta epsilon zeta eta theta!!"), // new: canonical-exact of 0
      (12L, "alpha beta gamma delta epsilon zeta eta iota"),    // new: near dup of 0
      (13L, "nothing like anything else in the corpus at all honestly")
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(docs, col("doc_id") >= 10, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "exact", 11L -> "exact", 12L -> "near", 13L -> "new"))
  }

  test("shard manifest covers every doc exactly once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Sampling.shardManifest(docs, 8).collect()
    assert(m.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(m.map(_.getLong(1)).sum == docs.count())
    val toks = docs.select(sum(size(split(trim(col("text")), "\\s+"))))
      .head().getLong(0)
    assert(m.map(_.getLong(2)).sum == toks)
  }
}
