package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Clustering

/** Deterministic sq8 k-means (Lloyd's) + cluster-diversity sampling. */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark._

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("k-means separates three obvious blobs") {
    // three tight blobs at far corners of a 4-dim cube; vec_ids
    // interleave mod 3 so the deterministic lowest-k init picks one
    // seed per blob (Lloyd's converges to whatever basins the init
    // spans — a garbage all-in-one-blob init is not what's under test)
    val blob = Seq(
      (Seq(0.9f, 0.9f, 0.0f, 0.0f), (0 until 15).filter(_ % 3 == 0)),
      (Seq(-0.9f, -0.9f, 0.0f, 0.0f), (0 until 15).filter(_ % 3 == 1)),
      (Seq(0.0f, 0.0f, 0.9f, -0.9f), (0 until 15).filter(_ % 3 == 2)))
    val rows = blob.flatMap { case (c, ids) =>
      ids.map(i => (i.toLong, c.map(x => x + (i % 5) * 0.01f)))
    }
    val a = Clustering.kmeansSq8(vecs(rows), k = 3, iters = 3, dim = 4)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every blob lands in one cluster, and the clusters are distinct
    val byBlob = blob.map { case (_, ids) => ids.map(i => a(i.toLong)).toSet }
    assert(byBlob.forall(_.size == 1), s"blob split across clusters: $byBlob")
    assert(byBlob.flatten.toSet.size == 3)
  }

  test("empty clusters keep their previous centroid (no crash, k > distinct points)") {
    val rows = (0 until 6).map(i => (i.toLong, Seq(0.5f, 0.5f)))
    val a = Clustering.kmeansSq8(vecs(rows), k = 4, iters = 3, dim = 2)
      .select("vec_id", "cluster").collect()
    assert(a.length == 6)
    // identical points all tie to centroid 0 (lowest-cid tie-break)
    assert(a.map(_.getLong(1)).toSet == Set(0L))
  }

  test("assignment minimizes distance with lowest-cid tie-break") {
    // point equidistant from centroids 0 and 1 must pick 0
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.0f)), // the 2 init centroids
      (2L, Seq(0.0f, 0.0f)))                         // equidistant
    val a = Clustering.kmeansSq8(vecs(rows), k = 2, iters = 1, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a(2L) == 0L)
  }

  test("planKey distinguishes same-schema corpora read in one session") {
    // Regression: the canonicalized logical plan of a lazy parquet
    // read prints NO path ("paths: 1 provided"), so keying on it alone
    // collides sf0.001 with sf0.01 and serves wrong-corpus artifacts.
    // The key must embed the resolved input files.
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(Clustering.planKey(a) != Clustering.planKey(b))
    // and it must still be STABLE for re-reads of the same corpus
    val a2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(Clustering.planKey(a) == Clustering.planKey(a2))
  }

  test("BPE merge tables differ across corpora within one session") {
    // end-to-end twin of the planKey test: train on one corpus, then
    // the other, same JVM — the memo must NOT serve the first table
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val ma = graft.llm.TextAnalysis.bpeMerges(a, 5)
    val mb = graft.llm.TextAnalysis.bpeMerges(b, 5)
    assert(ma != mb, "same merge table for two different corpora — cache key collision")
  }

  test("drift-triggered partial refit: only drifted cells retrain and reassign") {
    // init (iters=1) seeds cid0 at vec 0's code (0,0,0,0) and cid1 at
    // vec 1's code (102,102,102,102). Batch: two vectors at code 115
    // (drift ‖(115..)−(102..)‖ = 26 > 10 → cell 1 drifts) and one at
    // cell 0's exact centroid (drift 0 → frozen).
    val a = Seq(0f, 0f, 0f, 0f)
    val b = Seq(0.4f, 0.4f, 0.4f, 0.4f)     // sq8 code 102
    val bShift = Seq(0.45f, 0.45f, 0.45f, 0.45f) // sq8 code 115
    val existing = vecs(Seq(0L -> a, 1L -> b, 2L -> a, 3L -> b))
    val batch = vecs(Seq(100L -> bShift, 101L -> bShift, 102L -> a))
    val out = Clustering
      .refitDrifted(existing, batch, k = 2, iters = 1, dim = 4,
        driftThreshold = 10.0)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 7)
    // frozen cell 0: existing + batch members untouched, refit=false
    assert(out(0L) == ((0L, 0.0, false)))
    assert(out(2L) == ((0L, 0.0, false)))
    assert(out(102L) == ((0L, 0.0, false)))
    // drifted cell 1: one restricted Lloyd round — centroid moves to
    // the exact member mean (102,102 + 115,115)/4 = 108.5 per dim, so
    // every member sits at squared-L2 4·6.5² = 169 from it
    for (id <- Seq(1L, 3L, 100L, 101L))
      assert(out(id) == ((1L, 169.0, true)), s"vec $id: ${out(id)}")
    // an unreachable threshold freezes everything (pure upsert path)
    val frozen = Clustering
      .refitDrifted(existing, batch, k = 2, iters = 1, dim = 4,
        driftThreshold = 1e9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(frozen.size == 7 && frozen.values.forall(_ == false))
  }

  test("trained-IVF top-k: high recall vs exact sq8 ranking") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = graft.llm.Similarity.sq8TopK(emb, col("vec_id") < 10, 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.llm.Similarity
      .ivfTrainedTopK(emb, col("vec_id") < 10, 5, nprobe = 2, cells = 8,
        iters = 3, dim = 64)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == 50) // 10 queries × full top-5 each
    // deterministic pipeline: measured 42/50 on this corpus; assert a
    // margin below so a constant tweak doesn't flap the suite
    assert((exact intersect ivf).size >= 35,
      s"recall collapsed: ${(exact intersect ivf).size}/50")
  }

  test("PQ encode: m codes per vector, each within [0, kSub)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val enc = Clustering.pqEncode(emb, m = 8, kSub = 16, iters = 2, dim = 64)
    val rows = enc.collect()
    assert(rows.length == emb.count())
    assert(enc.columns.toSeq == ("vec_id" +: (0 until 8).map(s => s"c$s")))
    for (r <- rows; s <- 1 to 8) {
      val c = r.getLong(s); assert(c >= 0 && c < 16, s"code out of range: $c")
    }
  }

  test("PQ codes are identical for identical vectors") {
    import spark.implicits._
    val v = Seq.tabulate(8)(i => 0.1f * i - 0.3f)
    val emb = Seq((0L, v), (1L, v.map(x => -x)), (2L, v))
      .toDF("vec_id", "embedding")
    val enc = Clustering.pqEncode(emb, m = 4, kSub = 2, iters = 2, dim = 8)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(enc(0L) == enc(2L))
  }

  test("PQ ADC top-k: deterministic ranking, bounded distortion") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // exact L2 ground truth over the same sq8 codes
    val z = emb.withColumn("qv", graft.llm.Similarity.sq8(col("embedding")))
    val q = z.where(col("vec_id") < 10).select(col("vec_id").as("q"), col("qv").as("qa"))
    val c = z.select(col("vec_id").as("cand"), col("qv").as("cb"))
    val d = aggregate(zip_with(col("qa"), col("cb"),
      (x, y) => { val t = x - y; t * t }), lit(0.0), (a, x) => a + x)
    val w = Window.partitionBy(col("q")).orderBy(col("d"), col("cand"))
    val exact = q.join(c, col("q") =!= col("cand")).withColumn("d", d)
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.llm.Similarity
      .pqTopK(emb, col("vec_id") < 10, 5, m = 8, kSub = 16, iters = 2, dim = 64)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 50)
    // the synthetic embeddings are near-uniform random — the WORST
    // case for vector quantization (no cluster structure to exploit;
    // distances concentrate, so quantization noise scrambles ranks).
    // Measured: 14/50 agreement with exact L2, deterministic. Pin a
    // floor that catches algorithmic regressions, not the data's
    // hostility; real embedding corpora sit far above it.
    assert((exact intersect pq).size >= 10,
      s"ADC agreement collapsed: ${(exact intersect pq).size}/50")
  }

  test("diverse sample: at most n per cluster, ranked nearest-first") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Clustering.diverseTopN(emb, k = 8, iters = 3, dim = 64, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.groupBy(_._1).forall(_._2.length <= 3))
    assert(got.groupBy(_._1).forall { case (_, g) =>
      g.map(_._3).sorted.toSeq == (1L to g.length).toSeq })
    // exemplars are distinct documents
    assert(got.map(_._2).distinct.length == got.length)
  }

  test("IVF-ADC with nprobe = cells degenerates to exact pqTopK") {
    import org.apache.spark.sql.functions.col
    // probing every cell makes the coarse quantizer a no-op filter, so
    // the composite must EQUAL the standalone PQ ranking row-for-row
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val pq = rows(graft.llm.Similarity.pqTopK(emb, col("vec_id") < 10, 5,
      m = 8, kSub = 16, iters = 2, dim = 64))
    val ivfpq = rows(graft.llm.Similarity.ivfPqTopK(emb, col("vec_id") < 10,
      5, nprobe = 8, cells = 8, ivfIters = 3, m = 8, kSub = 16,
      pqIters = 2, dim = 64))
    assert(ivfpq == pq)
    // and the pruned variant keeps full result shape (10 × top-5)
    val pruned = rows(graft.llm.Similarity.ivfPqTopK(emb, col("vec_id") < 10,
      5, nprobe = 2, cells = 8, ivfIters = 3, m = 8, kSub = 16,
      pqIters = 2, dim = 64))
    assert(pruned.size == 50)
    assert(pruned.groupBy(_._1).forall(_._2.map(_._3).toSeq.sorted == (1L to 5L)))
  }

  test("clustered fixture: trained IVF and IVF-PQ keep recall@5 >= 0.8") {
    // the shared embeddings table is near-uniform (VQ's worst case);
    // this floor is the MEANINGFUL recall claim for clusterable
    // corpora — on mixture-of-centroids data the trained tiers must
    // recover most exact neighbors
    import org.apache.spark.sql.functions._
    val emb = graft.llm.Similarity.clusteredFixture(spark)
    val brute = graft.llm.Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select(col("q"), col("cand"))
    def meanRecall(ann: org.apache.spark.sql.DataFrame): Double = {
      val hits = brute.join(ann.select(col("q"), col("cand")),
        Seq("q", "cand"), "left_semi").count()
      hits / 50.0 // 10 queries × 5
    }
    val ivft = meanRecall(graft.llm.Similarity.ivfTrainedTopK(
      emb, col("vec_id") < 10, 5, nprobe = 2, cells = 8, iters = 3, dim = 64))
    val ivfpq = meanRecall(graft.llm.Similarity.ivfPqTopK(
      emb, col("vec_id") < 10, 5, nprobe = 2, cells = 8, ivfIters = 3,
      m = 8, kSub = 16, pqIters = 2, dim = 64))
    assert(ivft >= 0.8, s"trained-IVF recall@5 $ivft < 0.8 on clustered data")
    assert(ivfpq >= 0.8, s"IVF-PQ recall@5 $ivfpq < 0.8 on clustered data")
  }
}
