package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayDot

/** Covariance-free PCA by distributed power iteration with deflation —
  * the leading principal directions of an embedding corpus without
  * ever materializing the d×d covariance matrix.
  *
  * The 100 TB shape: each iteration evaluates the matrix-vector
  * product `Σᵢ (xᵢ−μ)((xᵢ−μ)·v)` STREAMING — one narrow scan of the
  * embedding column, one map-side-combinable aggregate of d+1 sums
  * (the per-element accumulators partial-aggregate on executors; only
  * d doubles reach the driver per round). Centering never materializes
  * centered vectors: `(x−μ)·v = x·v − μ·v` and
  * `Σ(x−μ)y = Σxy − μ·Σy`, so the scan reads raw rows and the driver
  * applies the O(d) correction. Deflation (higher components) is also
  * an O(d) DRIVER-side Gram-Schmidt step on the aggregated update —
  * component count multiplies the tiny driver math, not the data
  * passes' width. Driver state is O(d·iters·comps); work per round is
  * O(n·d) regardless of d² — this is what covariance-based PCA cannot
  * do at 64-dim × 10¹¹ rows.
  *
  * Determinism (the oracle contract): the start vector is the constant
  * 1/8 vector, and after every round the deflated update is scaled by
  * its max-abs component and QUANTIZED to 6 decimals. The quantization
  * is a drift barrier — cross-engine float sums differ in grouping
  * order at ~1e-13, but both engines land on the same 6-decimal
  * vector, so every downstream per-row projection is bit-identical
  * (same sequential dot fold as DuckDB's list_dot_product; see
  * [[graft.functions.ArrayDot]]). Same scheme as the integer-scaled
  * PageRank/logistic oracles: agree on a rounded artifact at each
  * round boundary, then diverge nowhere. Caveat: on an EXACTLY
  * low-rank corpus the deflated update for the missing component is
  * pure float residue (~1e-16) and its amplified direction is
  * engine-specific — real embedding corpora are full-rank, and the
  * max-abs==0 guard covers the analytically-zero case.
  *
  * No reference analogue — this is training-data-pipeline surface
  * (embedding whitening / dimension triage ahead of the ANN tiers in
  * [[Similarity]]). */
object Pca {

  /** Quantized per-element corpus mean (one aggregate pass). */
  private[llm] def meanVec(x: DataFrame, dim: Int): IndexedSeq[Double] = {
    val aggs = (0 until dim).map(k =>
      round(avg(element_at(col("x"), k + 1)), 6).as(s"m$k"))
    val r = x.agg(aggs.head, aggs.tail: _*).collect().head
    (0 until dim).map(r.getDouble)
  }

  /** Sequential left-fold dot — the shared summation-order contract of
    * ArrayDot and DuckDB's list_dot_product. */
  private def dotSeq(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def vLit(v: IndexedSeq[Double]): Column = array(v.map(lit): _*)

  private def quantize(u: IndexedSeq[Double]): IndexedSeq[Double] = {
    val m = u.map(math.abs).max
    if (m == 0.0) u.map(_ => 0.0)
    else u.map(uk => BigDecimal(uk / m)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Fit the top `nComp` principal directions of `embCol`
    * (array<float|double>, `dim` elements): returns (quantized mean,
    * per-component quantized max-abs-scaled directions). `iters` fixed
    * small (power iteration converges geometrically in the
    * spectral-gap ratio; 3 rounds is the pinned oracle contract). */
  def fitComponents(emb: DataFrame, embCol: String, dim: Int,
                    nComp: Int = 2, iters: Int = 3)
      : (IndexedSeq[Double], IndexedSeq[IndexedSeq[Double]]) = {
    val x = emb.select(col(embCol).cast("array<double>").as("x"))
    val mu = meanVec(x, dim)
    val comps = scala.collection.mutable.ArrayBuffer[IndexedSeq[Double]]()
    for (_ <- 0 until nComp) {
      var v: IndexedSeq[Double] = IndexedSeq.fill(dim)(0.125)
      for (_ <- 1 to iters) {
        val y = ArrayDot.dot(col("x"), vLit(v)) - lit(dotSeq(mu, v))
        val aggs = (0 until dim).map(k =>
          sum(element_at(col("x"), k + 1) * col("y")).as(s"s$k")) :+
          sum(col("y")).as("sy")
        val r = x.withColumn("y", y).agg(aggs.head, aggs.tail: _*)
          .collect().head
        val sy = r.getDouble(dim)
        var u = (0 until dim).map(k => r.getDouble(k) - mu(k) * sy)
        // deflate: Gram-Schmidt against already-found components
        // (O(d) driver math — the scan never sees it)
        for (p <- comps) {
          val rr = dotSeq(u, p) / dotSeq(p, p)
          u = (0 until dim).map(k => u(k) - rr * p(k))
        }
        v = quantize(u)
      }
      comps += v
    }
    (mu, comps.toIndexedSeq)
  }

  /** Per-row projections onto the fitted directions (centered),
    * rounded to 6 decimals — deterministic given the quantized
    * (mu, comps). */
  def projectAll(emb: DataFrame, idCol: String, embCol: String,
                 mu: IndexedSeq[Double],
                 comps: IndexedSeq[IndexedSeq[Double]]): DataFrame = {
    val projs = comps.zipWithIndex.map { case (v, i) =>
      round(ArrayDot.dot(col(embCol).cast("array<double>"), vLit(v)) -
        lit(dotSeq(mu, v)), 6).as(s"proj${i + 1}")
    }
    emb.select(col(idCol) +: projs: _*)
  }

  /** Fit + project in one call (the `llm_pca_power` query surface). */
  def powerProjection(emb: DataFrame, idCol: String = "vec_id",
                      embCol: String = "embedding", dim: Int = 64,
                      nComp: Int = 2, iters: Int = 3): DataFrame = {
    val (mu, comps) = fitComponents(emb, embCol, dim, nComp, iters)
    projectAll(emb, idCol, embCol, mu, comps)
  }
}
