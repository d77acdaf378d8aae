package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (SURVEY §2.12):
  *  - brute-force cosine top-k: exact baseline. The query side is small
  *    (a filter), so Catalyst broadcasts it; the corpus streams — no
  *    shuffle of the big side.
  *  - IVF with deterministic medoid centroids: coarse-quantize the
  *    corpus into cells (one shuffle on cell id), probe the closest
  *    `nprobe` cells per query, exact-rerank inside. This is the
  *    100 TB path: candidate set ∝ corpus/cells × nprobe.
  * Centroids are label-medoids (min vec_id per label) rather than
  * k-means means so every step is exactly reproducible in the oracle
  * (no floating-point averaging order).
  */
object Similarity {

  private def cos(a: Column, b: Column): Column =
    cosine(a.cast("array<double>"), b.cast("array<double>"))

  /** Exact top-k neighbors for each query vector (queries = filter). */
  def bruteTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val q = emb.where(isQuery).select(col("vec_id").as("q"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cand"), col("embedding").as("ce"))
    val sims = broadcast(q).join(c, col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic coarse centroids: the min-vec_id member per label. */
  def medoidCentroids(emb: DataFrame): DataFrame =
    emb.groupBy(col("label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("cemb"))
      .select(col("label").as("cell"), col("cemb"))

  /** Cell assignment: nearest centroid by cosine (broadcast 10 rows). */
  def ivfAssign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(cents))
      .withColumn("csim", cos(col("embedding"), col("cemb")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** IVF top-k: probe the `nprobe` closest cells, exact-rerank inside. */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int, nprobe: Int): DataFrame = {
    val cents = medoidCentroids(emb)
    val assigned = ivfAssign(emb, cents)
    val q = emb.where(isQuery).select(col("vec_id").as("q"), col("embedding").as("qe"))
    val qc = q.crossJoin(broadcast(cents))
      .withColumn("csim", cos(col("qe"), col("cemb")))
    val wq = Window.partitionBy(col("q")).orderBy(col("csim").desc, col("cell"))
    val probed = qc.withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("q"), col("qe"), col("cell"))
    val cand = probed.join(assigned.select(col("cell"),
        col("vec_id").as("cand"), col("embedding").as("ce")), Seq("cell"))
      .where(col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    cand.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }
}
