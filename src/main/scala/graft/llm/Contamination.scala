package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark-contamination detection — the decontamination pass every
  * large-scale training pipeline runs before training: find corpus
  * documents that overlap an evaluation/benchmark set at the n-gram
  * level, so eval data can be held out of the training corpus.
  *
  * Scale shape: the benchmark side is tiny relative to the corpus
  * (eval suites are megabytes against terabytes), so its distinct
  * shingle set is BROADCAST; the corpus side is one scan + a broadcast
  * hash-probe per shingle — corpus rows are never shuffled, and the
  * only exchange is the per-document hit-count aggregation. At 100 TB
  * this is a map-side semi-join followed by a partial-aggregated
  * groupBy on doc_id.
  */
object Contamination {

  /** Per-corpus-document overlap against the benchmark documents
    * selected by `benchPred`: fraction of the document's distinct word
    * 3-gram shingles that occur anywhere in the benchmark set.
    * Shares [[Dedup.shingleSets]] so contamination and near-dup passes
    * agree on the shingle definition (and the oracle replays both).
    *
    * `benchPred` may only reference columns of the shingle frame —
    * `doc_id` (the `text` column does not survive shingling).
    *
    * Single corpus shingle pass: `n_grams` rides along through the
    * explode, and the broadcast probe is a LEFT join so zero-hit
    * documents fall out of the same aggregate — no second shingling of
    * the corpus for the rollup. */
  def ngramOverlap(docs: DataFrame, benchPred: Column): DataFrame = {
    val sets = Dedup.shingleSets(docs)
    val bench = sets.where(benchPred)
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("__hit", lit(1L))
    sets.where(!benchPred)
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_grams"),
        explode_outer(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast(DoubleType) / col("n_grams"), 6)
          .as("ratio"))
  }
}
