package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — the concat-and-chunk step every LLM pre-training
  * pipeline runs after cleaning: documents are concatenated in a fixed
  * order and the token stream is cut into fixed-size context windows
  * ("chunks"); the pipeline needs to know, per document, which chunks
  * it lands in (for shard manifests, loss masking across boundaries,
  * and provenance).
  *
  * Scale shape: packing is computed per PARTITION (here the `lang`
  * column — in production a shard key), never globally: a global
  * running sum over 100 TB would serialize the whole corpus through
  * one task, while per-partition prefix sums are one hash shuffle plus
  * a per-group sort — and training shards are packed per shard anyway.
  * Document order within a partition is `doc_id` (deterministic).
  * Whitespace tokens stand in for BPE counts (same trade as
  * [[TextAnalysis.tokenCounts]]); swap the token expression for a real
  * tokenizer count column without touching the plan. */
object Packing {

  /** Per-document chunk span under concat-and-chunk packing with
    * `ctx`-token windows, partitioned by `lang`, ordered by `doc_id`.
    * Output: tok_start/tok_end (exclusive) offsets in the partition's
    * token stream, first/last chunk index, chunk span count. */
  def packChunks(docs: DataFrame, ctx: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("tok_start"), col("tok_end"),
        floor(col("tok_start") / ctx).as("chunk_first"),
        // empty docs occupy no chunk span; report their insertion point
        floor(greatest(col("tok_end") - 1, col("tok_start")) / ctx)
          .as("chunk_last"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
  }
}
