package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composition the
  * individual operators exist for (SURVEY §2.12):
  *
  *   quality gate → exact dedup → MinHash-LSH near-dup removal
  *
  * Every stage is a declarative DataFrame transformation, so Catalyst
  * plans the WHOLE pipeline as one job graph: the quality gate is a
  * full-scan codegen'd filter, exact dedup is one shuffle on the
  * content hash, and near-dup candidates come from the banded LSH
  * equi-join (shuffle ∝ collisions). Survivor policy is deterministic:
  * the min doc_id of an exact group survives; of a verified near-dup
  * pair, the smaller doc_id survives. At 100 TB nothing here is
  * all-pairs and nothing lands on the driver. */
object Pipeline {

  /** Surviving doc_ids with their quality signals. */
  def cleanCorpus(docs: DataFrame,
                  maxStopRatio: Double = 0.5,
                  minMeanTokLen: Double = 2.0,
                  nearDupThreshold: Double = 0.5): DataFrame = {
    // 1. quality gate (cheap heuristics, full scan speed)
    val q = TextAnalysis.quality(docs)
      .where(col("stop_ratio") <= maxStopRatio &&
        col("mean_tok_len") >= minMeanTokLen)
    val gated = docs.join(q.select("doc_id"), Seq("doc_id"), "left_semi")

    // 2. exact dedup: keep the min doc_id of each content-hash group
    val keepers = Dedup.exactGroups(gated).select(col("keep").as("doc_id"))
    val exactKept = gated.join(keepers, Seq("doc_id"), "left_semi")

    // 3. near-dup removal: LSH candidates verified by shingle jaccard;
    //    in each surviving pair the larger doc_id is dropped
    val losers = Dedup.minhashNearDups(exactKept, nearDupThreshold)
      .select(col("db").as("doc_id")).distinct()
    val cleaned = exactKept.join(losers, Seq("doc_id"), "left_anti")

    cleaned.join(q, Seq("doc_id"))
      .select(col("doc_id"), col("stop_ratio"), col("mean_tok_len"))
  }

  /** Pipeline v4 — the round-14 composition: benchmark
    * DECONTAMINATION in front of the v1 cleaning chain, closed with
    * the per-language accounting a mixture plan consumes:
    *
    *   decontaminate (n-gram overlap < threshold; the benchmark docs
    *   themselves also leave the corpus) → quality gate → exact dedup
    *   → near-dup removal → per-lang (n_docs, n_tokens)
    *
    * Scale shape is the stages': the contamination probe is a
    * broadcast semi-join (corpus rows never shuffle for it), the rest
    * is the v1 chain, the rollup is one tiny aggregate. One
    * declarative plan end to end. */
  def decontamCleanStats(docs: DataFrame,
                         benchPred: org.apache.spark.sql.Column,
                         contamThreshold: Double = 0.2): DataFrame = {
    // the cleaning chain references the decontaminated corpus from
    // several branches (quality join, dedup groups, LSH signatures) —
    // without a persist each branch re-runs the whole contamination
    // probe (measured 9.8 s vs ~3 s at sf0.1). The id list is tiny
    // (ids only), so pin IT and let every branch re-scan docs against
    // the cached semi-join side.
    val keptIds = graft.util.Scratch.track(
      Contamination.ngramOverlap(docs, benchPred)
        .where(col("ratio") < contamThreshold).select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val decontam = docs.join(keptIds, Seq("doc_id"), "left_semi")
    val survivors = cleanCorpus(decontam).select("doc_id")
    docs.join(survivors, Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+"))
          .cast("long")).as("n_tokens"))
  }

  /** Pipeline v3 — the round-9 composition: quality gate →
    * CDC span-level dedup REWRITE (duplicated chunks stripped, docs
    * rebuilt — finer than doc-level dedup: boilerplate dies, unique
    * content survives) → leakage-free cluster-granular split → the
    * per-split accounting a training run consumes. Documents whose
    * every chunk already occurred elsewhere vanish entirely (their
    * rewrite is empty). One declarative plan end to end; each stage's
    * scale shape is its operator's (see cdcClean / leakFreeSplit). */
  def cleanSpanSplitStats(docs: DataFrame,
                          maxStopRatio: Double = 0.5,
                          minMeanTokLen: Double = 2.0): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .where(col("stop_ratio") <= maxStopRatio &&
        col("mean_tok_len") >= minMeanTokLen)
    val gated = docs.join(q.select("doc_id"), Seq("doc_id"), "left_semi")
    val rewritten = TextAnalysis.cdcClean(gated)
    val split = Sampling.leakFreeSplit(gated)
    rewritten.join(split.select(col("doc_id"), col("split")), Seq("doc_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks_kept")).as("n_chunks"),
        sum(col("n_tok_clean")).as("n_tokens_clean"))
  }

  /** Pipeline v5 — the round-17 composition, the web-crawl FRONT
    * DOOR: the dedup signals a crawler has before any content-level
    * work, cheapest first:
    *
    *   canonical-URL dedup (min doc_id per canon URL — one groupBy
    *   over a codegen'd projection, no content touched) →
    *   exact-containment dedup (rare-shingle posting contract; the
    *   higher doc_id of each cont ≥ threshold pair drops — the house
    *   pair rule) → quality gate → per-lang (n_docs, n_tokens).
    *
    * One declarative plan; URL dedup costs one shuffle on the canon
    * string, containment is the df-capped inverted-index join, the
    * gate is a narrow scan, the rollup one tiny aggregate. Nothing
    * all-pairs, nothing driver-side. */
  def urlContainCleanStats(docs: DataFrame,
                           url: org.apache.spark.sql.Column,
                           contThresholdMicro: Long = 600000L,
                           maxDf: Long = 24L): DataFrame = {
    val keepU = TextAnalysis.urlDedup(docs, url)
      .select(col("min_doc_id").as("doc_id"))
    // pinned: the URL-kept corpus feeds the containment index, both
    // verify sides AND the final semi-joins
    val d1 = graft.util.Scratch.track(
      docs.join(keepU, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val losers = Dedup.containmentPairs(d1, contThresholdMicro, maxDf)
      .select(col("db").as("doc_id")).distinct()
    val d2 = d1.join(losers, Seq("doc_id"), "left_anti")
    val q = TextAnalysis.quality(d2)
      .where(col("stop_ratio") <= 0.5 && col("mean_tok_len") >= 2.0)
    d2.join(q.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tokens"))
  }

  /** Pipeline v2 — [[cleanCorpus]] composed with the deterministic
    * holdout split and the per-split accounting a training run
    * consumes: (split, n_docs, total_tokens). Still ONE declarative
    * plan; the split is a pure narrow map over the survivors, so the
    * extra cost beyond cleaning is a single tiny aggregate. */
  def cleanSplitStats(docs: DataFrame): DataFrame = {
    val survivors = cleanCorpus(docs).select("doc_id")
    val sd = docs.join(survivors, Seq("doc_id"), "left_semi")
    Sampling.trainValTest(sd).join(sd, Seq("doc_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("total_tokens"))
  }
}
