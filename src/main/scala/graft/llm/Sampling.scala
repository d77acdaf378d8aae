package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Sampling at 100 TB must be (a) a pure narrow filter — no shuffle, no
  * state, no RNG seed plumbed through executors — and (b) reproducible
  * and NESTED: re-running with a higher rate must return a superset of
  * the lower-rate sample (so a 1% pilot corpus is contained in the 10%
  * run). Hash-thresholding gives both: u(doc) = first 32 bits of
  * md5(doc_id) as a uniform [0,1) value, keep iff u < rate(stratum).
  */
object Sampling {

  /** u(doc_id) ∈ [0,1): uniform, deterministic, engine-independent
    * (md5 is replayable in the DuckDB oracle bit-for-bit). */
  def hashU(id: Column): Column =
    Dedup.hash32(id.cast(StringType)).cast(DoubleType) / lit(4294967296.0)

  /** Stratified sample: per-stratum keep-rates with a default for
    * unlisted strata. One codegen'd filter over the scan — predicate
    * pushdown-friendly, zero exchanges. */
  /** Greedy k-center coreset (Gonzalez 1985, the classical farthest-
    * point 2-approximation): start from the lowest vec_id, then k−1
    * times pick the point FARTHEST from the chosen set (max over
    * points of min over centers of squared-L2; ties → lowest vec_id).
    * The coreset is the diversity-maximal sample a curation pipeline
    * seeds dedup thresholds / eval picks / active-learning batches
    * from — complementary to [[graft.llm.Clustering]]'s
    * cluster-balanced `diverseSample`.
    *
    * Exact math: distances are squared-L2 over sq8 INTEGER codes —
    * sums of integer squares ≤ 4·dim·255², exactly representable
    * doubles, so argmax/ties replay bit-identically in SQL. Scale
    * shape: k−1 rounds of ONE narrow min-distance projection + one
    * TakeOrdered(1) each (no shuffle beyond the top-1 reduce); the
    * chosen set is a k-bounded driver artifact like a codebook.
    * Returns (rank, vec_id, dist) — dist is the max-min distance at
    * selection time (0 for the seed), the standard k-center radius
    * trace. */
  def kCenterCoreset(emb: DataFrame, k: Int, dim: Int): DataFrame = {
    require(k >= 1 && dim >= 1)
    val spark = emb.sparkSession
    // persist the quantized frame ONCE: each of the k farthest-point
    // rounds scans it, and without the pin every round would re-derive
    // the sq8 codes from the raw embeddings (k× the quantization work)
    val q = graft.util.Scratch.track(Clustering.codes(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val first = q.orderBy(col("vec_id")).limit(1).collect().head
    var centers = IndexedSeq(
      (first.getLong(0), first.getSeq[Double](1).toIndexedSeq))
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, first.getLong(0), 0.0))
    for (r <- 2 to k) {
      val md = array_min(
        Clustering.distArray(col("qv"), centers.map(_._2)))
      val next = q.withColumn("__md", md)
        .orderBy(col("__md").desc, col("vec_id")).limit(1).collect().head
      centers :+= ((next.getLong(0), next.getSeq[Double](1).toIndexedSeq))
      picks += ((r.toLong, next.getLong(0), next.getDouble(2)))
    }
    import spark.implicits._
    picks.toSeq.toDF("rank", "vec_id", "dist")
  }

  def stratifiedHash(docs: DataFrame, strata: Column,
                     rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(strata === lit(k), lit(r)).otherwise(acc)
    }
    docs.where(hashU(col("doc_id")) < rate)
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    * each doc gets key = ln(u)/w (the log form of u^(1/w) — numerically
    * stable for large weights); the k largest keys ARE a weighted
    * sample without replacement. Deterministic u from [[hashU]]; the
    * key is rounded so both engines order identical values (a raw
    * ln() can differ in the last ulp across libm implementations), with
    * doc_id as the total-order tie-break.
    *
    * Scale shape: `orderBy(key).limit(k)` plans as
    * TakeOrderedAndProject — per-partition top-k heaps then a k-row
    * merge, never a global sort shuffle. One scan, no exchange. */
  def weightedTopK(docs: DataFrame, weight: Column, k: Int): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        weight.cast(DoubleType).as("w"),
        round(log(hashU(col("doc_id"))) / weight, 9).as("skey"))
      .orderBy(col("skey").desc, col("doc_id")).limit(k)

  /** Deterministic hash-sharding manifest for training export:
    * shard(doc) = hash32(doc_id) mod `shards` — a pure narrow map (no
    * global sort, no coordination), so a 100 TB export is one
    * partitioned write where every reader finds its shard by the same
    * formula. Balance is statistical (shard sizes concentrate at
    * N/shards by independence of the hash), which is what production
    * exporters rely on; the manifest this returns (doc/token totals +
    * id range per shard) is how a trainer plans its readers and how an
    * operator audits the spread. */
  def shardManifest(docs: DataFrame, shards: Int): DataFrame =
    docs.select(col("doc_id"),
        pmod(Dedup.hash32(col("doc_id").cast(StringType)),
          lit(shards.toLong)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))

  /** Deterministic train/val/test split: bucket = hash32("split:"‖id)
    * mod 100, then threshold. A pure narrow map — no shuffle, no RNG,
    * no global sort — so the SAME document lands in the SAME split on
    * every run, on every engine, at every corpus size (adding documents
    * never reassigns existing ones, the property holdout sets need).
    * The salt decorrelates the split from every other hash-derived
    * decision ([[stratifiedHash]] keep/drop, shard id, …). */
  def trainValTest(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val bucket = pmod(Dedup.hash32(
      concat(lit("split:"), col("doc_id").cast(StringType))), lit(100L))
    docs.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Leakage-free train/val/test split: assign whole NEAR-DUP CLUSTERS
    * to a split, not documents — a plain per-doc hash split puts one
    * copy of a near-duplicate pair in train and the other in test,
    * leaking training content into evaluation (the split-contamination
    * failure mode; cf. the decontamination literature around Lee et
    * al. 2022). Cluster id = min doc_id reachable through the verified
    * MinHash near-dup relation (Dedup.nearDupClusters), so every
    * member hashes to the SAME bucket and no near-dup edge can cross
    * splits. Salted independently of the per-doc split so the two are
    * uncorrelated. Cost beyond clustering: one codegen'd projection. */
  def leakFreeSplit(docs: DataFrame, threshold: Double = 0.5,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val clusters = Dedup.nearDupClusters(docs, threshold)
    val bucket = pmod(Dedup.hash32(
      concat(lit("csplit:"), col("cluster").cast(StringType))), lit(100L))
    clusters.select(col("doc_id"), col("cluster"), bucket.as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Domain mixing to per-source token caps: measure each source's
    * token supply, derive keep-rate = min(1, cap ÷ supply), then
    * hash-threshold docs at that rate (salted independently of every
    * other sampling decision). Two passes over the corpus — one
    * map-side-combined aggregate to learn supplies (tiny result: one
    * row per source), one filtered scan — which is the minimum for an
    * EXACT budget; the rates frame is broadcast back, so nothing big
    * shuffles. Returns the post-mix per-source audit row (supply,
    * rate, selected docs/tokens), the artifact a data-mixing run is
    * judged by. */
  def mixToBudget(docs: DataFrame, caps: Map[String, Long],
                  defaultCap: Long): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
    val cap = caps.foldLeft(lit(defaultCap.toDouble)) { case (acc, (k, c)) =>
      when(col("source") === lit(k), lit(c.toDouble)).otherwise(acc)
    }
    val rates = toks.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("rate", least(lit(1.0), cap / col("src_tokens")))
    toks.join(broadcast(rates), Seq("source"))
      .where(hashU(concat(lit("mix:"), col("doc_id").cast(StringType))) < col("rate"))
      .groupBy(col("source"))
      .agg(first(col("src_tokens")).as("src_tokens"),
        round(first(col("rate")), 9).as("rate"),
        count(lit(1)).as("n_sel"), sum(col("n_tokens")).as("sel_tokens"))
  }

  /** Temperature (α-power) rebalanced sampling — the multilingual
    * training-mix recipe (XLM-R/mBERT exponential smoothing): language
    * l's share of a `budgetTokens` budget is supplyₗ^α / Σ supply^α,
    * so low-resource languages are up-weighted (α < 1) relative to
    * their raw share; keep-rate = min(1, targetₗ / supplyₗ), docs
    * selected by salted hash-threshold (same determinism/nesting
    * contract as [[stratifiedHash]]).
    *
    * Scale shape mirrors [[mixToBudget]]: one map-side-combined
    * aggregate for supplies (rows ∝ languages), the Σ supply^α
    * denominator folded over the LANG-SORTED supply list (exact
    * association order — engine-stable doubles, oracle-replayable),
    * rates broadcast back over one filtered scan. Returns the
    * per-language audit row (supply, rate, selected docs/tokens). */
  def temperatureSample(docs: DataFrame, alpha: Double,
                        budgetTokens: Long): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
    val sup = toks.groupBy(col("lang")).agg(sum(col("n_tokens")).as("supply"))
    val denom = sup.agg(aggregate(
      transform(array_sort(collect_list(struct(col("lang"), col("supply")))),
        s => pow(s.getField("supply").cast(DoubleType), lit(alpha))),
      lit(0.0), (a, x) => a + x).as("denom"))
    val rates = sup.crossJoin(broadcast(denom))
      .select(col("lang"), col("supply"),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) *
            (pow(col("supply").cast(DoubleType), lit(alpha)) / col("denom")) /
            col("supply")), 9).as("rate"))
    toks.join(broadcast(rates), Seq("lang"))
      .where(hashU(concat(lit("temp:"), col("doc_id").cast(StringType))) < col("rate"))
      .groupBy(col("lang"))
      .agg(first(col("supply")).as("supply"), first(col("rate")).as("rate"),
        count(lit(1)).as("n_sel"), sum(col("n_tokens")).as("sel_tokens"))
  }

  /** Per-source frequency cap (the RefinedWeb/C4 "no domain may
    * dominate the corpus" rule): keep at most `cap` documents per
    * source, preferring the longest (n_chars desc, doc_id asc as the
    * total-order tie-break), and return the per-source audit row —
    * kept/dropped counts and the token mass each way.
    *
    * Scale shape: one window partitioned by source (parallel across
    * sources; a pathological mega-source is one sorted partition —
    * the same skew profile every per-domain rule has, and the sort
    * key is 12 bytes/row) followed by one aggregate. No self-join,
    * nothing quadratic. */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"),
        col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= cap, col("n_tokens")).otherwise(0L)).as("kept_tokens"),
        sum(when(col("rk") > cap, col("n_tokens")).otherwise(0L)).as("dropped_tokens"))
  }

  /** Sequence-length bucket histogram for padded-batch planning:
    * bucket = ⌊tokens/width⌋ (capped into a last open bucket), waste =
    * bucket ceiling − tokens (the pad cost if batches are formed per
    * bucket at its ceiling). All-integer — the batch planner reads
    * exact token/waste mass per bucket, and the same histogram is how
    * a packing run (llm/Packing.scala) is sized. One narrow map + one
    * tiny aggregate; nothing shuffles but the ≤`maxBucket`+1 rows. */
  def lengthBuckets(docs: DataFrame, width: Int, maxBucket: Int): DataFrame = {
    val n = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val b = least(floor(n / width), lit(maxBucket.toLong)).cast(LongType)
    docs.select(n.as("n_tok"), b.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
        sum(when(col("bucket") < maxBucket,
            (col("bucket") + 1) * width - col("n_tok"))
          .otherwise(0L)).as("pad_waste"))
  }
}
