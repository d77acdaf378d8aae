package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable cardinality sketches for corpus accounting.
  *
  * KMV (k minimum values): hash every value into [0,1), keep the k
  * smallest distinct hashes per group; the kth value u₍ₖ₎ estimates
  * distinct-count as (k−1)/u₍ₖ₎ (Bar-Yossef et al.; the θ-sketch
  * family's base estimator). Unlike HyperLogLog registers, a KMV
  * sketch built on a DETERMINISTIC hash (md5, no seed state) is
  * bit-reproducible across engines AND trivially mergeable — union =
  * merge the min-sets and re-truncate to k — which is why it fits a
  * 100 TB pipeline: per-partition sketches are k doubles, merged in
  * one tiny shuffle, and the oracle can replay the estimate exactly.
  * Groups with fewer than k distinct hashes report their exact count
  * (the sketch IS the full value set there).
  *
  * Plan shape: project hash → distinct (one shuffle, map-side
  * partial) → per-group window top-k over ≤ k·groups rows. The big
  * table is touched once, narrowly.
  */
object Sketches {

  /** Global distinct estimate via the MERGE path: build the per-group
    * k-min sketches, union them, re-truncate to k, estimate. Exactly
    * equal to sketching the whole table at once (every global k-min
    * hash survives its own group's cut), but this is the shape a
    * distributed rollup runs: partial sketches of k doubles per
    * group/partition, merged on one tiny single-partition window (≤
    * k·groups rows — the global window is NOT a scale hazard because
    * only sketch rows reach it). */
  def kmvUnionEstimate(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val h = df.select(group.as("g"),
      Sampling.hashU(value.cast(StringType)).as("u")).distinct()
    val merged = kMinsPerGroup(h, k)
      .select(col("u")).distinct() // same value in two sketches counts once
    val w = Window.orderBy(col("u"))
    merged.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .agg(count(lit(1)).as("nd"),
        max(when(col("rn") === k, col("u"))).as("uk"))
      .select(when(col("nd") < k, col("nd").cast(DoubleType))
        .otherwise(round(lit((k - 1).toDouble) / col("uk"), 6)).as("est_distinct"))
  }

  /** Bounded per-group k-min selection — two-phase so no task ever
    * sorts more than its bucket: phase 1 takes the k smallest per
    * (group, hash-bucket) — every GLOBAL k-min survives its own
    * bucket's cut, so phase 2's per-group window runs over ≤ k·buckets
    * rows instead of every distinct value of a 100 TB group. The
    * bucketing hash never reaches the result (identical k-min set with
    * or without it), so the oracle stays the direct global selection. */
  private def kMinsPerGroup(h: DataFrame, k: Int, buckets: Int = 32): DataFrame = {
    val wb = Window.partitionBy(col("g"), col("__b")).orderBy(col("u"))
    val local = h.withColumn("__b", pmod(xxhash64(col("u")), lit(buckets.toLong)))
      .withColumn("__rn", row_number().over(wb)).where(col("__rn") <= k)
      .drop("__b", "__rn")
    val w = Window.partitionBy(col("g")).orderBy(col("u"))
    local.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Per-group distinct-count estimate of `value`: (g, est_distinct). */
  def kmvDistinct(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val h = df.select(group.as("g"),
      Sampling.hashU(value.cast(StringType)).as("u")).distinct()
    kMinsPerGroup(h, k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("nd"),
        max(when(col("rn") === k, col("u"))).as("uk"))
      .select(col("g"),
        when(col("nd") < k, col("nd").cast(DoubleType))
          .otherwise(round(lit((k - 1).toDouble) / col("uk"), 6)).as("est_distinct"))
  }

  /** Theta-style KMV INTERSECTION between two groups' value sets —
    * the set-operation the plain union estimator can't answer (shared
    * vocabulary, audience overlap, common n-grams). Build each
    * group's k-min sketch, take θ = min of the two kth-min hashes
    * (1.0 for a group whose full set fits in the sketch), retain each
    * sketch's hashes < θ: every retained hash is a uniform sample of
    * its set at rate θ, so |A'∩B'|/θ estimates |A∩B| and
    * |A'∩B'|/|A'∪B'| estimates Jaccard (Dasgupta et al., theta
    * sketches). Deterministic md5 hashing keeps it bit-reproducible
    * across engines.
    *
    * Scale shape: the big table is scanned once per the narrow
    * distinct; everything after operates on ≤ 2k sketch rows — the
    * single-partition steps never see data-sized input. */
  /** Shared two-set retained-sample frame: below the common theta every
    * retained hash is a uniform sample of A ∪ B, with per-hash set
    * membership aggregated to (theta, n_ret_a, n_ret_b, n_common,
    * n_union). Both the intersection and difference estimators are one
    * projection over this. */
  private def kmvRetained(df: DataFrame, group: Column, value: Column,
                          k: Int, a: String, b: String): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val h = df.select(group.as("g"),
        Sampling.hashU(value.cast(StringType)).as("u"))
      .where(col("g").isin(a, b)).distinct()
    val sk = kMinsPerGroup(h, k)
    val theta = sk.groupBy(col("g"))
      .agg(count(lit(1)).as("nd"), max(when(col("rn") === k, col("u"))).as("uk"))
      .agg(min(when(col("nd") < k, lit(1.0)).otherwise(col("uk"))).as("theta"))
    val ret = sk.crossJoin(broadcast(theta)).where(col("u") < col("theta"))
    ret.groupBy(col("u"), col("theta"))
      .agg(max(col("g") === a).as("ia"), max(col("g") === b).as("ib"))
      .groupBy(col("theta"))
      .agg(sum(when(col("ia"), 1L).otherwise(0L)).as("n_ret_a"),
        sum(when(col("ib"), 1L).otherwise(0L)).as("n_ret_b"),
        sum(when(col("ia") && col("ib"), 1L).otherwise(0L)).as("n_common"),
        count(lit(1)).as("n_union"))
  }

  def kmvIntersect(df: DataFrame, group: Column, value: Column, k: Int,
                   a: String, b: String): DataFrame =
    kmvRetained(df, group, value, k, a, b)
      .select(col("n_ret_a"), col("n_ret_b"), col("n_common"),
        round(col("n_common") / col("theta"), 6).as("est_intersect"),
        round(col("n_common").cast(DoubleType) / col("n_union"), 6).as("est_jaccard"))

  /** Theta-style KMV set DIFFERENCE (A \ B and B \ A) — completes the
    * sketch set algebra next to [[kmvUnion]] and [[kmvIntersect]]:
    * |A\B| ≈ (ret_a − common)/θ, the standard theta-sketch a-not-b.
    * Identical scale shape: one narrow distinct over the big table,
    * then ≤ 2k sketch rows. */
  def kmvDifference(df: DataFrame, group: Column, value: Column, k: Int,
                    a: String, b: String): DataFrame =
    kmvRetained(df, group, value, k, a, b)
      .select(col("n_ret_a"), col("n_ret_b"), col("n_common"),
        round((col("n_ret_a") - col("n_common")) / col("theta"), 6)
          .as("est_diff_ab"),
        round((col("n_ret_b") - col("n_common")) / col("theta"), 6)
          .as("est_diff_ba"))

  /** HyperLogLog distinct estimate (Flajolet 2007) with DETERMINISTIC
    * md5 registers — unlike `approx_count_distinct` (whose xxhash +
    * implementation detail make it engine-private), every piece here
    * is oracle-replayable: bucket = top 6 hash bits, rank = leading
    * zeros of the remaining 26 + 1 computed EXACTLY via the binary
    * string length (no float log), register = max rank per bucket.
    * The 2^-register sum is a sum of exact binary fractions spanning
    * ≤ 33 bits of precision — bit-exact in a double regardless of
    * order — so the only cross-engine float op is the final division
    * (identical operands) and the small-range ln correction (rounded).
    * Registers are max-mergeable: the per-group build is one groupBy,
    * rollups/streams merge by cell-wise max, the sketch is m bytes.
    * Complements KMV: m fixed bytes vs k hashes, one-sided rank loss
    * vs exact-below-k. */
  def hllDistinct(df: DataFrame, group: Column, value: Column): DataFrame =
    hllEstimate(hllRegisters(df, group, value), Seq("g"))

  /** HLL register table (g, b, reg) — the mergeable artifact behind
    * [[hllDistinct]]: union = cell-wise max, estimate read-out below. */
  private[graft] def hllRegisters(df: DataFrame, group: Column,
                                  value: Column): DataFrame = {
    val hv = Dedup.hash32(value.cast(StringType))
    val bucket = floor(hv / lit(67108864L)).cast(LongType)
    val rest = pmod(hv, lit(67108864L))
    val rank = when(rest === 0, lit(27L))
      .otherwise(lit(27L) - length(bin(rest)))
    df.select(group.as("g"), bucket.as("b"), rank.as("r"))
      .groupBy(col("g"), col("b")).agg(max(col("r")).as("reg"))
  }

  /** Estimate read-out from a register table keyed by `keys`. */
  private[graft] def hllEstimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val m = 64
    val grouped = if (keys.isEmpty) regs.groupBy() else regs.groupBy(keys.map(col): _*)
    grouped
      .agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), -col("reg"))).as("sp"))
      .select(keys.map(col) :+ {
        val z = lit(m.toDouble) - col("present")
        val raw = lit(0.709 * m * m) / (col("sp") + z)
        when(raw < lit(2.5 * m) && z > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / z), 6))
          .otherwise(round(raw, 6)).as("est_distinct")
      }: _*)
  }

  /** Global distinct via the MERGE path: per-group register tables
    * merged by cell-wise max, then one read-out — bit-equal to
    * sketching the whole table at once (max of maxes), which is the
    * rollup/shard-union shape a 100 TB pipeline runs: registers are
    * m longs per shard, merged in one tiny aggregate. */
  def hllUnionEstimate(df: DataFrame, group: Column, value: Column): DataFrame =
    hllEstimate(
      hllRegisters(df, group, value)
        .groupBy(col("b")).agg(max(col("reg")).as("reg")),
      Seq.empty)

  /** Fixed-grid histogram quantiles — the scalable percentile pattern:
    * quantize values to an integer grid (centi-units here), build a
    * per-group histogram (ONE groupBy whose cardinality is the grid
    * resolution, independent of row count), then read each quantile
    * as the smallest grid cell whose cumulative count reaches
    * ⌈q·n⌉. The cumulative window partitions by group over
    * grid-sized inputs — bounded at any data scale, unlike a global
    * sort — and histograms are trivially mergeable (cell-wise add),
    * so this is also the rollup/streaming shape. All arithmetic is
    * integer (⌈q·n⌉ = (n·q₁₀₀ + 99) div 100), so both engines agree
    * bit-for-bit; precision is ± one grid cell by construction. */
  def gridQuantiles(df: DataFrame, group: Column, value: Column,
                    qs: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 100))
    val hist = df.select(group.as("g"),
        floor(value * 100).cast(LongType).as("cell"))
      .groupBy(col("g"), col("cell")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
    val aggs = qs.map(q =>
      min(when(col("cum") >= expr(s"(n * $q + 99) div 100"), col("cell")))
        .as(s"p${q}_c"))
    cum.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
  }

  /** Count-min sketch (Cormode/Muthukrishnan 2005): d hash rows × w
    * buckets of ADDITIVE counters — frequency estimates with one-sided
    * error (est ≥ exact, over by ≤ εN w.h.p., ε = e/w). Built here by
    * the distributed ROLLUP path: per-`group` cell counts summed into
    * the global sketch — CMS merges by cell-wise addition, so the
    * rollup is bit-equal to sketching the table at once, and at 100 TB
    * the only thing crossing the wire is d·w longs per group/partition
    * (map-side partial combine does most of it).
    *
    * The salted hash is the engine's portable hash32 over "i:value",
    * so the oracle replays every cell exactly. `estimates` returns the
    * per-term min over the d cells next to the EXACT count (the
    * fixture's ground truth, exposing the one-sided error); the
    * sketch path alone — build + probe against d·w broadcast cells —
    * is the piece that scales. */
  def cmsTopK(df: DataFrame, group: Column, value: Column,
              d: Int = 4, w: Int = 256, k: Int = 20): DataFrame = {
    def buckets(term: Column): Column = array((0 until d).map(i =>
      pmod(Dedup.hash32(concat(lit(s"$i:"), term)), lit(w.toLong))): _*)
    val terms = df.select(group.as("g"), value.as("term"))
    val perGroup = terms
      .select(col("g"), posexplode(buckets(col("term"))).as(Seq("row", "bucket")))
      .groupBy(col("g"), col("row"), col("bucket")).agg(count(lit(1)).as("c"))
    val cells = perGroup.groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("cnt")) // merge = cell-wise add
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("exact"))
    val probes = exact.select(col("term"), col("exact"),
      posexplode(buckets(col("term"))).as(Seq("row", "bucket")))
    probes.join(broadcast(cells), Seq("row", "bucket"))
      .groupBy(col("term"), col("exact")).agg(min(col("cnt")).as("est"))
      .orderBy(col("est").desc, col("term")).limit(k)
      .select(col("term"), col("exact"), col("est"))
  }
}
