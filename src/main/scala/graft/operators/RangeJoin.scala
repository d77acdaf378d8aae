package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval (range) join — points matched to the intervals that
  * contain them, with NO equi-key.
  *
  * The reference engine can only express this as `less`/`greater`
  * post-filters over a cross product (SURVEY §2.3); Spark's planner
  * does the same thing — a pure range predicate plans as
  * BroadcastNestedLoopJoin, O(|points|·|intervals|) comparisons. The
  * standard scalable rewrite (the bin/bucket range join of Databricks'
  * range-join hint and the interval-join literature): quantize time
  * into fixed-width bins, explode each interval into the bins it
  * covers, equi-join on the bin id, then apply the exact containment
  * predicate. One shuffle on bin id; work ∝ points + interval spans ÷
  * `binMicros` + true matches — never the cross product. A point lands
  * in exactly one bin, so no post-join dedup is needed.
  *
  * `binMicros` trades duplication of the interval side (span ÷ width
  * rows) against join selectivity (bin population); set it near the
  * median interval span. Long/skewed bins compose with
  * [[SkewJoin.salted]] on the exploded frame if one bin dominates.
  */
object RangeJoin {

  /** Bin fan-out sanity bound: one interval exploding into more rows
    * than this indicates a mis-sized `binMicros` (or corrupt data) and
    * raises, rather than silently generating unbounded rows. */
  private val maxBinsPerInterval: Long =
    sys.env.getOrElse("GRAFT_RANGE_MAX_BINS", "1000000").toLong

  /** Floor division on integral columns without a double round-trip —
    * `floor(col / b)` on doubles degrades for |values| near 2^53,
    * epoch-micros territory is only ~2^50 away from that cliff. The
    * numerator is made exactly divisible (subtract the non-negative
    * pmod), then divided in DECIMAL arithmetic, which is exact over
    * the full long range. */
  private def floorDiv(c: Column, b: Long): Column =
    ((c - pmod(c, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Exploded bin range of an interval, guarded: raises per-row when
    * end < start (Spark's `sequence` would silently emit a DESCENDING
    * bin list) or when the fan-out exceeds [[maxBinsPerInterval]]. */
  private def binSeq(startBin: Column, endBin: Column): Column = {
    val bad = startBin > endBin
    val huge = endBin - startBin >= maxBinsPerInterval
    when(bad, raise_error(lit("RangeJoin: interval end < start")))
      .when(huge, raise_error(lit(
        s"RangeJoin: interval spans >= $maxBinsPerInterval bins - " +
          "raise binMicros (or GRAFT_RANGE_MAX_BINS)")))
      .otherwise(sequence(startBin, endBin))
  }

  def binned(points: DataFrame, pTs: String,
             intervals: DataFrame, iStart: String, iEnd: String,
             binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points/intervals column names must not collide (rename before joining)")
    val p = points.withColumn("__bin",
      floorDiv(unix_micros(col(pTs)), binMicros))
    val i = intervals.withColumn("__bin", explode(binSeq(
      floorDiv(unix_micros(col(iStart)), binMicros),
      floorDiv(unix_micros(col(iEnd)), binMicros))))
    p.join(i, Seq("__bin"))
      .where(col(pTs) >= col(iStart) && col(pTs) <= col(iEnd))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join, binned — the general case of
    * [[binned]] where BOTH sides are ranges (`a.start ≤ b.end AND
    * b.start ≤ a.end`). Both sides explode into the bins they cover
    * and equi-join on bin id; a pair that overlaps shares every bin
    * between the later start and the earlier end, so it would match
    * once per common bin. Rather than a `distinct` (a second shuffle
    * over the full match set), each pair is emitted EXACTLY once by
    * the ownership rule: keep the match only in the canonical common
    * bin `max(bin(a.start), bin(b.start))` — the first bin both
    * intervals inhabit, which exists iff they overlap. Work ∝ spans ÷
    * `binMicros` + true matches; one shuffle; no dedup pass.
    *
    * Start/end columns name epoch-microsecond BIGINT columns (callers
    * convert timestamps first — keeps the bin math exact and
    * engine-portable); the two sides' column names must be disjoint. */
  def overlapBinned(left: DataFrame, lsCol: String, leCol: String,
                    right: DataFrame, rsCol: String, reCol: String,
                    binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must not collide (rename before joining)")
    val l = left.withColumn("__bin", explode(binSeq(
      floorDiv(col(lsCol), binMicros), floorDiv(col(leCol), binMicros))))
    val r = right.withColumn("__binr", explode(binSeq(
      floorDiv(col(rsCol), binMicros), floorDiv(col(reCol), binMicros))))
    l.join(r, col("__bin") === col("__binr"))
      .where(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol) &&
        col("__bin") === greatest(floorDiv(col(lsCol), binMicros),
          floorDiv(col(rsCol), binMicros)))
      .drop("__bin", "__binr")
  }
}
