package graft.operators

import org.apache.spark.sql.DataFrame
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

  def binned(points: DataFrame, pTs: String,
             intervals: DataFrame, iStart: String, iEnd: String,
             binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points/intervals column names must not collide (rename before joining)")
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pTs)) / binMicros))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(unix_micros(col(iStart)) / binMicros),
      floor(unix_micros(col(iEnd)) / binMicros))))
    p.join(i, Seq("__bin"))
      .where(col(pTs) >= col(iStart) && col(pTs) <= col(iEnd))
      .drop("__bin")
  }
}
