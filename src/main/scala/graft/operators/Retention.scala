package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the product-analytics companion of
  * [[Funnel]]: bucket every user into the period of their FIRST event
  * (the cohort), then count how many are active again exactly k
  * periods later, per cohort and per requested k.
  *
  * Shape: first-event per user (one groupBy(user), map-side partial
  * min), the user's distinct active periods (groupBy(user, period) —
  * rows ∝ distinct user-periods, far below raw events), one join on
  * user (AQE: broadcast while the user dimension fits, shuffle-hash
  * when a 10⁹-user table doesn't), a per-(user, cohort) flag
  * aggregate, then the tiny per-cohort rollup. Nothing is ever
  * quadratic; no window functions at all, so nothing sorts whole
  * partitions. Period granularity is the caller's `unit`
  * (date_trunc), hours here so every testdata scale populates
  * multiple cohorts. */
object Retention {

  /** (cohort, n_users, ret_<k>...) — ret_k = users of the cohort with
    * ≥1 event in EXACTLY the period cohort+k·unit. */
  def cohortRetention(events: DataFrame, user: String, ts: String,
                      unit: String, offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0))
    val period = date_trunc(unit, col(ts))
    val first = events.groupBy(col(user).as("u"))
      .agg(date_trunc(unit, min(col(ts))).as("cohort"))
    val active = events.select(col(user).as("u"), period.as("p")).distinct()
    val flags = offsets.map(k =>
      max(when(col("p") === col("cohort") + expr(s"INTERVAL $k ${unit.toUpperCase}"),
        1L).otherwise(0L)).as(s"f_$k"))
    val flagged = active.join(first, Seq("u"))
      .groupBy(col("u"), col("cohort"))
      .agg(flags.head, flags.tail: _*)
    flagged.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"),
        offsets.map(k => sum(col(s"f_$k")).as(s"ret_$k")): _*)
  }
}
