package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the offline counterpart of the streaming
  * session windows in `streaming/Events.scala` (same gap semantics,
  * applied to a bounded table).
  *
  * Classic two-window formulation: a session BREAK is a row whose gap
  * to the previous event of the same key exceeds `gapMicros` (lag
  * window), and the session id is the running count of breaks
  * (cumulative-sum window). Both windows share ONE partitioning
  * (key) and ordering (ts, id) — Catalyst plans them as a single
  * sort + Window stage: exactly one shuffle on the session key, then
  * linear per-partition work. Sessions are per-key, so a 100 TB event
  * log parallelizes across keys; a single hot key is bounded by that
  * key's own event count, not the table.
  *
  * Gap arithmetic runs on epoch MICROSECONDS (exact BIGINTs — no
  * float time math, replays bit-for-bit in the oracle); the tie on
  * equal timestamps is broken by `idCol` for a total order.
  */
object Sessionize {

  /** Per-session rollup: (key, session id, n_events, start_ts, dur_us). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val gap = us - lag(us, 1).over(w)
    val brk = when(gap.isNull || gap > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("sid",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        (max(us) - min(us)).as("dur_us"))
  }
}
