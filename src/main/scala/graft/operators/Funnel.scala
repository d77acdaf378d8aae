package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed funnel analysis (the `windowFunnel` of the product-
  * analytics engines, e.g. ClickHouse's aggregate of the same name):
  * per user, the deepest prefix of a step sequence (step₁ → step₂ →
  * … → stepₖ) completed in order with the whole chain inside a time
  * window — `stepₗ.ts − step₁.ts ≤ T` (intermediate steps sit between
  * the ends, so only the ends are constrained).
  *
  * Algorithm: one groupBy(user) collects the user's events sorted by
  * (ts, event_id) — per-group input is a user's own event count,
  * bounded — then a LINEAR left fold (functions.aggregate, codegen'd)
  * runs the greedy DP: `startₗ` = the LATEST step₁ timestamp among
  * chains reaching level l strictly earlier in the order. Maximizing
  * the chain's start is optimal for the end-to-end window check, and
  * it is monotone in the scan, so one pass decides every level —
  * O(events·k) per user instead of the k-way self-join's
  * Π |stepₗ-events| blow-up on hot users. That self-join IS the
  * oracle (correct, quadratic, labelled), the classic
  * scalable-plan-vs-naive-oracle pair.
  *
  * Determinism: ties in `ts` are ordered by event_id (both engines
  * sort and chain on the same (ts, event_id) total order); all
  * arithmetic is integer micros. */
object Funnel {

  /** Last-touch attribution: each conversion event is attributed to
    * the LATEST touch event of the same user at-or-before it (in the
    * (ts, id) total order) and within `windowMicros` of it. Because
    * events are time-ordered, the latest preceding touch minimizes the
    * gap, so "latest within window" ⟺ "any within window" — one
    * running-max window per user (group size = the user's events,
    * bounded; no self-join) decides attribution exactly. Output is the
    * per-hour conversion/attribution accounting a marketing pipeline
    * reads. */
  def lastTouchAttribution(events: DataFrame, user: String, ts: String,
                           tieBreak: String, typeCol: String,
                           touch: String, conv: String,
                           windowMicros: Long): DataFrame = {
    val ev = events.select(col(user).as("u"),
      unix_micros(col(ts)).as("t"), col(tieBreak).as("id"),
      col(typeCol).as("ty"), col(ts).as("__ts"))
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLast = ev.withColumn("lt",
      max(when(col("ty") === touch, struct(col("t"), col("id")))).over(w))
    withLast.where(col("ty") === conv)
      .select(date_trunc("hour", col("__ts")).as("h"),
        (col("lt").isNotNull &&
          (col("t") - col("lt.t")) <= windowMicros).as("attr"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_conv"),
        count_if(col("attr")).as("n_attributed"))
  }

  /** Per-level user counts: (level, n_users), level = deepest step
    * reached under the window (0 = none of step₁). */
  def windowFunnel(events: DataFrame, user: String, ts: String,
                   tieBreak: String, typeCol: String,
                   steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8, "1-8 funnel steps")
    val k = steps.size
    // state: array of k+1 longs — [0] = deepest level hit so far,
    // [l] = latest chain start (micros) reaching level l, MinValue = none
    val none = Long.MinValue
    val init = array((lit(0L) +: Seq.fill(k)(lit(none))): _*)
    val ev = events.select(
      col(user).as("u"),
      struct(unix_micros(col(ts)).as("t"), col(tieBreak).as("tb"),
        col(typeCol).as("ty")).as("e"))
    val folded = ev.groupBy(col("u"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .withColumn("lvl", aggregate(
        col("es"), init,
        (st, e) => {
          val t = e.getField("t")
          val ty = e.getField("ty")
          // level 1: a step₁ event always (re)starts a chain at t
          val s1 = when(ty === steps.head, greatest(element_at(st, 2), t))
            .otherwise(element_at(st, 2))
          // levels 2..k: adopt the latest start reaching l-1 BEFORE
          // this event (element_at reads the PRE-update state, so an
          // event can't chain to itself or to same-position updates)
          val ss: Seq[Column] = s1 +: (2 to k).map { l =>
            when(ty === steps(l - 1) && element_at(st, l) =!= none,
              greatest(element_at(st, l + 1), element_at(st, l)))
              .otherwise(element_at(st, l + 1))
          }
          // deepest level whose completing event fits the window
          val hit = (1 to k).map { l =>
            val start = if (l == 1) t else element_at(st, l)
            when(ty === steps(l - 1) && start =!= none &&
              (t - start) <= windowMicros, lit(l.toLong)).otherwise(lit(0L))
          }.reduce(greatest(_, _))
          array((greatest(element_at(st, 1), hit) +: ss): _*)
        },
        st => element_at(st, 1)))
    folded.groupBy(col("lvl").as("level"))
      .agg(count(lit(1)).as("n_users"))
  }
}
