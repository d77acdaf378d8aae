package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-style analytics over the event stream and fact tables —
  * the dimensional-modeling operators (SCD-2 builds, gaps-and-islands,
  * transition matrices, windowed anomaly flags) a pipeline team layers
  * on the same engine that runs the WOQL surface. The reference has no
  * analytics of this kind (`[ref:core/query/woql_compile.pl]` stops at
  * group_by/order_by); these are Spark-first extensions in the spirit
  * of SURVEY §2.5's "free via Window" note.
  *
  * Scale stance, uniform across the file: every window is PARTITIONED
  * by a high-cardinality key (user, nation) — never global — so the
  * sort is per-group and parallel; every aggregate is a plain
  * hash-shuffle groupBy; nothing here collects, self-joins, or
  * cross-joins. At 100 TB each operator is one shuffle on the
  * partition key plus narrow maps.
  */
object Warehouse {

  /** SCD type-2 dimension build: collapse a per-key ordered event log
    * to its state-CHANGE rows, each versioned and carrying a
    * [valid_from, valid_to) interval (valid_to null = current row).
    * One partitioned window, two passes over it (lag to detect the
    * change, lead/row_number over the survivors to close intervals):
    * the classic warehouse merge expressed as two narrow window ops —
    * no self-join, no driver state. */
  def scd2(events: DataFrame, key: String, ts: String, tieBreak: String,
           state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val changes = events
      .withColumn("__prev", lag(col(state), 1).over(w))
      .where(col("__prev").isNull || col(state) =!= col("__prev"))
    val wc = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    changes.select(
      col(key), col(state).as("state"), col(ts).as("valid_from"),
      lead(col(ts), 1).over(wc).as("valid_to"),
      row_number().over(wc).cast("long").as("version"))
  }

  /** Gaps-and-islands: group each key's distinct active periods (hour
    * grain) into maximal consecutive runs via the rank-difference
    * trick (period_index − row_number is constant within a run), then
    * roll up per key: number of islands, longest streak, total active
    * periods. All-integer output — hash-exact across engines. */
  def gapIslands(events: DataFrame, key: String, ts: String): DataFrame = {
    val hours = events
      .select(col(key), (floor(unix_timestamp(date_trunc("hour", col(ts))) / 3600))
        .cast("long").as("hr"))
      .distinct()
    val w = Window.partitionBy(col(key)).orderBy(col("hr"))
    val islands = hours
      .withColumn("grp", col("hr") - row_number().over(w))
      .groupBy(col(key), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col(key))
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("longest"),
        sum(col("len")).as("active_hours"))
  }

  /** First-order transition matrix of a per-key ordered event log:
    * counts of (state → next state) adjacent pairs. The Markov-chain
    * summary behind next-event prediction and session-flow Sankeys.
    * One partitioned window + one groupBy; counts are exact. */
  def transitions(events: DataFrame, key: String, ts: String,
                  tieBreak: String, state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    events
      .withColumn("dst_type", lead(col(state), 1).over(w))
      .where(col("dst_type").isNotNull)
      .groupBy(col(state).as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** 2-D skyline (Pareto frontier): the points not dominated under
    * (minimize x, maximize y). The sweep is one pass over points in
    * (x asc, y desc) order keeping rows whose y exceeds the running
    * max of everything before — but a single global sort is the
    * anti-pattern, so the operator runs LOCAL-THEN-GLOBAL like a
    * partial aggregate: points are hash-bucketed, each bucket's local
    * skyline computed with the same sweep (a dominated point is
    * dominated by a point in SOME bucket… not necessarily its own —
    * local pruning only removes points dominated WITHIN their bucket,
    * which is sound: survivors are a superset of the true skyline),
    * and only survivors reach the one global ordered pass. At 100 TB
    * the global window sees Σ local-skyline sizes, not the data. */
  def skyline2d(df: DataFrame, x: String, y: String,
                buckets: Int = 32): DataFrame = {
    val pts = df.select(col(x).cast("double").as("x"),
      col(y).cast("double").as("y")).distinct()
    def sweep(w: org.apache.spark.sql.expressions.WindowSpec)(d: DataFrame) =
      d.withColumn("__cm",
          max(col("y")).over(w.orderBy(col("x").asc, col("y").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("__cm").isNull || col("y") > col("__cm"))
        .drop("__cm")
    val local = sweep(Window.partitionBy(
      pmod(graft.llm.Dedup.hash32(concat(col("x"), lit(":"), col("y"))),
        lit(buckets.toLong))))(pts)
    sweep(Window.partitionBy())(local)
      .select(col("x"), col("y"))
  }

  /** Per-group z-score anomaly summary: population mean/stddev per
    * group (a tiny aggregate, broadcast back over the scan — never a
    * window over a low-cardinality partition key, which would funnel
    * the whole table through |groups| sort tasks), then count the
    * rows whose |value − μ|/σ ≥ threshold. z is rounded to 6 decimals
    * before the compare so both engines classify identical doubles;
    * the group stats travel as a broadcast join, so the big side
    * stays one narrow scan. */
  def zscoreOutliers(df: DataFrame, group: String, value: String,
                     threshold: Double): DataFrame = {
    val stats = df.groupBy(col(group))
      .agg(avg(col(value)).as("__mu"), stddev_pop(col(value)).as("__sigma"))
    // σ=0 (constant group) guard: x/0 is NULL in Spark but ±inf in
    // IEEE-default engines — define z=0 explicitly so the statistic
    // is engine-independent on degenerate data (no point is an
    // outlier of a constant group)
    val z = when(col("__sigma") === 0, lit(0.0))
      .otherwise(round(abs(col(value) - col("__mu")) / col("__sigma"), 6))
    df.join(broadcast(stats), group)
      .withColumn("__z", z)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__z") >= threshold, 1L).otherwise(0L)).as("n_outliers"),
        max(col("__z")).as("max_z"))
  }

  /** Key-skew profile of a prospective join/aggregation key — the
    * numbers you read BEFORE keying a 100 TB shuffle: the top-k heavy
    * keys (the salting targets for [[SkewJoin]]), each key's share of
    * rows, and the global distribution stats (key count, mean/max
    * group size, max/mean straggler ratio, Shannon entropy in bits vs
    * the log2(n_keys) uniform ceiling).
    *
    * Shape: ONE map-side-combinable groupBy for per-key counts; the
    * global stats are a second aggregate over keys (rows ∝ distinct
    * keys, not data), the heavy list is a top-k (TakeOrdered heap —
    * never a full sort), and both re-attach by broadcast. Entropy uses
    * the identity −Σp·log2 p = log2(total) − Σc·log2(c)/total so it
    * folds into the same single stats pass. */
  /** Exact join-cardinality pre-flight: |A ⋈ B| = Σ_k c_A(k)·c_B(k)
    * computed from the two KEY-COUNT tables — keys-sized work (two
    * map-side-combinable groupBys + one keys-sized join), never the
    * join itself. The companion to [[skewProfile]]: profile tells you
    * a key is heavy on one side; this tells you what the heavy keys
    * MULTIPLY into before you pay for the shuffle. Returns the top-k
    * contributing keys (the salting/bloom targets), each with its
    * share of the estimated output, plus the global numbers
    * (est_rows, matching keys, per-side row/key counts). */
  def joinCardinality(left: DataFrame, leftKey: Column,
                      right: DataFrame, rightKey: Column,
                      topK: Int = 10): DataFrame = {
    val lc = left.groupBy(leftKey.as("key")).agg(count(lit(1)).as("cnt_l"))
    val rc = right.groupBy(rightKey.as("key")).agg(count(lit(1)).as("cnt_r"))
    val contrib = lc.join(rc, Seq("key"))
      .select(col("key"), col("cnt_l"), col("cnt_r"),
        (col("cnt_l") * col("cnt_r")).as("contrib"))
    val stats = contrib.agg(sum(col("contrib")).as("est_rows"),
      count(lit(1)).as("matching_keys"))
    val sides = lc.agg(sum(col("cnt_l")).as("left_rows"),
        count(lit(1)).as("left_keys"))
      .crossJoin(rc.agg(sum(col("cnt_r")).as("right_rows"),
        count(lit(1)).as("right_keys")))
    val top = contrib.orderBy(col("contrib").desc, col("key")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("contrib").desc, col("key"))))
    top.crossJoin(broadcast(stats)).crossJoin(broadcast(sides)).select(
      col("rnk").cast("long").as("rnk"), col("key"), col("cnt_l"),
      col("cnt_r"), col("contrib"),
      round(col("contrib").cast("double") / col("est_rows"), 6).as("share"),
      col("est_rows"), col("matching_keys"),
      col("left_rows"), col("left_keys"),
      col("right_rows"), col("right_keys"))
  }

  /** Exact weighted (lower) median per group: the smallest value
    * whose cumulative weight reaches half the group total — an
    * all-integer 2·cum ≥ total compare, no ratio float to disagree
    * across engines. Duplicate values pre-fold into one (group,
    * value) weight row, so the cumulative order is unique and
    * deterministic; the window then runs over value-distinct rows
    * (keys-sized), never raw data. The exact counterpart to the grid
    * quantile sketch for the moderate-cardinality case. */
  def weightedMedian(df: DataFrame, g: Column, value: Column,
                     weight: Column): DataFrame = {
    val per = df.groupBy(g.as("g"), value.as("v")).agg(sum(weight).as("w"))
    val cumW = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("g"))
    per.withColumn("cum", sum(col("w")).over(cumW))
      .withColumn("tot", sum(col("w")).over(totW))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col("g")).agg(min(col("v")).as("wmedian"))
  }

  def skewProfile(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_sz"),
      sum(col("cnt") * log2(col("cnt"))).as("__slog"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("key"))))
    val mean = col("total") / col("n_keys")
    top.crossJoin(broadcast(stats)).select(
      col("rnk").cast("long").as("rnk"), col("key"), col("cnt"),
      round(col("cnt").cast("double") / col("total"), 6).as("share"),
      col("n_keys"), round(mean, 6).as("mean_sz"), col("max_sz"),
      round(col("max_sz") / mean, 6).as("skew_ratio"),
      round(log2(col("total")) - col("__slog") / col("total"), 6)
        .as("entropy_bits"))
  }
}
