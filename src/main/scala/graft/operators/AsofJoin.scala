package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join — for each left row, the single
  * latest right row of the same key whose timestamp is `<=` the left
  * timestamp (left-outer: unmatched left rows keep null right columns).
  *
  * The reference engine has no temporal joins (SURVEY §2.3: equi-joins
  * via unification plus `less`/`greater` post-filters only); this is
  * part of the large-scale-pipeline extension surface, the operator an
  * event-stream feature join ("state of X as of event time") needs.
  *
  * Spark-first shape: no range-join or per-key collect. Both sides are
  * tagged and UNIONED, then ONE hash shuffle on the key partitions the
  * timeline and a single window sort runs `last(col, ignoreNulls)` over
  * the unbounded-preceding frame — right values propagate forward to
  * every later left row. Cost: one shuffle + one sort per key group,
  * the same physical work as a windowed aggregate, independent of how
  * many left rows match each right row (a naive range join is
  * quadratic in that fanout). Right rows sort BEFORE left rows at equal
  * timestamps, so `<=` ties resolve to the co-timestamped right row,
  * matching the `ON r.ts <= l.ts` convention of columnar engines'
  * native ASOF joins.
  *
  * `rightTie` makes the pick deterministic when the right side has
  * several rows at one (key, timestamp): the largest tie value wins.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               rightTie: Option[String] = None): DataFrame = {
    val rightSchema = right.schema
    val lCols = left.columns.toSeq
    require(!lCols.exists(rightCols.contains),
      "rightCols must not collide with left columns")

    val tie = rightTie.map(col).getOrElse(lit(0L))
    val l = left
      .withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumns(rightCols.map(c =>
        c -> lit(null).cast(rightSchema(c).dataType)).toMap)
    val r0 = right
      .withColumn("__t", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__tie", tie.cast("long"))
    val r = r0.select(
      (Seq(col("__t"), col("__side"), col("__tie")) ++
        keys.map(col) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled: Seq[(String, Column)] =
      rightCols.map(c => c -> last(col(c), ignoreNulls = true).over(w))
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumns(filled.toMap)
      .where(col("__side") === 1)
      .drop("__t", "__side", "__tie")
  }

  /** Forward as-of join — the mirror: for each left row, the single
    * EARLIEST right row with `r.ts >= l.ts` ("next quote at or after
    * the trade"). Same union + one-shuffle window shape, reflected:
    * left rows sort BEFORE co-timestamped right rows (so `>=` ties
    * match), and `first(ignoreNulls)` runs over the current-row →
    * unbounded-following frame. `rightTie` again picks the largest
    * tie value among right rows sharing a (key, timestamp). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightCols: Seq[String],
              rightTie: Option[String] = None): DataFrame = {
    val rightSchema = right.schema
    val lCols = left.columns.toSeq
    require(!lCols.exists(rightCols.contains),
      "rightCols must not collide with left columns")

    val tie = rightTie.map(col).getOrElse(lit(0L))
    val l = left
      .withColumn("__t", col(leftTs)).withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumns(rightCols.map(c =>
        c -> lit(null).cast(rightSchema(c).dataType)).toMap)
    val r0 = right
      .withColumn("__t", col(rightTs)).withColumn("__side", lit(1))
      .withColumn("__tie", tie.cast("long"))
    val r = r0.select(
      (Seq(col("__t"), col("__side"), col("__tie")) ++
        keys.map(col) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled: Seq[(String, Column)] =
      rightCols.map(c => c -> first(col(c), ignoreNulls = true).over(w))
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumns(filled.toMap)
      .where(col("__side") === 0)
      .drop("__t", "__side", "__tie")
  }
}
