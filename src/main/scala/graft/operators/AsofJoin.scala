package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

    // right payload travels as ONE nullable struct: the window fill
    // (`last(__r, ignoreNulls)`) then takes every right column from the
    // SAME matched row — per-column fills could mix columns across
    // right rows whenever a nearer row carries a null in one column
    val rStruct = StructType(rightCols.map(c => rightSchema(c)))
    val tie = rightTie.map(col).getOrElse(lit(0L))
    val l = left
      .withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(rStruct))
    val r0 = right
      .withColumn("__t", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__tie", tie.cast("long"))
      .withColumn("__r", struct(rightCols.map(col): _*))
    val r = r0.select(
      (Seq(col("__t"), col("__side"), col("__tie"), col("__r")) ++
        keys.map(col) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumns(rightCols.map(c => c -> col("__r").getField(c)).toMap)
      .drop("__t", "__side", "__tie", "__r")
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

    // single-struct payload for the same one-row guarantee as backward()
    val rStruct = StructType(rightCols.map(c => rightSchema(c)))
    val tie = rightTie.map(col).getOrElse(lit(0L))
    val l = left
      .withColumn("__t", col(leftTs)).withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(rStruct))
    val r0 = right
      .withColumn("__t", col(rightTs)).withColumn("__side", lit(1))
      .withColumn("__tie", tie.cast("long"))
      .withColumn("__r", struct(rightCols.map(col): _*))
    val r = r0.select(
      (Seq(col("__t"), col("__side"), col("__tie"), col("__r")) ++
        keys.map(col) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .withColumns(rightCols.map(c => c -> col("__r").getField(c)).toMap)
      .drop("__t", "__side", "__tie", "__r")
  }
}
