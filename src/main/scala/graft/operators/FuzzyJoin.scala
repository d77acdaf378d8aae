package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Blocked fuzzy string matching — the dirty-dimension repair join
  * (misspelled country/brand/vendor names → canonical values). The
  * naive form is an all-pairs similarity scan; this one generates
  * candidates with CHARACTER-BIGRAM BLOCKING: a pair is scored only
  * if it shares at least one distinct bigram, found by an equi-join
  * on the exploded bigram — candidates ∝ bigram collisions, never
  * |L|×|R|. (Any pair with Dice ≥ θ > 0 shares a bigram by
  * definition, so blocking loses nothing above the threshold: the
  * candidate set is a strict superset of the answer.) Scoring is the
  * engine's codegen'd Dice; best match per left value by (sim desc,
  * right asc) — deterministic. The same shape scales to 100 TB dirty
  * feeds: the blocking join shuffles (value, bigram) pairs, the
  * rank window partitions by left value. */
object FuzzyJoin {

  def bestMatch(left: DataFrame, leftCol: String,
                right: DataFrame, rightCol: String,
                minSim: Double): DataFrame = {
    val lb = left.select(col(leftCol).as("__l")).distinct()
      .select(col("__l"),
        explode(array_distinct(GraftFunctions.bigrams(col("__l")))).as("__bg"))
    val rb = right.select(col(rightCol).as("__r")).distinct()
      .select(col("__r"),
        explode(array_distinct(GraftFunctions.bigrams(col("__r")))).as("__bg"))
    val cands = lb.join(rb, "__bg").select(col("__l"), col("__r")).distinct()
    val scored = cands
      .withColumn("__sim",
        round(GraftFunctions.dice_similarity(col("__l"), col("__r")), 6))
      .where(col("__sim") >= minSim)
    val w = Window.partitionBy(col("__l"))
      .orderBy(col("__sim").desc, col("__r"))
    scored.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
      .select(col("__l").as(leftCol), col("__r").as("matched"),
        col("__sim").as("sim"))
  }
}
