package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.5 hard-part 6: hub
  * entities — `rdf:type` is maximally skewed in any triple store).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the complementary static tool when one relation is modest but too
  * big to broadcast and the probe side hammers a few keys. The big side
  * gets a DETERMINISTIC salt (hash of its other columns — no
  * Math.random, so retries and resumed stages stay consistent); the
  * small side is replicated saltFactor times. Result is exactly the
  * plain equi-join, with the hot key spread over saltFactor reducers. */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, key: String,
             saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val otherCols = big.columns.filterNot(_ == key).map(col)
    val b = big.withColumn("__salt",
      pmod(xxhash64(otherCols: _*), lit(saltFactor.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key frequency above which salting is worth considering —
    * a cheap skew diagnostic for planning (sampled). */
  def skewedKeys(df: DataFrame, key: Column, minShare: Double): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("k")).count()
      .where(col("count") > (minShare * total).toLong)
  }
}
