package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning — the companion lever to [[Bucketing]] at 100 TB. A table
  * range-sorted on ONE key prunes predicates on that key only; writing
  * it sorted by the bit-interleave of TWO keys clusters both
  * dimensions at once, so parquet row-group min/max stats skip data
  * for a predicate on EITHER (or both) — the same layout trick Delta
  * Lake's OPTIMIZE ZORDER applies, expressed here with nothing but
  * codegen'd Catalyst bit arithmetic (shift/and/or — no UDF, no
  * driver-side loop; the only driver-visible values are the four
  * min/max bounds from one parallel aggregate).
  *
  * Cluster guidance: pick `numFiles` so each file is a few hundred MB
  * (row-group stats are the pruning unit); re-run the one-time write
  * after large ingests the same way a compaction job would.
  */
object Zorder {

  /** Interleave the low 16 bits of `x` with zeros (Morton spread),
    * via the standard mask ladder — stays inside whole-stage codegen. */
  private def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 32-bit Morton code of two 16-bit cell coordinates: bits of `a`
    * land on even positions, bits of `b` on odd. */
  def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Map a long key observed in [min, max] onto a 16-bit cell index by
    * power-of-two binning (shifts only — exact over the full long
    * range, unlike a double division which degrades past 2^53). Narrow
    * spans are scaled UP so every dimension's most-significant bit
    * lands on cell bit 15: without that, a wide key (say 24 bits of
    * orderkey) would monopolize the interleave's high bits and the
    * narrow key would never influence file boundaries. */
  def cell16(c: Column, min: Long, max: Long): Column = {
    val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(max - min, 1L))
    val base = c.cast("long") - lit(min)
    val v = if (spanBits >= 16) shiftright(base, spanBits - 16)
            else shiftleft(base, 16 - spanBits)
    v.bitwiseAND(lit(0xFFFFL))
  }

  /** Digest of (path, size, mtime) for every file under `path` — keys
    * the layout dir so regenerated source data invalidates it instead
    * of a fresh JVM silently reusing stale files. */
  def fingerprint(path: String): String = graft.util.Fingerprint.of(path)

  /** Materialize `df` once as parquet range-partitioned and sorted on
    * interleave(cell16(c1), cell16(c2)) under the warehouse dir (keyed
    * by `name` — include a source [[fingerprint]]), and return the
    * re-read. The sort column is dropped before the write: the layout
    * IS the index; readers prune through the ordinary column stats. */
  def ensureZordered(spark: SparkSession, name: String, df: DataFrame,
                     c1: String, c2: String, numFiles: Int): DataFrame = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
      val b = df.agg(min(col(c1)), max(col(c1)), min(col(c2)), max(col(c2))).head
      val z = interleave(cell16(col(c1), b.getLong(0), b.getLong(1)),
                         cell16(col(c2), b.getLong(2), b.getLong(3)))
      df.withColumn("_z", z)
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(loc.toString)
    }
    spark.read.parquet(loc.toString)
  }
}
