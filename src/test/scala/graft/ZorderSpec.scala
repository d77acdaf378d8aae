package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Zorder

/** The Z-order layout's whole value is row-group pruning on BOTH
  * interleaved keys — invisible to row-level correctness, so this spec
  * (a) pins the Morton bit math against a reference implementation and
  * (b) MEASURES the pruning: the same 2-d box predicate must touch
  * strictly fewer files on the z-layout than on a single-key sort of
  * the same data into the same file count. */
class ZorderSpec extends AnyFunSuite {
  import TestSpark._

  private val sfDir = "/root/testdata/sf0.001"

  /** Reference Morton interleave over 16-bit ints, bit by bit. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a.toLong >> i & 1L) << (2 * i)) |
        ((b.toLong >> i & 1L) << (2 * i + 1))
    }

  test("interleave matches a bit-by-bit reference morton code") {
    import spark.implicits._
    val pairs = Seq((0, 0), (1, 0), (0, 1), (10, 6), (0xFFFF, 0),
      (0, 0xFFFF), (0xFFFF, 0xFFFF), (12345, 54321), (65535, 1))
    val got = pairs.toDF("a", "b")
      .select(Zorder.interleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) => mortonRef(a, b) }
    assert(got.toSeq == want, s"morton mismatch: got=${got.toSeq} want=$want")
  }

  test("cell16 is exact power-of-two binning aligned at bit 15") {
    import spark.implicits._
    // span 999 → 10 bits → scaled up by 6 so the span's MSB hits bit 15
    val cells = Seq(1L, 500L, 1000L).toDF("v")
      .select(Zorder.cell16(col("v"), 1L, 1000L).as("c"))
      .collect().map(_.getLong(0))
    assert(cells.toSeq == Seq(0L, 499L << 6, 999L << 6))
    // span wider than 16 bits: top of range lands on cell 65535, never 65536
    val wide = Seq(0L, (1L << 40) - 1).toDF("v")
      .select(Zorder.cell16(col("v"), 0L, (1L << 40) - 1).as("c"))
      .collect().map(_.getLong(0))
    assert(wide.toSeq == Seq(0L, 65535L))
  }

  test("2-d box predicate touches fewer files on z-layout than single-key sort") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val fp = Zorder.fingerprint(s"$sfDir/lineitem.parquet")
    val z = Zorder.ensureZordered(spark, s"graft_ztest_z_$fp", li,
      "l_orderkey", "l_suppkey", 16)

    // comparison layout: identical data, identical file count, sorted
    // on l_orderkey alone (what a naive ingest produces)
    val oneKeyLoc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"graft_ztest_1k_$fp")
    val fs = oneKeyLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(oneKeyLoc, "_SUCCESS")))
      li.repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(oneKeyLoc.toString)
    val oneKey = spark.read.parquet(oneKeyLoc.toString)

    // box: ~40% of the orderkey range × 3 of 9 suppkeys — the orderkey
    // half prunes on both layouts; the suppkey half only on z
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.where(col("l_orderkey").between(100, 700) &&
          col("l_suppkey").between(1, 3))
        .select(input_file_name()).distinct().count()

    val (zFiles, okFiles) = (filesTouched(z), filesTouched(oneKey))
    assert(zFiles < okFiles,
      s"z-order must prune more files than single-key sort: z=$zFiles single=$okFiles")

    // and the answer itself is layout-independent
    val zCount = z.where(col("l_orderkey").between(100, 700) &&
      col("l_suppkey").between(1, 3)).count()
    val rawCount = li.where(col("l_orderkey").between(100, 700) &&
      col("l_suppkey").between(1, 3)).count()
    assert(zCount == rawCount)
  }
}
