package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.storage.Eav

/** One-off profiling of the cold EAV encode path:
  * `runMain graft.EncodeProf <sfDir>`. */
object EncodeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("encode+count")   { Eav.encodeAll(spark, sfDir).count() }
    println("TRIPLES " + Eav.encodeAll(spark, sfDir).count())
    t("write-salt8-sort-ps") { Eav.encodeAll(spark, sfDir)
      .repartition(col("p"), pmod(xxhash64(col("s")), lit(8)))
      .sortWithinPartitions("p", "s")
      .write.mode("overwrite").partitionBy("g", "p").parquet("/tmp/eavprof-s8ps") }
    t("write-salt16-64") { Eav.encodeAll(spark, sfDir)
      .repartition(64, col("p"), pmod(xxhash64(col("s")), lit(16)))
      .sortWithinPartitions("p", "s")
      .write.mode("overwrite").partitionBy("g", "p").parquet("/tmp/eavprof-s16") }
    t("write-salt8-again") { Eav.encodeAll(spark, sfDir)
      .repartition(col("p"), pmod(xxhash64(col("s")), lit(8)))
      .sortWithinPartitions("s")
      .write.mode("overwrite").partitionBy("g", "p").parquet("/tmp/eavprof-salt") }
    spark.stop()
  }
}
