package graft

import org.apache.spark.sql.SparkSession

/** Cold EAV-encode pin: times `Graft.ctx` exactly as the battery's
  * eav_encode entry does, in a fresh JVM with the cache cleared by the
  * caller (`runMain graft.EncodePin <sfDir>`). */
object EncodePin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val _ = Graft.ctx(spark, sfDir)
    println(f"ENCODEPIN eav_encode ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
