package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM INTERLEAVED A/B of the link-prediction shuffled-hash hint
  * (`graft.link.shj`): the r17 isolated BenchOne A/B said the hint won
  * while both full batteries said it lost — so this harness flips the
  * toggle per rep inside ONE JVM, alternating A/B/A/B…, which removes
  * the batch-position and JVM-state confounds that an isolated re-run
  * cannot. `runMain graft.LinkAB <sfDir> <repsPerArm> <query...>`. */
object LinkAB {
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val names = args.drop(2).toSeq
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
    val _ = Graft.ctx(spark, sfDir) // warm
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warmup rep per arm (uncounted: JIT + codegen for both shapes)
      Seq("off", "on").foreach { arm =>
        sys.props("graft.link.shj") = arm
        val _ = fn(spark, sfDir).count()
        val _2 = graft.util.Scratch.drain()
      }
      val times = scala.collection.mutable.Map(
        "on" -> List.empty[Double], "off" -> List.empty[Double])
      (1 to reps).foreach { _ =>
        Seq("off", "on").foreach { arm =>
          sys.props("graft.link.shj") = arm
          System.gc(); Thread.sleep(100)
          val g0 = gcMs; val t0 = System.nanoTime()
          val _ = fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val _2 = graft.util.Scratch.drain()
          times(arm) = times(arm) :+ sec
          println(f"LINKAB_REP $n $arm $sec%.2f gc_ms=${gcMs - g0}")
        }
      }
      sys.props.remove("graft.link.shj")
      def s(a: String) = times(a).map(t => f"$t%.2f").mkString(",")
      println(f"LINKAB $n off=[${s("off")}] min=${times("off").min}%.2f " +
        f"on=[${s("on")}] min=${times("on").min}%.2f")
    }
    spark.stop()
  }
}
