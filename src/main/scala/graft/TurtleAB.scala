package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: driver-side Turtle.load vs the distributed TurtleDist reader
  * on the same multi-MB dump — lines/s for BASELINE.md
  * (`runMain graft.TurtleAB [sfDir] [reps]`).
  *
  * Three arms: (1) driver parse of the whole document (the only
  * pre-r15 option), (2) TurtleDist on a one-statement-per-line dump
  * (fast path, no shuffle), (3) TurtleDist on the `;`-grouped
  * multi-line dump (statement-assembly path, sort + group shuffles).
  */
object TurtleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Graft.ctx(spark, sfDir)
    // orders slice: line-safe term kinds only (str/long/iri — dates
    // and decimals round-trip too but aren't needed for throughput)
    val preds = Seq("tpch:o_orderkey", "tpch:o_custkey",
      "tpch:o_orderstatus", "tpch:o_orderpriority", "rdf:type")
    val cust = ctx.triples.filter(col("g") === "instance" &&
      col("s").startsWith("tpch:orders/") && col("p").isin(preds: _*))

    val base = java.nio.file.Files.createTempDirectory("graft-ttlab").toString
    val lineDir = s"$base/line"; val groupDir = s"$base/grouped"
    graft.sources.Turtle.dumpTo(cust, lineDir)
    graft.sources.TurtleDist.dumpPrefixedTo(cust, Map(
      "o" -> "tpch:orders/", "cu" -> "tpch:customer/", "t" -> "tpch:"),
      groupDir)
    def linesOf(dir: String): Long = spark.read.text(dir).count()
    def mbOf(dir: String): Double = {
      def sz(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
      sz(new java.io.File(dir)) / 1e6
    }
    val lineN = linesOf(lineDir); val groupN = linesOf(groupDir)
    println(f"TURTLEAB corpus line=$lineN lines (${mbOf(lineDir)}%.1f MB) " +
      f"grouped=$groupN lines (${mbOf(groupDir)}%.1f MB)")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val text = spark.read.text(lineDir).collect()
      .map(_.getString(0)).mkString("\n")
    (1 to reps).foreach { r =>
      val (td, nd) = time(graft.sources.Turtle.load(spark, text).count())
      val (tf, nf) = time(graft.sources.TurtleDist.read(spark, lineDir).count())
      val (tg, ng) = time(graft.sources.TurtleDist.read(spark, groupDir).count())
      require(nd == nf && nf == ng, s"triple counts diverge: $nd/$nf/$ng")
      println(f"TURTLEAB rep$r driver=$td%.2fs (${lineN / td / 1000}%.0fk l/s) " +
        f"dist_line=$tf%.2fs (${lineN / tf / 1000}%.0fk l/s) " +
        f"dist_grouped=$tg%.2fs (${groupN / tg / 1000}%.0fk l/s) triples=$nd")
    }
    spark.stop()
  }
}
