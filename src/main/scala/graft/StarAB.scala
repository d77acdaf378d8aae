package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured A/B for the property-table (star-join collapse) rewrite —
  * SURVEY §4.2 item 2: chains of EAV self-joins on one subject vs the
  * StarPat single-scan + single-shuffle plan (Compiler.starFuse). The
  * fused arm forces the functional-predicate set into the Ctx (the
  * same set GRAFT_STAR_FUSION=on computes), so the rewrite genuinely
  * fires regardless of the env default.
  * `runMain graft.StarAB <sfDir> [reps]` — results recorded in
  * BASELINE.md ("property-table A/B"). */
object StarAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Graft.ctx(spark, sfDir)
    // the GRAFT_STAR_FUSION=on functional-predicate computation
    val funcPreds = base.triples.filter(col("g") === "instance")
      .groupBy(col("p"), col("s")).count()
      .groupBy(col("p")).agg(max(col("count")).as("m"))
      .filter(col("m") === 1)
      .select("p").collect().map(_.getString(0)).toSet
    println(s"STARAB functional_preds=${funcPreds.size}")
    val fusedCtx = base.copy(functionalPreds = funcPreds)
    import graft.core._
    // flagship: 3 fusable customer predicates + a nation hop
    val flagship = graft.queries.WoqlQueries.flagship
    // wide star: every functional customer predicate, no join hop —
    // the shape where the rewrite's one-scan-one-shuffle should
    // separate most from the 4-way self-join chain
    val wide = Select(Seq("Name", "Bal", "Seg"), And(Seq(
      TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer")),
      TriplePat(V("C"), Node("tpch:c_name"), V("Name")),
      TriplePat(V("C"), Node("tpch:c_acctbal"), V("Bal")),
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      Cmp(">", V("Bal"), Dbl(500.0)))))
    def run(label: String, q: Woql, fuse: Boolean): Unit = {
      implicit val c: Ctx = if (fuse) fusedCtx else base
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = Compiler.run(q).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"STARAB $label fuse=$fuse rows=${times.head._2} " +
        s"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"min=${times.map(_._1).min}%.2f")
    }
    Seq(true, false).foreach { f =>
      run("flagship", flagship, f)
      run("wide_star", wide, f)
    }
    spark.stop()
  }
}
