package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Pca

class PcaSpec extends AnyFunSuite {
  import TestSpark._

  test("power iteration recovers a known principal direction exactly") {
    import spark.implicits._
    // points on the (3,4,0,0)/5 line, zero mean: one dominant component
    val emb = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex
      .map { case (tv, i) => (i.toLong, Array(3 * tv, 4 * tv, 0.0, 0.0)) }
      .toDF("vec_id", "embedding")
    val (mu, comps) = Pca.fitComponents(emb, "embedding", dim = 4,
      nComp = 1, iters = 3)
    assert(mu == IndexedSeq(0.0, 0.0, 0.0, 0.0))
    // max-abs scaling pins the largest loading to ±1
    assert(comps.head == IndexedSeq(0.75, 1.0, 0.0, 0.0))
    val proj = Pca.projectAll(emb, "vec_id", "embedding", mu, comps)
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(proj == Seq(-12.5, -6.25, 0.0, 6.25, 12.5))
  }

  test("deflation finds an orthogonal second component on rank-2 data") {
    import spark.implicits._
    // dim-0 variance 50, dim-1 variance 0.8, cross-moment 0
    val a = Seq(-10.0, -5.0, 0.0, 5.0, 10.0)
    val b = Seq(1.0, -1.0, 0.0, -1.0, 1.0)
    val emb = a.zip(b).zipWithIndex.map { case ((av, bv), i) =>
      (i.toLong, Array(av, bv, 0.0, 0.0))
    }.toDF("vec_id", "embedding")
    val (_, comps) = Pca.fitComponents(emb, "embedding", dim = 4,
      nComp = 2, iters = 3)
    val Seq(v1, v2) = comps.toSeq
    def dot(x: IndexedSeq[Double], y: IndexedSeq[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    def norm(x: IndexedSeq[Double]) = math.sqrt(dot(x, x))
    // v1 points along dim 0, v2 along dim 1, near-orthogonal
    assert(math.abs(v1(0)) == 1.0 && math.abs(v2(1)) == 1.0)
    assert(math.abs(dot(v1, v2)) / (norm(v1) * norm(v2)) < 0.01)
  }

  test("projections are centered (non-zero-mean corpus)") {
    import spark.implicits._
    val emb = (0 until 40).map { i =>
      (i.toLong, Array(10.0 + (i % 7), -3.0 + (i % 5) * 2.0, 0.5, 1.0))
    }.toDF("vec_id", "embedding")
    val (mu, comps) = Pca.fitComponents(emb, "embedding", dim = 4,
      nComp = 1, iters = 3)
    val mean = Pca.projectAll(emb, "vec_id", "embedding", mu, comps)
      .agg(avg(col("proj1"))).collect().head.getDouble(0)
    assert(math.abs(mean) < 1e-4) // mu is quantized, so near-zero not exact
    // direction is quantized to 6 decimals each round
    assert(comps.head.forall(x => (BigDecimal(x) * 1000000).isWhole))
  }

  test("projection plan is codegen'd expressions (no UDF)") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val df = Pca.projectAll(emb, "vec_id", "embedding",
      IndexedSeq(0.0, 0.0), IndexedSeq(IndexedSeq(1.0, 0.5)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
