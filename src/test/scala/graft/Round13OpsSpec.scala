package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 additions: the LSH hot-band guard. */
class Round13OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("LSH hot-band guard refuses a pathological bucket, passes normal corpora") {
    import spark.implicits._
    // adversarial fixture: 40 byte-identical documents — every band
    // bucket holds all 40, the k²/2 candidate blow-up the guard exists
    // for — plus distinct documents that band apart
    val boiler = (0 until 40).map(i =>
      (i.toLong, "the same boilerplate template text repeated verbatim across pages"))
    val distinct = (100 until 110).map(i =>
      (i.toLong, s"genuinely unique document number $i with its own words $i$i"))
    val docs = (boiler ++ distinct).toDF("doc_id", "text")
    sys.props("graft.lsh.maxBandDocs") = "10"
    try {
      val ex = intercept[IllegalArgumentException] {
        graft.llm.Dedup.minhashNearDups(docs, 0.8).count()
      }
      assert(ex.getMessage.contains("maxBandDocs"))
      assert(ex.getMessage.contains("exact/canonical dedup"))
      // the shipped pipeline ORDER fixes it: exact dedup first, then
      // near-dup over the survivors — same corpus now passes the guard
      val survivors = docs.join(
        graft.llm.Dedup.exactGroups(docs).select(col("keep").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val pairs = graft.llm.Dedup.minhashNearDups(survivors, 0.8).collect()
      assert(pairs.forall(r => r.getLong(0) != r.getLong(1)))
    } finally sys.props.remove("graft.lsh.maxBandDocs")
    // default cap: normal corpora (the shared documents table) pass
    // unchanged — the guard must not fire on real bucket sizes
    val real = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    assert(graft.llm.Dedup.minhashNearDups(real, 0.8).count() >= 0)
  }
}
