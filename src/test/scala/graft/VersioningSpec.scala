package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F, Row}
import graft.core._
import graft.docs.Frames
import graft.storage.{Eav, LayerStore}

/** Witness paths, lenient xsd casts, frames, and store transfer
  * (pack/push/pull/clone). */
class VersioningSpec extends AnyFunSuite {
  import TestSpark._

  test("path witness binds a canonical node sequence") {
    val g = triples((":a", "e", ":b"), (":b", "e", ":c"), (":a", "e", ":c"))
    implicit val ctx: Ctx = ctxOf(g)
    val q = PathQ(Node(":a"), PPlus(PPred("e")), V("Y"), witness = Some("W"))
    val rows = Compiler.run(q).collect()
      .map(r => r.getAs[Row]("Y").getAs[String]("iri") ->
        r.getAs[Row]("W").getAs[String]("str")).toMap
    assert(rows(":b") == ":a/:b")
    assert(rows(":c") == ":a/:c") // direct edge beats the 2-hop path
  }

  test("lenient xsd dateTime cast accepts the xsd family") {
    val samples = Map(
      "2023-01-02T03:04:05Z" -> "2023-01-02T03:04:05Z",
      "2023-01-02T03:04:05+02:00" -> "2023-01-02T01:04:05Z",
      "2023-01-02T03:04:05" -> "2023-01-02T03:04:05Z",
      "2023-01-02 03:04:05" -> "2023-01-02T03:04:05Z",
      "2023-01-02" -> "2023-01-02T00:00:00Z",
      "2023" -> "2023-01-01T00:00:00Z",
      "-0044-03-15" -> "-0044-03-15T00:00:00Z")
    samples.foreach { case (in, want) =>
      val got = graft.functions.XsdTimestampCast.parseMicros(in)
      assert(got.isDefined, s"failed to parse $in")
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(got.get, 1000000L), Math.floorMod(got.get, 1000000L) * 1000L)
      assert(inst == java.time.Instant.parse(want), s"for $in")
    }
    assert(graft.functions.XsdTimestampCast.parseMicros("not a date").isEmpty)
    // end-to-end through the compiler
    val g = triples((":x", "d", "2023-01-02"))
    implicit val ctx: Ctx = ctxOf(g)
    val q = And(Seq(TriplePat(V("X"), Node("d"), V("S")),
      CastQ(V("S"), "xsd:dateTime", "T")))
    val ts = Compiler.run(q).collect()
      .map(_.getAs[Row]("T").getAs[java.sql.Timestamp]("ts"))
    assert(ts.head.toInstant == java.time.Instant.parse("2023-01-02T00:00:00Z"))
  }

  test("frames fold inherited properties through the subclass closure") {
    import spark.implicits._
    val schema = Seq(
      ("name", "rdfs:domain", "Agent", null, null: java.lang.Long),
      ("name", "rdfs:range", "xsd:string", null, null: java.lang.Long),
      ("balance", "rdfs:domain", "Customer", null, null: java.lang.Long),
      ("balance", "graft:maxCard", null, null, java.lang.Long.valueOf(1L)))
      .toDF("s", "p", "o_iri0", "pad", "o_lng")
      .select(F.col("s"), F.col("p"), F.col("o_iri0").as("o_iri"), F.col("o_lng"))
    val closure = Seq(("Customer", "Customer"), ("Customer", "Agent"),
      ("Agent", "Agent")).toDF("sub", "sup")
    val frame = Frames.classFrame(schema, closure, "Customer").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(frame.keySet == Set("name", "balance")) // name inherited from Agent
    assert(frame("name").contains("xsd:string"))
  }

  test("pack/push/pull/clone move layers fast-forward only") {
    def tmp() = java.nio.file.Files.createTempDirectory("graft-xfer").toString
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Eav.schema)
    val origin = LayerStore.open(spark, tmp())
    origin.commit("main", triples((":a", "p", "v1")), empty, "c1")
    origin.commit("main", triples((":b", "p", "v2")), empty, "c2")

    val remote = origin.cloneTo(tmp(), "main")
    assert(remote.materializeBranch("main").count() == 2)

    // push a new commit
    origin.commit("main", triples((":c", "p", "v3")), empty, "c3")
    origin.push(remote, "main")
    assert(remote.materializeBranch("main").count() == 3)

    // pull back a commit made on the remote
    remote.commit("main", triples((":d", "p", "v4")), empty, "c4")
    origin.pull(remote, "main")
    assert(origin.materializeBranch("main").count() == 4)

    // non-fast-forward push is rejected
    val fork = origin.cloneTo(tmp(), "main")
    fork.reset("main", fork.chain(fork.refs("main")).head) // rewind to root
    fork.commit("main", triples((":x", "p", "vx")), empty, "diverged")
    intercept[IllegalArgumentException] { fork.push(origin, "main") }

    assert(origin.sizeBytes("main") > 0)
  }

  test("using scopes a subquery to a branch or commit; bindings join across") {
    def tmp() = java.nio.file.Files.createTempDirectory("graft-using").toString
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Eav.schema)
    val st = LayerStore.open(spark, tmp())
    st.commit("main", triples((":a", "name", "v1"), (":b", "name", "old")), empty, "c1")
    st.commit("main", triples((":a", "name", "v2")),
      triples((":a", "name", "v1")), "c2")
    st.branch("dev", st.chain(st.refs("main")).head) // dev = first commit
    implicit val ctx: Ctx = graft.storage.Updates.ctxFromStore(st, "main")

    // head vs first commit in ONE query: S joins across resources
    val first = st.chain(st.refs("main")).head
    val q = And(Seq(
      TriplePat(V("S"), Node("name"), V("Now")),
      Using(s"commit/$first", TriplePat(V("S"), Node("name"), V("Then")))))
    val rows = Compiler.run(q).collect().map(r =>
      (r.getAs[Row]("S").getAs[String]("iri"),
        r.getAs[Row]("Now").getAs[String]("str"),
        r.getAs[Row]("Then").getAs[String]("str"))).toSet
    // :a renamed v1→v2 (join sees both versions), :b unchanged
    assert(rows == Set((":a", "v2", "v1"), (":b", "old", "old")))

    // branch addressing and nesting: dev IS the first commit
    val qb = Using("branch/dev", TriplePat(V("S"), Node("name"), V("N")))
    val branchRows = Compiler.run(qb).collect().map(r =>
      (r.getAs[Row]("S").getAs[String]("iri"),
        r.getAs[Row]("N").getAs[String]("str"))).toSet
    assert(branchRows == Set((":a", "v1"), (":b", "old")))

    // unknown resource syntax fails loudly
    val e = intercept[RuntimeException] {
      Compiler.run(Using("garbage", True))
    }
    assert(e.getMessage.contains("branch/<name>, commit/<id>"))
  }
}
