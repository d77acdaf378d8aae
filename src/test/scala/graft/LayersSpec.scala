package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.storage.{Eav, LayerStore, Validator}
import org.apache.spark.sql.functions._

/** Commit-layered storage: commit/materialize/branch/diff/rebase/
  * optimize, plus added/removed delta scans (SURVEY §2.8). */
class LayersSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore(): LayerStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-layers").toString
    LayerStore.open(spark, dir)
  }
  private val empty = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Eav.schema)

  test("commit + materialize folds adds and removes") {
    val st = freshStore()
    val c1 = st.commit("main", triples((":a", "p", "v1"), (":b", "p", "v2")), empty, "base")
    val c2 = st.commit("main",
      triples((":c", "p", "v3")), triples((":a", "p", "v1")), "delta")
    val mat = st.materialize(c2)
    assert(mat.count() == 2)
    assert(mat.filter(col("s") === ":a").count() == 0)
    assert(st.materialize(c1).count() == 2) // history immutable
    // delta scans (added_triple / removed_triple)
    assert(st.adds(c2).count() == 1 && st.removes(c2).count() == 1)
  }

  test("re-adding a removed triple makes it visible again") {
    val st = freshStore()
    st.commit("main", triples((":a", "p", "v")), empty, "add")
    st.commit("main", empty, triples((":a", "p", "v")), "rm")
    val c3 = st.commit("main", triples((":a", "p", "v")), empty, "re-add")
    assert(st.materialize(c3).count() == 1)
  }

  test("branch + diff + reset") {
    val st = freshStore()
    st.commit("main", triples((":a", "p", "v1")), empty, "base")
    st.branch("dev", "main")
    val d = st.commit("dev", triples((":b", "p", "v2")), empty, "dev work")
    val (added, removed) = st.diff(st.refs("main"), st.refs("dev"))
    assert(added.count() == 1 && removed.count() == 0)
    st.reset("dev", st.refs("main"))
    assert(st.refs("dev") == st.refs("main"))
    val _ = d
  }

  test("rebase replays divergent commits onto the new base") {
    val st = freshStore()
    st.commit("main", triples((":a", "p", "v1")), empty, "base")
    st.branch("dev", "main")
    st.commit("dev", triples((":b", "p", "v2")), empty, "dev1")
    st.commit("main", triples((":c", "p", "v3")), empty, "main1")
    st.rebase("dev", "main")
    val mat = st.materializeBranch("dev")
    assert(mat.select("s").collect().map(_.getString(0)).toSet == Set(":a", ":b", ":c"))
  }

  test("optimize squashes history into one base layer") {
    val st = freshStore()
    st.commit("main", triples((":a", "p", "v1"), (":b", "p", "v2")), empty, "c1")
    st.commit("main", empty, triples((":b", "p", "v2")), "c2")
    val oid = st.optimize("main")
    assert(st.chain(oid) == Seq(oid)) // single layer now
    assert(st.materializeBranch("main").count() == 1)
  }

  test("validator catches dangling refs, range, cardinality violations") {
    import spark.implicits._
    val schema = Seq(
      ("age", "rdfs:range", null, "xsd:integer", null: java.lang.Long),
      ("age", "graft:maxCard", null, null, java.lang.Long.valueOf(1L)))
      .toDF("s", "p", "o_iri", "o_rangeTyp", "o_n")
      .select(col("s"), col("p"),
        coalesce(col("o_rangeTyp"), col("o_iri")).as("o_iri"),
        col("o_n").as("o_lng"))
    val graph = triples((":a", "knows", ":ghost"), (":a", "age", 30), (":a", "age", 40))
    val delta = graph
    val c = Validator.constraintsFrom(schema)
    assert(Validator.danglingRefs(graph, graph).count() == 1)
    assert(Validator.cardinalityViolations(graph, delta, c).count() == 1)
    // range: encode a string age
    val bad = triples((":b", "age", "not-a-number"))
    assert(Validator.rangeViolations(bad, c).count() == 1)
  }
}
