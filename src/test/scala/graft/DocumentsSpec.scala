package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.docs.Documents

/** Document CRUD: JSON↔triples expansion, key strategies, round trip
  * (SURVEY §2.8 / E2). */
class DocumentsSpec extends AnyFunSuite {
  import TestSpark._

  private val doc =
    """{"name":"ada","age":36,"active":true,
      | "address":{"city":"london","zip":"e1"},
      | "tags":["math","code"]}""".stripMargin

  test("bulk insert expands nested docs inside mapPartitions") {
    import spark.implicits._
    val ds = Seq(doc).toDS()
    val t = Documents.insertAll(ds, "Person", Documents.LexicalKey(Seq("name")))
    val rows = t.collect()
    assert(rows.exists(r => r.getString(2) == "doc:name" && r.getString(6) == "ada"))
    assert(rows.exists(r => r.getString(2) == "doc:address" && r.getString(3) == "i"))
    assert(rows.exists(r => r.getString(1).endsWith("/address") &&
      r.getString(2) == "doc:city"))
    assert(rows.count(_.getString(2) == "doc:tags") == 2)
  }

  test("document round-trips through triples") {
    import spark.implicits._
    val t = Documents.insertAll(Seq(doc).toDS(), "Person",
      Documents.LexicalKey(Seq("name")))
    val id = "doc:Person/ada"
    val back = Documents.read(t, id)
    assert(back \ "name" == JString("ada"))
    assert(back \ "age" == JInt(36))
    assert(back \ "active" == JBool(true))
    assert(back \ "address" \ "city" == JString("london"))
    val JArray(tags) = (back \ "tags"): @unchecked
    assert(tags.toSet == Set(JString("math"), JString("code")))
  }

  test("key strategies generate expected ids") {
    val j = JsonMethods.parse("""{"name":"a b","n":1}""").asInstanceOf[JObject]
    assert(Documents.genId("T", j, Documents.LexicalKey(Seq("name"))) == "doc:T/a+b")
    assert(Documents.genId("T", j, Documents.HashKey(Seq("name")))
      .startsWith("doc:T/") )
    val v1 = Documents.genId("T", j, Documents.ValueHash)
    val v2 = Documents.genId("T",
      JsonMethods.parse("""{"n":1,"name":"a b"}""").asInstanceOf[JObject],
      Documents.ValueHash)
    assert(v1 == v2) // canonical: key order irrelevant
  }

  test("delete selects the full subgraph") {
    import spark.implicits._
    val t = Documents.insertAll(Seq(doc).toDS(), "Person",
      Documents.LexicalKey(Seq("name")))
    val del = Documents.delete(t, "doc:Person/ada")
    assert(del.count() == t.count()) // whole doc incl. subdocuments
  }

  test("document update stages adds of new and removes of old subgraph") {
    import spark.implicits._
    import graft.storage.Updates
    val t = Documents.insertAll(Seq(doc).toDS(), "Person",
      Documents.LexicalKey(Seq("name")))
    implicit val ctx = TestSpark.ctxOf(t)
    val (adds, removes) = Updates.stageDocUpdate(t, "doc:Person/ada",
      """{"name":"ada","age":37}""", "Person")
    assert(removes.count() == t.count())        // whole old subgraph out
    val addRows = adds.collect()
    assert(addRows.exists(r => r.getString(2) == "doc:age" && r.getLong(8) == 37L))
    assert(addRows.forall(r => r.getString(1).startsWith("doc:Person/ada")))
  }

  test("insert-document staging from query bindings runs distributed") {
    import spark.implicits._
    import graft.core._
    import graft.storage.Updates
    val g = TestSpark.triples((":a", "payload", """{"name":"x","n":1}"""),
      (":b", "payload", """{"name":"y","n":2}"""))
    implicit val ctx = TestSpark.ctxOf(g)
    val staged = Updates.stageDocs(
      TriplePat(V("S"), Node("payload"), V("J")), "J", "Thing",
      Documents.LexicalKey(Seq("name")))
    val subjects = staged.select("s").distinct().collect().map(_.getString(0)).toSet
    assert(subjects == Set("doc:Thing/x", "doc:Thing/y"))
  }

  test("flat analytical view exposes scalar fields as a map") {
    import spark.implicits._
    val t = Documents.insertAll(Seq(doc).toDS(), "Person",
      Documents.LexicalKey(Seq("name")))
    val fv = Documents.flatView(t).collect()
    assert(fv.nonEmpty)
  }

  test("diff + applyPatch round-trips; patch view fuses single-value swaps") {
    import graft.docs.Diff
    val old = triples(
      (":a", "seg", "BUILDING"), (":a", "name", "ada"),
      (":b", "seg", "AUTO"),
      (":c", "tag", "x"), (":c", "tag", "y")) // multi-valued predicate
    val neu = triples(
      (":a", "seg", "PROMO"), (":a", "name", "ada"), // seg changed
      (":b", "seg", "AUTO"), (":b", "flag", "vip"),  // flag inserted
      (":c", "tag", "x"), (":c", "tag", "z"))        // y -> z BUT multi
    val d = Diff.diffTriples(old, neu)
    // round trip: applying the diff to old reproduces new exactly
    val applied = Diff.applyPatch(old, d)
    assert(applied.exceptAll(neu).count() == 0
      && neu.exceptAll(applied).count() == 0)
    val pv = Diff.patchView(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(pv == Set(
      (":a", "seg", "swap", Some("BUILDING"), Some("PROMO")),
      (":b", "flag", "insert", None, Some("vip")),
      // (:c, tag) has one delete and one insert — it DOES fuse to swap
      // only because each side has exactly one changed value
      (":c", "tag", "swap", Some("y"), Some("z"))))
    // a genuinely multi-valued change does NOT fuse: two inserts
    val neu2 = triples(
      (":c", "tag", "x"), (":c", "tag", "y"),
      (":c", "tag", "p"), (":c", "tag", "q"))
    val pv2 = Diff.patchView(Diff.diffTriples(
        old.filter(org.apache.spark.sql.functions.col("s") === ":c"), neu2))
      .collect().map(r => (r.getString(2), r.getString(4))).toSet
    assert(pv2 == Set(("insert", "p"), ("insert", "q")))
  }

  test("prefix context: expand/contract round-trip, longest base wins") {
    import graft.docs.Prefixes
    // overlapping bases: "ex" is a prefix of "exv" — contract must pick
    // the longer (more specific) base on both the Scala and Column side
    val ctx = Map(
      "ex" -> "http://e.org/", "exv" -> "http://e.org/v/",
      "tpch" -> "http://example.org/tpch#")
    assert(Prefixes.expand(ctx)("tpch:nation/3") == "http://example.org/tpch#nation/3")
    assert(Prefixes.contract(ctx)("http://e.org/v/x") == "exv:x")
    assert(Prefixes.contract(ctx)("http://e.org/y") == "ex:y")
    assert(Prefixes.expand(ctx)("unknown:z") == "unknown:z") // passthrough
    assert(Prefixes.contract(ctx)("urn:other") == "urn:other")
    // column side agrees with the scala side on every case
    import TestSpark._
    import spark.implicits._
    val in = Seq("tpch:nation/3", "exv:x", "ex:y", "unknown:z").toDF("c")
    val got = in.select(
      Prefixes.expandCol(ctx, org.apache.spark.sql.functions.col("c")).as("e"))
      .withColumn("b", Prefixes.contractCol(ctx, org.apache.spark.sql.functions.col("e")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("http://example.org/tpch#nation/3", "tpch:nation/3"),
      ("http://e.org/v/x", "exv:x"),
      ("http://e.org/y", "ex:y"),
      ("unknown:z", "unknown:z")))
  }
}
