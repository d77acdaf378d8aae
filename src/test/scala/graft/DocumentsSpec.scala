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

  test("framing options: unfold=false / depth fold subdocuments to ids") {
    import spark.implicits._
    val nested =
      """{"name":"frd","geo":{"city":"oslo","detail":{"lat":59}}}"""
    val t = Documents.insertAll(Seq(nested).toDS(), "Person",
      Documents.LexicalKey(Seq("name")))
    val id = "doc:Person/frd"
    // full unfold (default): leaf literal reachable
    assert(Documents.read(t, id) \ "geo" \ "detail" \ "lat" == JInt(59))
    // unfold=false: the level-1 subdocument folds to its @id string
    val folded = Documents.read(t, id, unfold = false)
    assert(folded \ "geo" == JString(s"$id/geo"))
    assert(folded \ "name" == JString("frd"))
    // depth=1: one level unfolds, the level-2 subdocument folds
    val d1 = Documents.read(t, id, depth = 1)
    assert(d1 \ "geo" \ "city" == JString("oslo"))
    assert(d1 \ "geo" \ "detail" == JString(s"$id/geo/detail"))
    // depth=0 ≡ unfold=false
    assert(Documents.read(t, id, depth = 0) \ "geo" == JString(s"$id/geo"))
  }

  test("a link to another root document renders as its id, never {}") {
    import spark.implicits._
    val docs = Seq(
      """{"name":"lk","friend":null}""").toDS()
    val t = Documents.insertAll(docs, "Person", Documents.LexicalKey(Seq("name")))
    // hand-add an out-of-prefix IRI link (insertAll has no link syntax;
    // WOQL / turtle writes produce these)
    val link = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        "instance", "doc:Person/lk", "doc:friend", "i", "doc:Person/other",
        null, null, null, null, null, null, null, null)), 1),
      graft.storage.Eav.schema)
    val g = t.unionByName(link)
    // the foreign document is a REFERENCE — framing never inlines it
    assert(Documents.read(g, "doc:Person/lk") \ "friend" ==
      JString("doc:Person/other"))
    assert(Documents.read(g, "doc:Person/lk", unfold = false) \ "friend" ==
      JString("doc:Person/other"))
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

  test("List fields round-trip as ordered cons chains, incl. nested objects") {
    import spark.implicits._
    val d =
      """{"name":"l1","steps":["boil","stir","serve"],
        | "parts":[{"k":"a"},{"k":"b"}], "empty":[]}""".stripMargin
    val t = Documents.insertAll(Seq(d).toDS(), "Recipe",
      Documents.LexicalKey(Seq("name")),
      listFields = Set("steps", "parts", "empty"))
    // cons cells, not repeated triples: ONE doc:steps edge, 3 first/rest pairs
    val rows = t.collect()
    assert(rows.count(_.getString(2) == "doc:steps") == 1)
    assert(rows.count(r => r.getString(1).contains("/steps/") &&
      r.getString(2) == "rdf:first") == 3)
    val back = Documents.read(t, "doc:Recipe/l1")
    // ORDER preserved (a plain array field only guarantees membership)
    assert(back \ "steps" == JArray(List(
      JString("boil"), JString("stir"), JString("serve"))))
    val JArray(parts) = (back \ "parts"): @unchecked
    assert(parts.map(p => p \ "k") == List(JString("a"), JString("b")))
    assert(back \ "empty" == JArray(Nil))
  }

  test("family validator: Optional/Set/Array/List shapes fire and stay quiet") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    def lrow(s: String, p: String, str: String = null, iri: String = null,
             lng: java.lang.Long = null) =
      (s, p, if (iri != null) "i" else "l", iri, str, lng)
    val rows = Seq(
      // Optional: x has 2 names (bad), y has 1 (ok)
      lrow("d:x", "doc:nick", str = "a"), lrow("d:x", "doc:nick", str = "b"),
      lrow("d:y", "doc:nick", str = "c"),
      // Set: x repeats member "m" (bad); y's members distinct (ok)
      lrow("d:x", "doc:mem", str = "m"), lrow("d:x", "doc:mem", str = "m"),
      lrow("d:y", "doc:mem", str = "m"), lrow("d:y", "doc:mem", str = "n"),
      // Array: x's elements indexed 0,2 (gap — bad); y's 0,1 (ok)
      lrow("d:x", "doc:arr", iri = "d:x/arr/0"), lrow("d:x", "doc:arr", iri = "d:x/arr/1"),
      lrow("d:x/arr/0", "graft:idx", lng = 0L), lrow("d:x/arr/1", "graft:idx", lng = 2L),
      lrow("d:y", "doc:arr", iri = "d:y/arr/0"), lrow("d:y", "doc:arr", iri = "d:y/arr/1"),
      lrow("d:y/arr/0", "graft:idx", lng = 0L), lrow("d:y/arr/1", "graft:idx", lng = 1L),
      // List: x's field holds a LITERAL (bad); z's cons node has two
      // rests (bad); y's chain is well-formed (ok)
      lrow("d:x", "doc:lst", str = "oops"),
      lrow("d:z", "doc:lst", iri = "d:z/lst/_l0"),
      lrow("d:z/lst/_l0", "rdf:first", str = "v"),
      lrow("d:z/lst/_l0", "rdf:rest", iri = "rdf:nil"),
      lrow("d:z/lst/_l0", "rdf:rest", iri = "d:z/lst/_l1"),
      lrow("d:y", "doc:lst", iri = "d:y/lst/_l0"),
      lrow("d:y/lst/_l0", "rdf:first", str = "w"),
      lrow("d:y/lst/_l0", "rdf:rest", iri = "rdf:nil"))
      .toDF("s", "p", "o_kind", "o_iri", "o_str", "o_lng")
      .select(lit("instance").as("g"), col("s"), col("p"), col("o_kind"),
        col("o_iri"),
        org.apache.spark.sql.functions.when(col("o_str").isNotNull, "xsd:string")
          .otherwise(org.apache.spark.sql.functions.lit(null)).as("o_typ"),
        col("o_str"), lit(null).cast(DoubleType).as("o_dbl"),
        col("o_lng"), lit(null).cast(TimestampType).as("o_ts"),
        lit(null).cast(BooleanType).as("o_bool"),
        lit(null).cast(StringType).as("o_lang"),
        lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
    val schema = Seq(("doc:nick", "Optional"), ("doc:mem", "Set"),
        ("doc:arr", "Array"), ("doc:lst", "List")).toDF("s", "o_str")
      .select(col("s"), lit("graft:family").as("p"), col("o_str"),
        lit(null).cast(LongType).as("o_lng"),
        lit(null).cast(StringType).as("o_iri"),
        lit(null).cast(BooleanType).as("o_bool"))
    val c = graft.storage.Validator.constraintsFrom(schema)
    val v = graft.storage.Validator.familyViolations(rows, rows, c)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(v == Set(
      ("d:x", "doc:nick", "Optional"),
      ("d:x", "doc:mem", "Set"),
      ("d:x", "doc:arr", "Array"),
      ("d:x", "doc:lst", "List"),
      ("d:z/lst/_l0", "rdf:first", "List")))
  }

  test("template query: leaves, nesting, membership, @type/@id, paging") {
    import spark.implicits._
    val docs = Seq(
      """{"name":"ada","age":36,"tags":["math","code"],
        | "address":{"city":"london","geo":{"zone":1}}}""".stripMargin,
      """{"name":"bob","age":36,"tags":["code"],
        | "address":{"city":"paris","geo":{"zone":2}}}""".stripMargin,
      """{"name":"cyd","age":41,"tags":["math"],
        | "address":{"city":"london","geo":{"zone":2}}}""".stripMargin).toDS()
    val g = Documents.insertAll(docs, "Person", Documents.LexicalKey(Seq("name")))
    def q(tpl: String) =
      Documents.queryIds(g, "Person", JsonMethods.parse(tpl))
    assert(q("""{"age":36}""") == Seq("doc:Person/ada", "doc:Person/bob"))
    // nested two-level leaf
    assert(q("""{"address":{"geo":{"zone":2}}}""") ==
      Seq("doc:Person/bob", "doc:Person/cyd"))
    // scalar-array membership + conjunction across fields
    assert(q("""{"tags":"math","address":{"city":"london"}}""") ==
      Seq("doc:Person/ada", "doc:Person/cyd"))
    // template array = containment of ALL listed elements
    assert(q("""{"tags":["math","code"]}""") == Seq("doc:Person/ada"))
    // @id pin + @type passthrough + empty template
    assert(q("""{"@id":"doc:Person/bob"}""") == Seq("doc:Person/bob"))
    assert(q("""{"@type":"Person","age":41}""") == Seq("doc:Person/cyd"))
    assert(q("{}").size == 3)
    // no match is empty, not an error
    assert(q("""{"age":99}""").isEmpty)
    // deterministic paging
    assert(Documents.queryIds(g, "Person", JsonMethods.parse("{}"),
      skip = 1, count = 1) == Seq("doc:Person/bob"))
  }
}
