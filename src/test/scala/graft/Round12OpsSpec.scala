package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Round-12 additions: path-pattern string syntax, the GraphQL `path:`
  * argument, and capability-catalog semantics. */
class Round12OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("path syntax: precedence, grouping, inverse, bounds, prefixing") {
    assert(PathSyntax.parse("knows") == PPred("knows"))
    assert(PathSyntax.parse("knows", "t:") == PPred("t:knows"))
    assert(PathSyntax.parse("t:knows", "x:") == PPred("t:knows")) // prefixed stays
    assert(PathSyntax.parse("<knows") == PInv("knows"))
    assert(PathSyntax.parse("a,b|c") ==
      PAlt(PSeq(PPred("a"), PPred("b")), PPred("c"))) // ',' binds tighter than '|'
    assert(PathSyntax.parse("a,(b|c)") ==
      PSeq(PPred("a"), PAlt(PPred("b"), PPred("c"))))
    assert(PathSyntax.parse("a+") == PPlus(PPred("a")))
    assert(PathSyntax.parse("(a|b)*") == PStar(PAlt(PPred("a"), PPred("b"))))
    assert(PathSyntax.parse("a{1,3}") == PTimes(PPred("a"), 1, 3))
    assert(PathSyntax.parse("a{1,3}+") == PPlus(PTimes(PPred("a"), 1, 3)))
    assert(PathSyntax.parse(" a , <b | c* ") ==
      PAlt(PSeq(PPred("a"), PInv("b")), PStar(PPred("c"))))
    intercept[IllegalArgumentException] { PathSyntax.parse("a,") }
    intercept[IllegalArgumentException] { PathSyntax.parse("(a") }
    intercept[IllegalArgumentException] { PathSyntax.parse("a{1}") }
    intercept[IllegalArgumentException] { PathSyntax.parse("a b") }
  }

  test("graphql path argument traverses the path engine from a filtered root") {
    val g = triples(
      (":a", ":knows", ":b"), (":b", ":knows", ":c"),
      (":a", ":name", "alice"), (":b", ":name", "bob"), (":c", ":name", "carol"),
      (":a", "rdf:type", ":Person"), (":b", "rdf:type", ":Person"),
      (":c", "rdf:type", ":Person"))
    implicit val ctx: Ctx = ctxOf(g)
    val (_, df) = server.GraphQL.run(
      """{ Person(filter: {name: {eq: "alice"}}) {
        |    name
        |    reach(path: "knows+") { name } } }""".stripMargin, prefix = ":")
    val rows = df.collect().map(r =>
      (r.getAs[org.apache.spark.sql.Row]("name").getAs[String]("str"),
        r.getAs[org.apache.spark.sql.Row]("reach_name").getAs[String]("str"))).toSet
    assert(rows == Set(("alice", "bob"), ("alice", "carol")))
  }

  test("WavCodec decodes hand-rolled PCM WAVs; chain codec keeps order") {
    import graft.llm.Multimodal
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(1L, 2L, 7L).toDF("doc_id")
    val rows = Multimodal.withWavPayload(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, bytes) <- rows) {
      val got = Multimodal.WavCodec.decode(bytes)
      assert(got.contains((100 + id % 400, 8000L, "audio/wav")), s"doc $id")
      assert(bytes.length == 44 + (100 + id % 400) * (1 + id % 2) * 2)
      // javax.sound really parses it (not just our own header math)
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(aff.getFormat.getChannels == 1 + id % 2)
    }
    // truncated/corrupt payloads fall through to None, never throw
    assert(Multimodal.WavCodec.decode(Array[Byte]('R', 'I', 'F', 'F')).isEmpty)
    assert(Multimodal.WavCodec.decode("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    assert(Multimodal.WavCodec.decode("plain text".getBytes).isEmpty)
    // the default chain: PNG bytes hit ImageIoCodec, WAV bytes WavCodec
    val png = Multimodal.withPngPayload(Seq(3L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    assert(Multimodal.DefaultCodec.decode(png).exists(_._3 == "image/png"))
    assert(Multimodal.DefaultCodec.decode(rows(1L)).exists(_._3 == "audio/wav"))
  }

  test("migration ops: rename/cast/delete semantics and refusals") {
    import graft.storage.{Eav, LayerStore, Migration}
    import org.apache.spark.sql.functions.col
    def tmp() = java.nio.file.Files.createTempDirectory("graft-migr").toString
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Eav.schema)
    val st = LayerStore.open(spark, tmp())
    st.commit("main", triples(
      (":a", "rdf:type", ":Thing"), (":a", "age", "30"), (":a", "name", "x"),
      (":b", "rdf:type", ":Thing"), (":b", "age", "31"), (":b", "name", "y")),
      empty, "seed")

    // cast string → integer rewrites every instance row, typed
    Migration.migrate(st, "main", Seq(Migration.CastProperty("age", "xsd:integer")))
    val afterCast = st.materializeBranch("main")
    val ages = afterCast.filter(col("p") === "age")
      .select("o_lng", "o_typ").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ages == Set((30L, "xsd:integer"), (31L, "xsd:integer")))

    // uncastable values refuse and name an offender
    st.commit("main", triples((":c", "bad", "not-a-number")), empty, "bad")
    val e = intercept[IllegalArgumentException] {
      Migration.migrate(st, "main", Seq(Migration.CastProperty("bad", "xsd:integer")))
    }
    assert(e.getMessage.contains("uncastable"))

    // rename moves instance rows; delete_property drops them
    Migration.migrate(st, "main", Seq(
      Migration.RenameProperty("name", "rdfs:label"),
      Migration.DeleteProperty("bad")))
    val head = st.materializeBranch("main")
    assert(head.filter(col("p") === "name").isEmpty)
    assert(head.filter(col("p") === "rdfs:label").count() == 2)
    assert(head.filter(col("p") === "bad").isEmpty)

    // delete_class refuses while instances remain; force drops subgraphs
    val e2 = intercept[IllegalArgumentException] {
      Migration.migrate(st, "main", Seq(Migration.DeleteClass(":Thing")))
    }
    assert(e2.getMessage.contains("instances remain"))
    Migration.migrate(st, "main", Seq(Migration.DeleteClass(":Thing", force = true)))
    val gone = st.materializeBranch("main")
    assert(gone.filter(col("s").isin(":a", ":b")).isEmpty)
  }

  test("capability catalog parses from JSON with built-in roles available") {
    import server.Capabilities._
    val cat = fromJson(
      """{"orgs":[{"name":"acme","dbs":["x"]}],
        | "roles":[{"name":"dbadmin","actions":["create_database","delete_database"]}],
        | "users":[{"name":"u","token":"t",
        |           "capabilities":[{"role":"dbadmin","scope":"org/acme"},
        |                           {"role":"reader","scope":"*"}]}]}""".stripMargin)
    val u = cat.user("t").get
    assert(cat.allows(u, Actions.CreateDb, "x"))
    assert(cat.allows(u, Actions.InstanceRead, "anything")) // built-in reader
    assert(!cat.allows(u, Actions.InstanceWrite, "x"))
    intercept[IllegalArgumentException] { fromJson("""{"users":[{"name":"u"}]}""") }
  }

  test("capability catalog: scope resolution and unknown-role refusal") {
    import server.Capabilities._
    val cat = Catalog(
      Seq(Org("acme", Set("x", "y"))),
      Seq(ReaderRole, AdminRole),
      Seq(User("u", "t", Seq(Capability("reader", "org/acme")))))
    val u = cat.user("t").get
    assert(cat.allows(u, Actions.InstanceRead, "x"))
    assert(cat.allows(u, Actions.InstanceRead, "y"))
    assert(!cat.allows(u, Actions.InstanceRead, "z"))    // not in org
    assert(!cat.allows(u, Actions.InstanceWrite, "x"))   // reader role
    assert(cat.user("nope").isEmpty)
    intercept[IllegalArgumentException] {
      Catalog(Nil, Nil, Seq(User("u", "t", Seq(Capability("ghost", "*")))))
    }
    intercept[IllegalArgumentException] { Role("bad", Set("not_an_action")) }
  }

  test("local clustering coefficient on K3 plus a pendant") {
    import spark.implicits._
    // triangle 1-2-3, pendant 4 on node 1: deg(1)=3 so only 1 of its
    // 3 neighbor pairs closes (333333 micro); 2 and 3 are fully
    // clustered (1000000 micro)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = operators.Triangles.localClustering(g, 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 3L, 333333L)),
      2L -> ((1L, 2L, 1000000L)),
      3L -> ((1L, 2L, 1000000L))))
  }

  test("assortativity matches the brute Pearson on known graphs") {
    import spark.implicits._
    def brute(es: Seq[(Long, Long)]): Double = {
      val deg = es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val xs = es.flatMap { case (a, b) =>
        Seq((deg(a), deg(b)), (deg(b), deg(a))) }
      val n = xs.size.toDouble
      val s1 = xs.map(_._1).sum.toDouble
      val s2 = xs.map(p => p._1 * p._1).sum.toDouble
      val sxy = xs.map(p => p._1 * p._2).sum.toDouble
      val den = n * s2 - s1 * s1
      if (den == 0) 0.0 else (n * sxy - s1 * s1) / den
    }
    // star K1,3: perfectly disassortative (r = -1)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val gotStar = operators.Triangles.assortativity(
      star.toDF("a", "b")).collect()(0)
    assert(gotStar.getAs[Double]("assortativity") == -1.0)
    // path graph 1-2-3-4 + pendant 3-5: mixed degrees
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L))
    val got = operators.Triangles.assortativity(g.toDF("a", "b")).collect()(0)
    assert(got.getAs[Long]("n_ends") == 8L)
    assert(math.abs(got.getAs[Double]("assortativity") -
      math.rint(brute(g) * 1e6) / 1e6) < 1e-9)
    // 4-cycle: regular graph, zero variance → guarded 0.0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val gotCyc = operators.Triangles.assortativity(
      cyc.toDF("a", "b")).collect()(0)
    assert(gotCyc.getAs[Double]("assortativity") == 0.0)
  }
}
