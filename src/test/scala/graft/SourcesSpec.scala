package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.Turtle
import graft.storage.{Eav, LayerStore, Updates}
import graft.streaming.Ingest

/** Turtle round-trip, WOQL JSON parsing, update staging, and streaming
  * triple ingestion. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("turtle parses prefixes, literals, ; and , syntax") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |ex:a a ex:Person ;
        |  ex:name "Ada" ;
        |  ex:age 36 ;
        |  ex:score 4.5 ;
        |  ex:tags "x", "y" ;
        |  ex:alive true .
        |ex:b ex:knows ex:a .
        |ex:c ex:label "hola"@es .
        |ex:d ex:height "1.88"^^xsd:double .
        |""".stripMargin
    val df = Turtle.load(spark, ttl)
    assert(df.count() == 10)
    assert(df.filter(col("p") === "http://ex.org/tags").count() == 2)
    assert(df.filter(col("p") === "rdf:type")
      .head().getString(4) == "http://ex.org/Person")
    assert(df.filter(col("p") === "http://ex.org/age").head().getLong(8) == 36L)
    assert(df.filter(col("p") === "http://ex.org/label").head().getString(11) == "es")
    assert(df.filter(col("p") === "http://ex.org/height").head().getDouble(7) == 1.88)
  }

  test("turtle parses SPARQL directives, single-quoted strings, unicode escapes") {
    val sq3 = "'''"
    val ttl =
      s"""PREFIX ex: <http://ex.org/>
         |BASE <http://ex.org/>
         |ex:a ex:name 'Ada' ;
         |  ex:memo ${sq3}it's
         |a 'quoted' memo${sq3} ;
         |  ex:uni "snow\\u2603man" ;
         |  ex:astral "g\\U0001F600clef" .
         |""".stripMargin
    val df = Turtle.load(spark, ttl)
    def str(p: String) =
      df.filter(col("p") === s"http://ex.org/$p").head().getString(6)
    assert(str("name") == "Ada")
    assert(str("memo") == "it's\na 'quoted' memo")
    assert(str("uni") == "snow☃man")
    assert(str("astral") == "g" + new String(Character.toChars(0x1F600)) + "clef")
  }

  test("turtle resolves relative IRIs against @base") {
    val ttl =
      """@base <http://ex.org/data/page> .
        |@prefix r: <rel/> .
        |<x> <p> <#frag> .
        |<x> r:q </root> .
        |""".stripMargin
    val df = Turtle.load(spark, ttl)
    def obj(p: String) =
      df.filter(col("p") === p).head().getString(4)
    assert(df.filter(col("s") === "http://ex.org/data/x").count() == 2)
    assert(obj("http://ex.org/data/p") == "http://ex.org/data/page#frag")
    // relative @prefix IRI resolves against base too, then expands
    assert(obj("http://ex.org/data/rel/q") == "http://ex.org/root")
  }

  test("turtle parses long strings, blank-node labels and [ ] property lists") {
    val tq = "\"\"\""
    val ttl =
      s"""@prefix ex: <http://ex.org/> .
         |ex:a ex:note ${tq}line one
         |line "two"
         |${tq} .
         |_:b1 ex:knows ex:a .
         |ex:c ex:addr [ ex:city "Oslo" ; ex:zip 1234 ] .
         |[ ex:name "anon" ] .
         |""".stripMargin
    val df = Turtle.load(spark, ttl)
    val note = df.filter(col("p") === "http://ex.org/note").head().getString(6)
    assert(note == "line one\nline \"two\"\n")
    // labeled blank node stays an opaque node id
    val kn = df.filter(col("p") === "http://ex.org/knows").head()
    assert(kn.getString(1) == "_:b1" && kn.getString(4) == "http://ex.org/a")
    // [ ... ] object: fresh blank subject carries the inner properties
    val addr = df.filter(col("p") === "http://ex.org/addr").head().getString(4)
    assert(addr.startsWith("_:gb"))
    assert(df.filter(col("s") === addr && col("p") === "http://ex.org/city")
      .head().getString(6) == "Oslo")
    assert(df.filter(col("s") === addr && col("p") === "http://ex.org/zip")
      .head().getLong(8) == 1234L)
    // [ ... ] as a whole statement: anonymous subject
    assert(df.filter(col("p") === "http://ex.org/name")
      .head().getString(1).startsWith("_:gb"))
  }

  test("turtle parses RDF collections to rdf:first/rest/nil chains") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |ex:s ex:vals (1 "two" ex:three) .
        |ex:s ex:empty () .
        |ex:s ex:nested ((4) 5) .
        |""".stripMargin
    val df = Turtle.load(spark, ttl)
    def one(s: String, p: String) =
      df.filter(col("s") === s && col("p") === p).head()
    // walk the chain: head cell holds 1, rest → "two", rest → ex:three, rest → nil
    val c1 = one("http://ex.org/s", "http://ex.org/vals").getString(4)
    assert(c1.startsWith("_:gb"))
    assert(one(c1, "rdf:first").getLong(8) == 1L)
    val c2 = one(c1, "rdf:rest").getString(4)
    assert(one(c2, "rdf:first").getString(6) == "two")
    val c3 = one(c2, "rdf:rest").getString(4)
    assert(one(c3, "rdf:first").getString(4) == "http://ex.org/three")
    assert(one(c3, "rdf:rest").getString(4) == "rdf:nil")
    // () is the node rdf:nil itself
    assert(one("http://ex.org/s", "http://ex.org/empty").getString(4) == "rdf:nil")
    // nested collection: first cell's rdf:first is itself a chain head
    val n1 = one("http://ex.org/s", "http://ex.org/nested").getString(4)
    val inner = one(n1, "rdf:first").getString(4)
    assert(inner.startsWith("_:gb"))
    assert(one(inner, "rdf:first").getLong(8) == 4L)
    assert(one(inner, "rdf:rest").getString(4) == "rdf:nil")
    val n2 = one(n1, "rdf:rest").getString(4)
    assert(one(n2, "rdf:first").getLong(8) == 5L)
    assert(one(n2, "rdf:rest").getString(4) == "rdf:nil")
  }

  test("turtle dump → parse round-trips") {
    val ttl = """<s:1> <p:name> "v" . <s:1> <p:n> 3 . <s:2> <p:x> <s:1> ."""
    val df = Turtle.load(spark, ttl)
    val again = Turtle.load(spark, Turtle.dump(df))
    assert(again.collect().toSet == df.collect().toSet)
  }

  test("dump escapes control characters so statements stay line-delimited") {
    // a raw newline/tab/quote inside a literal must leave as \n-style
    // escapes — the distributed dump is one statement per text line
    val ttl = "<s:1> <p:v> \"line1\\nline2\\ttab \\\"q\\\" end\" ."
    val df = Turtle.load(spark, ttl)
    assert(df.head().getString(6) == "line1\nline2\ttab \"q\" end")
    val dumped = Turtle.dump(df)
    assert(!dumped.dropRight(1).contains('\n'), s"raw newline in dump: $dumped")
    val again = Turtle.load(spark, dumped)
    assert(again.collect().toSet == df.collect().toSet)
  }

  test("turtle decimal literals round-trip exactly through the dec slot") {
    val ttl = """<s:1> <p:amt> 12.34 . <s:2> <p:amt> "99.990000000000000001"^^xsd:decimal ."""
    val df = Turtle.load(spark, ttl)
    assert(df.filter(col("o_typ") === "xsd:decimal").count() == 2)
    val vals = df.select(col("o_dec").cast("string")).collect().map(_.getString(0)).toSet
    assert(vals == Set("12.340000000000000000", "99.990000000000000001"))
    val again = Turtle.load(spark, Turtle.dump(df))
    assert(again.collect().toSet == df.collect().toSet)
  }

  test("distributed dump (write.text) equals the in-memory dump") {
    val df = Turtle.load(spark,
      """<s:1> <p:name> "v" . <s:1> <p:n> 3 . <s:1> <p:d> 1.5 .""")
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    Turtle.dumpTo(df, s"$dir/out")
    val lines = spark.read.text(s"$dir/out").collect().map(_.getString(0)).toSet
    assert(lines == Turtle.dump(df).split("\n").toSet)
  }

  test("when-driven insert stages only for Cond solutions") {
    val g = triples((":a", "cls", "x"), (":b", "cls", "x"), (":c", "cls", "y"))
    implicit val ctx: Ctx = ctxOf(g)
    // when(S is class x, bind tag) — :c passes through with Tag unbound,
    // so the insert template (S, tag, Tag) stages nothing for it
    val q = And(Seq(
      TriplePat(V("S"), Node("cls"), V("C")),
      WhenQ(Eq(V("C"), Str("x")), Eq(V("T"), Str("hit")))))
    val (adds, removes) = Updates.stage(q,
      inserts = Seq((V("S"), Node("tag"), V("T"))))
    assert(removes.count() == 0)
    val tagged = adds.select("s").collect().map(_.getString(0)).toSet
    assert(tagged == Set(":a", ":b"))
  }

  test("json woql parses and compiles the full operator surface") {
    val q = JsonWoql.parse(
      """{"@type":"Select","variables":["X"],"query":
        |{"@type":"And","and":[
        | {"@type":"Triple","subject":{"variable":"X"},"predicate":{"node":"knows"},"object":{"variable":"Y"}},
        | {"@type":"Not","query":{"@type":"Triple","subject":{"variable":"X"},"predicate":{"node":"name"},"object":{"variable":"N"}}}
        |]}}""".stripMargin)
    val g = triples((":a", "knows", ":b"), (":a", "name", "x"), (":c", "knows", ":a"))
    val res = Compiler.run(q)(ctxOf(g)).collect()
    assert(res.map(_.getStruct(0).getString(1)).toSet == Set(":c"))
  }

  test("json woql parses path + eval + group_by shapes") {
    val p = JsonWoql.parse(
      """{"@type":"Path","subject":{"variable":"X"},
        | "pattern":{"@type":"PathPlus","plus":{"@type":"PathPredicate","predicate":"e"}},
        | "object":{"variable":"Y"}}""".stripMargin)
    assert(p == PathQ(V("X"), PPlus(PPred("e")), V("Y")))
    val e = JsonWoql.parse(
      """{"@type":"Eval","expression":{"@type":"Times","left":{"variable":"A"},
        | "right":{"data":{"@type":"xsd:decimal","@value":2.0}}},"result":"R"}""".stripMargin)
    assert(e == Eval(ABin("*", ATerm(V("A")), ATerm(Dbl(2.0))), "R"))
  }

  test("get resolves inline POST-body and http URL resources") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    // inline: the reference's posted-file form
    val inline = Compiler.run(GetCsv(Seq(("A", "a"), ("B", "b")),
      "inline:a,b\n1,x\n2,y"))
    assert(inline.collect().map(_.getAs[org.apache.spark.sql.Row]("A")
      .getAs[String]("str")).toSet == Set("1", "2"))
    // http: serve the same CSV from a local endpoint (JDK HttpServer)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body = "a,b\n3,z\n".getBytes("UTF-8")
    server.createContext("/data.csv", exchange => {
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body); exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val viaHttp = Compiler.run(GetCsv(Seq(("A", "a")),
        s"http://127.0.0.1:$port/data.csv"))
      assert(viaHttp.collect().map(_.getAs[org.apache.spark.sql.Row]("A")
        .getAs[String]("str")).toSet == Set("3"))
    } finally server.stop(0)
  }

  test("get over a turtle resource binds one solution per triple, typed") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:name "alice" ; ex:age 30 .
        |ex:a ex:knows ex:b .""".stripMargin
    val got = Compiler.run(GetTurtle("S", "P", "O", "inline:" + ttl))
    val rows = got.collect().map { r =>
      val o = r.getAs[org.apache.spark.sql.Row]("O")
      (r.getAs[org.apache.spark.sql.Row]("S").getAs[String]("iri"),
        r.getAs[org.apache.spark.sql.Row]("P").getAs[String]("iri"),
        Option(o.getAs[String]("iri")).orElse(Option(o.getAs[String]("str")))
          .getOrElse(o.getAs[Any]("lng").toString))
    }.toSet
    assert(rows == Set(
      ("http://ex.org/a", "http://ex.org/name", "alice"),
      ("http://ex.org/a", "http://ex.org/age", "30"),
      ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b")))
    // file resource form
    val f = java.nio.file.Files.createTempFile("graft-get", ".ttl")
    java.nio.file.Files.writeString(f, ttl)
    val viaFile = Compiler.run(GetTurtle("S", "P", "O", f.toString))
    assert(viaFile.count() == 3)
  }

  test("get over a JSON-lines resource binds named fields per object") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    val got = Compiler.run(GetJson(Seq(("A", "a"), ("B", "b")),
      "inline:{\"a\":1,\"b\":\"x\"}\n{\"a\":2,\"b\":\"y\"}"))
    val rows = got.collect().map(r =>
      r.getAs[org.apache.spark.sql.Row]("A").getAs[String]("str") ->
        r.getAs[org.apache.spark.sql.Row]("B").getAs[String]("str")).toMap
    assert(rows == Map("1" -> "x", "2" -> "y"))
  }

  test("get over an XML resource binds named child elements per row") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    val got = Compiler.run(GetXml(Seq(("A", "a"), ("B", "b")),
      "inline:<rows><r><a>1</a><b>x</b></r><r><a>2</a><b>y</b></r></rows>",
      rowTag = "r"))
    val rows = got.collect().map(r =>
      r.getAs[org.apache.spark.sql.Row]("A").getAs[String]("str") ->
        r.getAs[org.apache.spark.sql.Row]("B").getAs[String]("str")).toMap
    assert(rows == Map("1" -> "x", "2" -> "y"))
  }

  test("get parses RFC-4180 quoted fields with embedded newlines") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    // a quoted field containing a literal newline — line-splitting parsers
    // corrupt this record; the landed multiLine parse must not
    val got = Compiler.run(GetCsv(Seq(("A", "a"), ("B", "b")),
      "inline:a,b\n1,\"first\nsecond\"\n2,plain"))
    val byA = got.collect().map(r =>
      r.getAs[org.apache.spark.sql.Row]("A").getAs[String]("str") ->
        r.getAs[org.apache.spark.sql.Row]("B").getAs[String]("str")).toMap
    assert(byA == Map("1" -> "first\nsecond", "2" -> "plain"))
  }

  test("http get streams a large payload to storage (no driver String)") {
    implicit val ctx: Ctx = ctxOf(triples((":x", "p", "v")))
    val rows = 50000
    val body = ("a,b\n" + (1 to rows).map(i => s"$i,val_$i\n").mkString)
      .getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/big.csv", exchange => {
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body); exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val viaHttp = Compiler.run(GetCsv(Seq(("A", "a")),
        s"http://127.0.0.1:$port/big.csv"))
      assert(viaHttp.count() == rows)
      // the landed file is on (shared) storage, not in a driver String
      val landed = new java.io.File(graft.sources.Resources.landingDir)
      assert(landed.listFiles().exists(_.getName.startsWith("res_http_")))
    } finally server.stop(0)
  }

  test("v3 JSON-LD parses eval, path, group_by, order_by") {
    val ev = JsonWoqlV3.parse(
      """{"@type":"woql:Eval","woql:result":{"@type":"woql:Variable","woql:variable_name":"R"},
        | "woql:expression":{"@type":"woql:Plus",
        |  "woql:first":{"@type":"woql:ArithmeticValue","woql:arithmetic_value":
        |    {"@type":"woql:Variable","woql:variable_name":"A"}},
        |  "woql:second":{"@type":"woql:ArithmeticValue","woql:arithmetic_value":
        |    {"@type":"woql:Datatype","woql:datatype":{"@value":2,"@type":"xsd:integer"}}}}}""".stripMargin)
    assert(ev == Eval(ABin("+", ATerm(V("A")), ATerm(Lng(2))), "R"))

    val p = JsonWoqlV3.parse(
      """{"@type":"woql:Path",
        | "woql:subject":{"@type":"woql:Variable","woql:variable_name":"X"},
        | "woql:path_pattern":{"@type":"woql:PathPlus",
        |   "woql:path_pattern":{"@type":"woql:PathSequence",
        |     "woql:path_first":{"@type":"woql:PathPredicate","woql:path_predicate":"e"},
        |     "woql:path_second":{"@type":"woql:InversePathPredicate","woql:path_predicate":"f"}}},
        | "woql:object":{"@type":"woql:Variable","woql:variable_name":"Y"},
        | "woql:path":{"@type":"woql:Variable","woql:variable_name":"W"}}""".stripMargin)
    assert(p == PathQ(V("X"), PPlus(PSeq(PPred("e"), PInv("f"))), V("Y"), Some("W")))

    val g = JsonWoqlV3.parse(
      """{"@type":"woql:GroupBy",
        | "woql:group_by":[{"@type":"woql:VariableListElement","woql:index":{"@value":0},
        |   "woql:variable_name":{"@value":"K","@type":"xsd:string"}}],
        | "woql:group_template":[{"@type":"woql:VariableListElement","woql:index":{"@value":0},
        |   "woql:variable_name":{"@value":"V","@type":"xsd:string"}}],
        | "woql:query":{"@type":"woql:Triple",
        |   "woql:subject":{"@type":"woql:Variable","woql:variable_name":"V"},
        |   "woql:predicate":{"@type":"woql:Node","woql:node":"p"},
        |   "woql:object":{"@type":"woql:Variable","woql:variable_name":"K"}},
        | "woql:grouped":{"@type":"woql:Variable","woql:variable_name":"G"}}""".stripMargin)
    assert(g == GroupBy(Seq("V"), Seq("K"),
      TriplePat(V("V"), Node("p"), V("K")), "G"))

    val ob = JsonWoqlV3.parse(
      """{"@type":"woql:OrderBy",
        | "woql:variable_ordering":[
        |  {"@type":"woql:VariableOrdering","woql:index":{"@value":0},
        |   "woql:variable":{"@type":"woql:Variable","woql:variable_name":"A"},
        |   "woql:ascending":{"@value":false,"@type":"xsd:boolean"}},
        |  {"@type":"woql:VariableOrdering","woql:index":{"@value":1},
        |   "woql:variable":{"@type":"woql:Variable","woql:variable_name":"B"}}],
        | "woql:query":{"@type":"woql:True"}}""".stripMargin)
    assert(ob == OrderBy(Seq(("A", false), ("B", true)), True))
  }

  test("v3 parseUpdate collects add/delete templates from the tree") {
    val (q, adds, dels) = JsonWoqlV3.parseUpdate(
      """{"@type":"woql:And","woql:query_list":[
        | {"@type":"woql:QueryListElement","woql:index":{"@value":0},
        |  "woql:query":{"@type":"woql:Triple",
        |   "woql:subject":{"@type":"woql:Variable","woql:variable_name":"S"},
        |   "woql:predicate":{"@type":"woql:Node","woql:node":"name"},
        |   "woql:object":{"@type":"woql:Variable","woql:variable_name":"N"}}},
        | {"@type":"woql:QueryListElement","woql:index":{"@value":1},
        |  "woql:query":{"@type":"woql:AddTriple",
        |   "woql:subject":{"@type":"woql:Variable","woql:variable_name":"S"},
        |   "woql:predicate":{"@type":"woql:Node","woql:node":"tag"},
        |   "woql:object":{"@type":"woql:Datatype","woql:datatype":{"@value":"x","@type":"xsd:string"}}}},
        | {"@type":"woql:QueryListElement","woql:index":{"@value":2},
        |  "woql:query":{"@type":"woql:DeleteTriple",
        |   "woql:subject":{"@type":"woql:Variable","woql:variable_name":"S"},
        |   "woql:predicate":{"@type":"woql:Node","woql:node":"old"},
        |   "woql:object":{"@type":"woql:Variable","woql:variable_name":"N"}}}]}""".stripMargin)
    assert(q == And(Seq(TriplePat(V("S"), Node("name"), V("N")), True, True)))
    assert(adds == Seq((V("S"), Node("tag"), Str("x"))))
    assert(dels == Seq((V("S"), Node("old"), V("N"))))
    // drive the collected templates through the engine's staging path
    implicit val ctx: Ctx = ctxOf(triples((":a", "name", "alice")))
    val (ins, rm) = graft.storage.Updates.stage(q, adds, dels)
    assert(ins.count() == 1 && rm.count() == 1)
  }

  test("v3 JSON-LD wire format parses to the same AST") {
    val v3 =
      """{"@type":"woql:Select",
        | "woql:variable_list":[
        |  {"@type":"woql:VariableListElement","woql:index":{"@value":0,"@type":"xsd:nonNegativeInteger"},
        |   "woql:variable_name":{"@value":"Name","@type":"xsd:string"}}],
        | "woql:query":{"@type":"woql:And","woql:query_list":[
        |  {"@type":"woql:QueryListElement","woql:index":{"@value":1,"@type":"xsd:nonNegativeInteger"},
        |   "woql:query":{"@type":"woql:Greater",
        |    "woql:left":{"@type":"woql:Variable","woql:variable_name":{"@value":"Age","@type":"xsd:string"}},
        |    "woql:right":{"@type":"woql:Datatype","woql:datatype":{"@value":35,"@type":"xsd:integer"}}}},
        |  {"@type":"woql:QueryListElement","woql:index":{"@value":0,"@type":"xsd:nonNegativeInteger"},
        |   "woql:query":{"@type":"woql:Triple",
        |    "woql:subject":{"@type":"woql:Variable","woql:variable_name":{"@value":"X","@type":"xsd:string"}},
        |    "woql:predicate":{"@type":"woql:Node","woql:node":"age"},
        |    "woql:object":{"@type":"woql:Variable","woql:variable_name":{"@value":"Age","@type":"xsd:string"}}}}
        | ]}}""".stripMargin
    val q = JsonWoqlV3.parse(v3)
    // query_list is ordered by woql:index, not array position
    assert(q == Select(Seq("Name"), And(Seq(
      TriplePat(V("X"), Node("age"), V("Age")),
      Cmp(">", V("Age"), Lng(35))))))
    val g = triples((":a", "age", 40), (":a", "name", "alice"), (":b", "age", 30))
    val full = And(Seq(
      TriplePat(V("X"), Node("age"), V("Age")),
      Cmp(">", V("Age"), Lng(35)),
      TriplePat(V("X"), Node("name"), V("Name"))))
    val res = Compiler.run(Select(Seq("Name"), full))(ctxOf(g)).collect()
    assert(res.map(_.getAs[org.apache.spark.sql.Row]("Name")
      .getAs[String]("str")).toSet == Set("alice"))
  }

  test("updates stage insert templates per solution and commit") {
    val g = triples((":a", "cls", "x"), (":b", "cls", "x"), (":c", "cls", "y"))
    implicit val ctx: Ctx = ctxOf(g)
    val q = And(Seq(TriplePat(V("S"), Node("cls"), Str("x"))))
    val (adds, removes) = Updates.stage(q,
      inserts = Seq((V("S"), Node("tag"), Str("hit"))))
    assert(adds.count() == 2 && removes.count() == 0)
    assert(adds.select("p").distinct().head().getString(0) == "tag")
    val st = LayerStore.open(spark,
      java.nio.file.Files.createTempDirectory("graft-upd").toString)
    val cid = st.commit("main", adds, removes, "tagging")
    assert(st.materialize(cid).count() == 2)
  }

  test("streaming ingestion lands one commit per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    // stage some triple parquet as the stream source
    val t = triples((":a", "p", "v1"), (":b", "p", "v2"), (":c", "p", "v3"))
    t.write.mode("overwrite").parquet(s"$dir/src")
    val st = LayerStore.open(spark, s"$dir/store")
    val stream = spark.readStream.schema(Eav.schema).parquet(s"$dir/src")
    val q = Ingest.streamIntoStore(stream, st, "main")
    q.awaitTermination(60000)
    assert(st.refs.contains("main"))
    assert(st.materializeBranch("main").count() == 3)
  }

  test("turtle long string closes greedily; unterminated input raises") {
    val tq = "\"\"\""
    // content ending in an unescaped quote: the closing delimiter is the
    // LAST three of the four quotes, so """ab"""" has content ab"
    val df = Turtle.load(spark,
      s"""<http://e/a> <http://e/v> ${tq}ab$tq" .""")
    assert(df.head().getString(6) == "ab\"")
    // double quotes INSIDE long-string content survive
    val df2 = Turtle.load(spark,
      s"""<http://e/a> <http://e/v> ${tq}x""y$tq .""")
    assert(df2.head().getString(6) == "x\"\"y")
    val e1 = intercept[IllegalArgumentException] {
      Turtle.load(spark, s"<http://e/a> <http://e/v> ${tq}never closed")
    }
    assert(e1.getMessage.contains("unterminated"))
    val e2 = intercept[IllegalArgumentException] {
      Turtle.load(spark, "<http://e/a> <http://e/v> \"no close")
    }
    assert(e2.getMessage.contains("unterminated"))
  }

  test("repeated inline get reuses one content-addressed landed file") {
    import graft.sources.Resources
    val content = "a,b\n7,seven\n8,eight"
    assert(Resources.csv(spark, s"inline:$content", header = true).count() == 2)
    val dir = new java.io.File(Resources.landingDir)
    val countForKey = () => dir.listFiles()
      .count(f => f.getName.startsWith("res_inline_") && {
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == content
      })
    assert(countForKey() == 1)
    // second get of the SAME content: no new file, same landed path reused
    assert(Resources.csv(spark, s"inline:$content", header = true).count() == 2)
    assert(countForKey() == 1)
    // no stray temp files left behind
    assert(!dir.listFiles().exists(_.getName.endsWith(".tmp")))
  }
}
