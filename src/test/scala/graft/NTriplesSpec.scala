package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{NTriples, Turtle}

class NTriplesSpec extends AnyFunSuite {
  import TestSpark._

  private def lines(ls: String*) = {
    import spark.implicits._
    ls.toDF("value")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "s", "p", "o_kind", "o_iri", "o_typ", "o_str", "o_lng",
        "o_dbl", "o_bool", "o_lang")
      .collect().map(_.toSeq).toSet

  test("terms: iri / bnode / typed / lang / bare literals parse") {
    val df = NTriples.fromLines(lines(
      "<s:a> <p:x> <o:b> .",
      "_:b1 <p:x> _:b2 .",
      "<s:a> <p:n> \"42\"^^<xsd:integer> .",
      "<s:a> <p:d> \"1.25\"^^<http://www.w3.org/2001/XMLSchema#double> .",
      "<s:a> <p:f> \"true\"^^<xsd:boolean> .",
      "<s:a> <p:s> \"hi\" .",
      "<s:a> <p:l> \"bonjour\"@fr-CA .",
      "<s:a> <p:t> \"2024-01-01\"^^<xsd:date> ."))
    val got = rows(df)
    assert(got.contains(Seq("instance", "s:a", "p:x", "i", "o:b",
      null, null, null, null, null, null)))
    assert(got.contains(Seq("instance", "_:b1", "p:x", "i", "_:b2",
      null, null, null, null, null, null)))
    assert(got.contains(Seq("instance", "s:a", "p:n", "l", null,
      "xsd:integer", null, 42L, null, null, null)))
    // full XSD IRI datatype normalizes to the store's prefixed form
    assert(got.contains(Seq("instance", "s:a", "p:d", "l", null,
      "xsd:double", null, null, 1.25, null, null)))
    assert(got.contains(Seq("instance", "s:a", "p:f", "l", null,
      "xsd:boolean", null, null, null, true, null)))
    assert(got.contains(Seq("instance", "s:a", "p:s", "l", null,
      "xsd:string", "hi", null, null, null, null)))
    assert(got.contains(Seq("instance", "s:a", "p:l", "l", null,
      "xsd:string", "bonjour", null, null, null, "fr-CA")))
    // non-core datatype keeps its (non-normalizable) name + string value
    assert(got.contains(Seq("instance", "s:a", "p:t", "l", null,
      "xsd:date", "2024-01-01", null, null, null, null)))
  }

  test("escapes: ECHAR + \\u + \\U (astral) unescape; invalid pass through") {
    val df = NTriples.fromLines(lines(
      """<s:a> <p:s> "q\"b\\s\nn\ttAu\U0001F600g" .""",
      """<s:a> <p:b> "bad\qkeep" ."""))
    val got = df.select("p", "o_str").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("p:s") == "q\"b\\s\nn\ttAu😀g")
    assert(got("p:b") == "bad\\qkeep")
  }

  test("blank lines, comments (full-line + trailing) and CRLF are accepted") {
    val df = NTriples.fromLines(lines(
      "", "   ", "# a comment",
      "<s:a> <p:x> <o:b> . # trailing",
      "<s:a> <p:y> <o:c> .\r"))
    assert(df.count() == 2)
  }

  test("tab-indented statements/comments parse (W3C whitespace is tab|space)") {
    val df = NTriples.fromLines(lines(
      "\t<s:a> <p:x> <o:b> .",
      "\t# tab-indented comment", "\t", "\t \t",
      " \t <s:a> <p:y> <o:c> .\t"))
    assert(df.count() == 2)
  }

  test("strict mode raises naming the bad line; permissive drops it") {
    val bad = lines("<s:a> <p:x> <o:b> .", "not a triple at all")
    val err = intercept[Exception] {
      NTriples.fromLines(bad, strict = true).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("not a triple at all")))
    assert(NTriples.fromLines(bad, strict = false).count() == 1)
    // triples mode must NOT accept a 4th (graph) term
    val quad = lines("<s:a> <p:x> <o:b> <g:g> .")
    assert(NTriples.fromLines(quad, strict = false).count() == 0)
  }

  test("nquads: graph term lands in g; absent term takes the default") {
    val df = NTriples.fromLines(lines(
      "<s:a> <p:x> <o:b> <g:one> .",
      "_:s <p:x> \"v\" _:g2 .",
      "<s:a> <p:y> <o:c> ."), defaultGraph = "main", quads = true)
    val byG = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("g:one" -> 1L, "_:g2" -> 1L, "main" -> 1L))
  }

  test("turtle-compat: bare numeric/boolean tokens take turtle's types") {
    val df = NTriples.fromLines(lines(
      "<s:a> <p:i> 42 .",
      "<s:a> <p:neg> -7 .",
      "<s:a> <p:dec> 1.5 .",
      "<s:a> <p:dbl> 2e3 .",
      "<s:a> <p:b> true ."))
    val got = df.select("p", "o_typ").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("p:i" -> "xsd:integer", "p:neg" -> "xsd:integer",
      "p:dec" -> "xsd:decimal", "p:dbl" -> "xsd:double",
      "p:b" -> "xsd:boolean"))
    assert(df.filter(col("p") === "p:i").select("o_lng")
      .collect().head.getLong(0) == 42L)
    // Turtle.dumpTo output (compact literals) re-ingests distributed
    val ttl = Turtle.load(spark,
      """<s:a> <p:n> 42 . <s:a> <p:d> 1.5 . <s:a> <p:b> true .""")
    val back = NTriples.fromLines(Turtle.dumpLines(ttl))
    assert(rows(back) == rows(ttl))
  }

  test("canonical dump expands xsd: datatypes to full XML-Schema IRIs") {
    val src = NTriples.fromLines(lines(
      "<s:a> <p:n> \"42\"^^<xsd:integer> .",
      "<s:a> <p:t> \"2024-01-01\"^^<xsd:date> ."))
    val dumped = NTriples.dumpLines(src).collect().map(_.getString(0)).toSet
    // external RDF tools must see the real datatype IRI, not <xsd:...>
    assert(dumped.exists(_.contains(
      "^^<http://www.w3.org/2001/XMLSchema#integer>")))
    assert(dumped.exists(_.contains(
      "^^<http://www.w3.org/2001/XMLSchema#date>")))
    assert(!dumped.exists(_.contains("<xsd:")))
    // and the graft reader normalizes them straight back (round-trip law)
    val back = NTriples.fromLines(NTriples.dumpLines(src))
    assert(rows(back) == rows(src))
  }

  test("dump/read round-trip equals Turtle.parse on the same statements") {
    val ttl =
      """<s:a> <p:n> "42"^^<xsd:integer> .
        |<s:a> <p:s> "line\nbreak\t\"q\" \\" .
        |<s:a> <p:l> "salut"@fr .
        |<s:a> <p:d> "2.5"^^<xsd:double> .
        |<s:a> <p:x> <o:b> .""".stripMargin
    val fromTurtle = Turtle.load(spark, ttl)
    val dumped = NTriples.dumpLines(fromTurtle)
    val back = NTriples.fromLines(dumped)
    assert(rows(back) == rows(fromTurtle))
  }

  test("quad dump/read round-trip preserves the graph column") {
    val ttl =
      """<s:a> <p:n> "42"^^<xsd:integer> .
        |<s:a> <p:s> "x\ny" .""".stripMargin
    val quads = Turtle.load(spark, ttl).withColumn("g",
      when(col("p") === "p:n", lit("g:audit")).otherwise(lit("instance")))
    val back = NTriples.fromLines(NTriples.dumpQuadLines(quads), quads = true)
    assert(rows(back) == rows(quads))
    assert(back.filter(col("g") === "g:audit").count() == 1)
  }

  test("reader plan is codegen'd column expressions (no UDF, no RDD)") {
    val df = NTriples.fromLines(lines("<s:a> <p:x> <o:b> ."))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
