package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Turtle, TurtleDist}

/** Distributed Turtle reader: statement grouping across line breaks,
  * directive preamble, blank salting, and equality with the driver
  * parser on the same document. */
class TurtleDistSpec extends AnyFunSuite {
  import TestSpark._

  private def writeDoc(text: String, parts: Int = 1): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    // split the document across `parts` files to exercise partition
    // boundaries (each file keeps whole lines, not whole statements)
    val lines = text.split("\n", -1).toSeq
    val per = math.max(1, (lines.size + parts - 1) / parts)
    lines.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"part-$i%05d.ttl"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "s", "p", "o_kind", "o_iri", "o_typ", "o_str", "o_lng",
        "o_bool").collect().map(_.toSeq).toSet

  private val doc =
    """@prefix c: <tpch:customer/> .
      |@prefix t: <tpch:> .
      |# a comment line
      |c:1 t:name "Alice" ;
      |    t:age 30 ;
      |    a t:Customer .
      |c:2 t:name "Bob \"quoted\"" ;
      |    t:vip true .
      |<tpch:customer/3> <tpch:ref> c:1 .
      |""".stripMargin

  test("multi-line `;` statements parse identically to the driver parser") {
    val dir = writeDoc(doc, parts = 1)
    assert(canon(TurtleDist.read(spark, dir)) == canon(Turtle.load(spark, doc)))
  }

  test("statements straddling file/partition boundaries reassemble") {
    // many small files: continuation lines land in different files
    // than their subjects; the global prefix-sum must stitch them
    val dir = writeDoc(doc, parts = 6)
    assert(canon(TurtleDist.read(spark, dir)) == canon(Turtle.load(spark, doc)))
  }

  test("single-line documents take the no-shuffle fast path and agree") {
    val flat = """@prefix t: <tpch:> .
                 |t:a t:p "v1" .
                 |t:b t:p 7 .
                 |t:c t:q t:a .""".stripMargin
    val dir = writeDoc(flat, parts = 2)
    assert(canon(TurtleDist.read(spark, dir)) == canon(Turtle.load(spark, flat)))
  }

  test("fresh blank labels are salted per statement (no cross-statement collision)") {
    val d2 = """@prefix t: <tpch:> .
               |t:x t:has [ t:v 1 ] .
               |t:y t:has [ t:v 2 ] .""".stripMargin
    val dir = writeDoc(d2, parts = 2)
    val got = TurtleDist.read(spark, dir)
    // two distinct anonymous blanks, each carrying one t:v triple
    val blanks = got.filter(col("p") === "tpch:has")
      .select("o_iri").collect().map(_.getString(0)).toSet
    assert(blanks.size == 2)
    val owners = got.filter(col("p") === "tpch:v")
      .select("s").collect().map(_.getString(0)).toSet
    assert(owners == blanks)
  }

  test("explicit _:labels keep document scope (shared across statements)") {
    val d3 = """@prefix t: <tpch:> .
               |t:x t:has _:shared .
               |_:shared t:v 5 .""".stripMargin
    val dir = writeDoc(d3, parts = 2)
    val got = TurtleDist.read(spark, dir)
    assert(got.filter(col("s") === "_:shared").count() == 1)
    assert(got.filter(col("o_iri") === "_:shared").count() == 1)
  }

  test("mid-document prefix redefinition is rejected, same-IRI repeats pass") {
    val bad = "@prefix t: <tpch:> .\nt:a t:p 1 .\n@prefix t: <other:> .\nt:b t:p 2 ."
    val e = intercept[IllegalArgumentException] {
      TurtleDist.read(spark, writeDoc(bad)).count()
    }
    assert(e.getMessage.contains("redefined"))
    val ok = "@prefix t: <tpch:> .\nt:a t:p 1 .\n@prefix t: <tpch:> .\nt:b t:p 2 ."
    assert(TurtleDist.read(spark, writeDoc(ok)).count() == 2)
  }

  test("raw-newline (long) literals parse distributedly, matching the driver") {
    val d = "@prefix t: <tpch:> .\nt:a t:p \"\"\"multi\nline \"quoted\" .\nthird\"\"\" .\nt:b t:p 'x' .\nt:c t:q '''also\nlong''' ."
    for (parts <- Seq(1, 4)) {
      val dir = writeDoc(d, parts = parts)
      assert(canon(TurtleDist.read(spark, dir)) == canon(Turtle.load(spark, d)),
        s"parts=$parts")
    }
    // the assembled literal really carries its newlines
    val got = TurtleDist.read(spark, writeDoc(d, parts = 4))
      .filter(col("s") === "tpch:a").select("o_str").collect()
    assert(got.head.getString(0) == "multi\nline \"quoted\" .\nthird")
  }

  test("a lone double-quote inside a long literal doesn't poison the read") {
    // from the wrong assumed scanner state this line is an unclosed
    // short literal — the three-machine pass must not throw for it
    val d = "@prefix t: <tpch:> .\nt:a t:p \"\"\"has a lone \" mark\nand more\"\"\" ."
    val dir = writeDoc(d, parts = 3)
    assert(canon(TurtleDist.read(spark, dir)) == canon(Turtle.load(spark, d)))
  }

  test("unterminated long literal raises a clean driver-side error") {
    val bad = "@prefix t: <tpch:> .\nt:a t:p \"\"\"never closed\nstill open ."
    val e = intercept[IllegalArgumentException] {
      TurtleDist.read(spark, writeDoc(bad)).count()
    }
    assert(e.getMessage.contains("long literal left open"))
  }

  test("strict file boundaries: a literal left open at file end names the file") {
    // default semantics: the directory is ONE logical document, so a
    // long literal MAY span part files (the dump's sharding); armed
    // strict mode treats files as independent documents and raises at
    // the first file that ends mid-literal, naming it
    val d = "@prefix t: <tpch:> .\nt:a t:p \"\"\"multi\nline \"quoted\" .\nthird\"\"\" .\nt:b t:p 'x' ."
    val dir = writeDoc(d, parts = 4) // long literal straddles files
    assert(TurtleDist.read(spark, dir).count() == 2) // default: fine
    sys.props("graft.turtle.strictFileBoundaries") = "true"
    try {
      val e = intercept[IllegalArgumentException] {
        TurtleDist.read(spark, dir).count()
      }
      assert(e.getMessage.contains("left open at end of file") &&
        e.getMessage.contains("part-"))
    } finally sys.props.remove("graft.turtle.strictFileBoundaries")
  }

  test("'#' and apostrophes inside IRIREFs don't break classification") {
    // fragment IRIs (…XMLSchema#integer) and an apostrophe inside <…>
    // were misread as comment-start / string-open by the r15 scanner
    val d = "@prefix t: <tpch:> .\n" +
      "t:a t:p \"5\"^^<http://www.w3.org/2001/XMLSchema#integer> .\n" +
      "t:b <tpch:o'brien#x> t:a .\n" +
      "t:c t:q \"after iri\" ."
    for (parts <- Seq(1, 3)) {
      val dir = writeDoc(d, parts = parts)
      val got = TurtleDist.read(spark, dir)
      assert(canon(got) == canon(Turtle.load(spark, d)), s"parts=$parts")
      assert(got.count() == 3)
    }
  }

  test("classify is IRIREF-aware and tracks long-literal state") {
    assert(TurtleDist.classify(
      "t:a t:p \"5\"^^<http://w3.org/2001/XMLSchema#integer> .")
      == ((true, false, true)))
    assert(TurtleDist.classify("t:b <u:o'brien#frag> t:a .")
      == ((true, false, true)))
    // opener hands state to the next line; closer ends the statement
    val (t1, _, s1, st1) = TurtleDist.classify("t:a t:p \"\"\"open", 0)
    assert(!t1 && s1 && st1 == 1)
    val (t2, _, s2, st2) = TurtleDist.classify("middle . line", st1)
    assert(!t2 && s2 && st2 == 1)
    val (t3, _, s3, st3) = TurtleDist.classify("closed\"\"\" .", st2)
    assert(t3 && s3 && st3 == 0)
    // an empty line INSIDE a long literal is significant content
    val (_, _, sigEmpty, _) = TurtleDist.classify("", 1)
    assert(sigEmpty)
  }

  test("prefixed grouped dump round-trips through the distributed reader") {
    import spark.implicits._
    val src = Turtle.load(spark,
      """@prefix c: <tpch:customer/> .
        |c:1 <tpch:name> "A" ; <tpch:age> 3 ; a <tpch:Customer> .
        |c:2 <tpch:name> "B" ; <tpch:ref> c:1 .""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-ttlrt").toString
    TurtleDist.dumpPrefixedTo(src,
      Map("c" -> "tpch:customer/", "t" -> "tpch:"), dir)
    assert(canon(TurtleDist.read(spark, dir)) == canon(src))
  }

  test("classify: terminator/continuation/directive discrimination") {
    assert(TurtleDist.classify("t:a t:p \"v\" .") == ((true, false, true)))
    assert(TurtleDist.classify("t:a t:p \"v\" ;") == ((false, false, true)))
    assert(TurtleDist.classify("t:a t:p \"dot . inside\" ;")
      == ((false, false, true)))
    assert(TurtleDist.classify("  # comment .") == ((false, false, false)))
    assert(TurtleDist.classify("") == ((false, false, false)))
    assert(TurtleDist.classify("@prefix t: <u:> .") == ((true, true, true)))
    assert(TurtleDist.classify("t:a t:p \"esc \\\" .\" ;")
      == ((false, false, true)))
  }
}
