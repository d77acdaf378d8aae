package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.core._

/** RPQ engine on a cyclic graph: termination + correctness of
  * star/plus/times/seq/alt/inverse (SURVEY §2.7). */
class PathsSpec extends AnyFunSuite {
  import TestSpark._

  // 3-cycle plus a tail: a→b→c→a, c→d
  private val g = triples(
    (":a", "e", ":b"), (":b", "e", ":c"), (":c", "e", ":a"), (":c", "e", ":d"))
  private implicit val ctx: Ctx = ctxOf(g)

  private def pairs(q: Woql): Set[(String, String)] =
    Compiler.run(q).collect().map { r =>
      def iri(v: String) =
        if (!r.schema.fieldNames.contains(v)) null
        else Option(r.getAs[Row](v)).map(_.getAs[String]("iri")).orNull
      (iri("X"), iri("Y"))
    }.toSet

  test("plus terminates on cycles and reaches the whole component") {
    val res = pairs(PathQ(V("X"), PPlus(PPred("e")), V("Y")))
    assert(res.contains((":a", ":a"))) // full cycle
    assert(res.contains((":a", ":d"))) // via 3 hops
    assert(res == Set(
      (":a", ":a"), (":a", ":b"), (":a", ":c"), (":a", ":d"),
      (":b", ":a"), (":b", ":b"), (":b", ":c"), (":b", ":d"),
      (":c", ":a"), (":c", ":b"), (":c", ":c"), (":c", ":d")))
  }

  test("star adds zero-length identities") {
    val res = pairs(PathQ(V("X"), PStar(PPred("e")), V("Y")))
    assert(res.contains((":d", ":d"))) // identity on sink node
    assert(res.contains((":a", ":a")))
  }

  test("times bounds repetition") {
    val res = pairs(PathQ(V("X"), PTimes(PPred("e"), 2, 2), V("Y")))
    assert(res == Set(
      (":a", ":c"), (":b", ":a"), (":b", ":d"), (":c", ":b")))
  }

  test("inverse flips edges") {
    val res = pairs(PathQ(V("X"), PInv("e"), V("Y")))
    assert(res.contains((":b", ":a")) && !res.contains((":a", ":b")))
  }

  test("seq composes; alt unions") {
    val seq2 = pairs(PathQ(V("X"), PSeq(PPred("e"), PPred("e")), V("Y")))
    assert(seq2.contains((":b", ":d")))
    val alt = pairs(PathQ(V("X"), PAlt(PPred("e"), PInv("e")), V("Y")))
    assert(alt.contains((":a", ":b")) && alt.contains((":b", ":a")))
  }

  test("bound endpoint restricts solutions") {
    val res = pairs(PathQ(V("X"), PPlus(PPred("e")), Node(":d")))
    assert(res.map(_._1) == Set(":a", ":b", ":c"))
  }
}
