package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** v10 JSON wire: parse(write(q)) == q over every serializable operator
  * (JsonWoqlWrite is the inverse of JsonWoql on its whole domain). */
class JsonWireSpec extends AnyFunSuite {

  private def rt(q: Woql): Unit = {
    val wire = JsonWoqlWrite.write(q)
    val back = JsonWoql.parse(wire)
    assert(back == q, s"round-trip changed the AST\n wire=$wire\n got=$back")
  }

  test("terms: every literal kind, language tags, exact decimals") {
    rt(Eq(V("X"), Str("hello")))
    rt(Eq(V("X"), Str("bonjour", "fr")))
    rt(Eq(V("X"), Lng(42L)))
    rt(Eq(V("X"), Dbl(2.5)))
    rt(Eq(V("X"), Bool(true)))
    rt(Eq(V("X"), Dec(BigDecimal("12345678901234567890.123456789012345678"))))
    rt(Eq(V("X"), Ts(java.sql.Timestamp.from(
      java.time.Instant.parse("2020-02-29T23:59:59.123456Z")))))
    rt(Eq(Node("tpch:nation/3"), V("Y")))
  }

  test("scans, connectives, predicates") {
    rt(TriplePat(V("S"), Node("p"), V("O")))
    rt(TriplePat(V("S"), Node("p"), V("O"), g = "schema"))
    rt(AddedTriple(V("S"), Node("p"), V("O"), "commit1"))
    rt(RemovedTriple(V("S"), Node("p"), V("O"), "commit1"))
    rt(And(Seq(True, Not(TriplePat(V("S"), Node("p"), V("O"))))))
    rt(Or(Seq(Eq(V("A"), Str("x")), Eq(V("A"), Str("y")))))
    rt(Opt(TriplePat(V("S"), Node("p"), V("O"))))
    rt(Once(TriplePat(V("S"), Node("p"), V("O"))))
    rt(Immediately(TriplePat(V("S"), Node("p"), V("O"))))
    rt(WhenQ(Eq(V("A"), Str("x")), TriplePat(V("S"), Node("p"), V("A"))))
    rt(Using("branch/dev", TriplePat(V("S"), Node("p"), V("O"))))
    rt(Using("commit/abc123", And(Seq(
      TriplePat(V("S"), Node("p"), V("O")), Eq(V("O"), Str("x"))))))
    rt(Cmp("<", V("A"), Lng(5))); rt(Cmp(">", V("A"), Lng(5)))
    rt(LikeSim(V("A"), Str("NATION_1"), "Sim"))
    rt(Isa(V("X"), Node("tpch:Customer")))
    rt(Subsumption(V("Sub"), Node("tpch:Entity")))
    rt(TypeOf(V("X"), V("T")))
  }

  test("modifiers, aggregates, scalar ops") {
    rt(Select(Seq("A", "B"), True))
    rt(Distinct(Seq("A"), True))
    rt(OrderBy(Seq(("A", true), ("B", false)), True))
    rt(Limit(5, Start(3, True)))
    rt(GroupBy(Seq("Q"), Seq("F"), True, "L"))
    rt(CountQ(True, "N"))
    rt(SumList("L", "S")); rt(LengthList("L", "N"))
    rt(Eval(ABin("-", ABin("+", ATerm(V("P")), ATerm(Lng(1))),
      AFloor(ABin("div", ATerm(Dbl(7.0)), ATerm(Lng(2))))), "R"))
    rt(ConcatList(Seq(Str("a"), V("B")), "S"))
    rt(TrimS(V("A"), "T")); rt(UpperS(V("A"), "U")); rt(LowerS(V("A"), "L"))
    rt(PadS(V("A"), "0", Lng(8), "P"))
    rt(SplitS(V("A"), ",", "L")); rt(JoinS("L", "-", "S"))
    rt(SubstrS(V("A"), Lng(2), Lng(3), "After", "Sub"))
    rt(ReMatch("(\\d+)-(\\d+)", V("A"), "G"))
    rt(CastQ(V("A"), "xsd:decimal", "D"))
    rt(HashKey("doc:", Seq(V("A"), Str("k")), "U"))
    rt(LexKey("doc:", Seq(V("A")), "U"))
    rt(RandomKey("doc:", "U"))
    rt(MemberQ("X", "L"))
    rt(DotQ(V("D"), "field", "V"))
  }

  test("paths: nested algebra with repetition bounds and witnesses") {
    val pat = PSeq(PAlt(PPred("a"), PInv("b")),
      PPlus(PStar(PTimes(PAlt(PAlt(PPred("c"), PPred("d")), PPred("e")), 1, 3))))
    rt(PathQ(V("X"), pat, Node("tpch:region/0")))
    rt(PathQ(Node("n"), PPred("p"), V("Y"), witness = Some("W")))
    // left-deep seq chains rebuilt identically by the reader's reduce
    rt(PathQ(V("X"), PSeq(PSeq(PPred("a"), PPred("b")), PPred("c")), V("Y")))
  }

  test("v3 writer rejects non-finite doubles (not representable as JSON)") {
    intercept[IllegalArgumentException] {
      JsonWoqlWriteV3.write(Eq(V("X"), Dbl(Double.NaN)))
    }
    intercept[IllegalArgumentException] {
      JsonWoqlWriteV3.write(Eq(V("X"), Dbl(Double.PositiveInfinity)))
    }
  }

  test("edge-object path variable is rejected by both wire writers (no silent drop)") {
    val q = PathQ(Node("n"), PPred("p"), V("Y"), Some("W"), Some("E"))
    intercept[IllegalArgumentException] { JsonWoqlWrite.write(q) }
    intercept[IllegalArgumentException] { JsonWoqlWriteV3.write(q) }
  }

  test("parseUpdate splits v10 write leaves from the read query") {
    val body =
      """{"@type":"And","and":[
        | {"@type":"Triple","subject":{"variable":"S"},
        |  "predicate":{"node":"p"},"object":{"variable":"O"}},
        | {"@type":"AddTriple","subject":{"variable":"S"},
        |  "predicate":{"node":"q"},
        |  "object":{"data":{"@type":"xsd:string","@value":"v"}}},
        | {"@type":"AddTriple","subject":{"variable":"S"},
        |  "predicate":{"node":"r"},"object":{"variable":"O"},
        |  "graph":"schema"},
        | {"@type":"DeleteTriple","subject":{"variable":"S"},
        |  "predicate":{"node":"p"},"object":{"variable":"O"}}
        |]}""".stripMargin
    val (q, writes) = JsonWoql.parseUpdate(body)
    // read view: write leaves become True
    assert(q == And(Seq(TriplePat(V("S"), Node("p"), V("O")),
      True, True, True)))
    assert(writes == Seq(
      (V("S"), Node("q"), Str("v"), "instance", true),
      (V("S"), Node("r"), V("O"), "schema", true),
      (V("S"), Node("p"), V("O"), "instance", false)))
    // a body without write leaves is a plain read query
    val (q2, w2) = JsonWoql.parseUpdate(
      """{"@type":"Triple","subject":{"variable":"S"},
        |"predicate":{"node":"p"},"object":{"variable":"O"}}""".stripMargin)
    assert(w2.isEmpty && q2 == TriplePat(V("S"), Node("p"), V("O")))
    // nested writes (inside Select) are still collected
    val (_, w3) = JsonWoql.parseUpdate(
      """{"@type":"Select","variables":["S"],"query":
        | {"@type":"AddTriple","subject":{"variable":"S"},
        |  "predicate":{"node":"p"},
        |  "object":{"data":{"@type":"xsd:integer","@value":7}}}}""".stripMargin)
    assert(w3 == Seq((V("S"), Node("p"), Lng(7L), "instance", true)))
    // the read-only parse keeps the LOUD failure — silently dropping a
    // write leaf would be data loss
    intercept[IllegalArgumentException] {
      JsonWoql.parse(
        """{"@type":"AddTriple","subject":{"variable":"S"},
          |"predicate":{"node":"p"},
          |"object":{"data":{"@type":"xsd:string","@value":"v"}}}""".stripMargin)
    }
  }

  test("whole battery flagship + engine-internal nodes raise") {
    rt(graft.queries.WoqlQueries.flagship)
    intercept[IllegalArgumentException] {
      JsonWoqlWrite.write(GroupAgg("sum", Seq("Q"), Seq("F"), True, "S"))
    }
    intercept[IllegalArgumentException] {
      JsonWoqlWrite.write(GetCsv(Seq(("V", "c")), "/tmp/x.csv"))
    }
  }
}
