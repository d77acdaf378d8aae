package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.Row
import graft.core._
import graft.server.GraphQL

/** Property test for GraphQL filter compilation (`_and`/`_or`/`_not`
  * over documents with PARTIAL fields) against a direct document-level
  * evaluator. The scoping rule under test (GraphQL.scala filterWoql):
  *
  *  - fields referenced on the CONJUNCTIVE SPINE (top level or inside
  *    `_and`) hoist their binding — the field becomes required for
  *    every solution;
  *  - fields first referenced inside an `_or` branch or `_not` body
  *    bind IN-BRANCH — a document lacking the field can still match a
  *    sibling `_or` branch, and `_not` over an absent field KEEPS the
  *    document.
  *
  * The reference evaluator mirrors exactly that: a leaf matches iff
  * the field is present and all ops hold; `_not` negates its body; and
  * the whole filter additionally requires presence of every
  * spine-referenced field. Fixed ScalaCheck seeds (one Spark job per
  * case) keep the suite deterministic, as in PropertySpec. */
class GraphQLPropertySpec extends AnyFunSuite {
  import TestSpark._

  // ---- filter-tree model ----
  private sealed trait FT
  private case class FLeaf(f: String, ops: List[(String, Long)]) extends FT
  private case class FAnd(l: List[FT]) extends FT
  private case class FOr(l: List[FT]) extends FT
  private case class FNot(t: FT) extends FT

  private val fields = Seq("f1", "f2", "f3")
  private val opNames = Seq("eq", "ne", "lt", "le", "gt", "ge")

  private val leafGen: Gen[FT] = for {
    f <- Gen.oneOf(fields)
    n <- Gen.chooseNum(1, 2)
    ops <- Gen.listOfN(n, for {
      op <- Gen.oneOf(opNames); v <- Gen.chooseNum(0L, 9L)
    } yield (op, v))
  } yield FLeaf(f, ops.distinctBy(_._1))

  private def treeGen(depth: Int): Gen[FT] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, treeGen(depth - 1)).map(FAnd(_))),
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, treeGen(depth - 1)).map(FOr(_))),
      2 -> treeGen(depth - 1).map(FNot(_)))

  // documents: 10 ids, each field independently present with prob ~2/3
  private val docsGen: Gen[Map[String, Map[String, Long]]] =
    Gen.sequence[List[(String, Map[String, Long])], (String, Map[String, Long])](
      (0 until 10).toList.map { i =>
        Gen.sequence[List[Option[(String, Long)]], Option[(String, Long)]](
          fields.toList.map { f =>
            Gen.chooseNum(0, 2).flatMap {
              case 0 => Gen.const(None)
              case _ => Gen.chooseNum(0L, 9L).map(v => Some(f -> v))
            }
          }).map(opts => s":d$i" -> opts.flatten.toMap)
      }).map(_.toMap)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- render to GraphQL filter syntax ----
  private def render(t: FT): String = t match {
    case FLeaf(f, ops) =>
      ops.map { case (op, v) => s"$op: $v" }.mkString(s"$f: {", ", ", "}")
    case FAnd(l) => l.map(c => s"{${render(c)}}").mkString("_and: [", ", ", "]")
    case FOr(l) => l.map(c => s"{${render(c)}}").mkString("_or: [", ", ", "]")
    case FNot(c) => s"_not: {${render(c)}}"
  }

  // ---- reference evaluator ----
  private def opHolds(op: String, x: Long, v: Long): Boolean = op match {
    case "eq" => x == v
    case "ne" => x != v
    case "lt" => x < v
    case "le" => x <= v
    case "gt" => x > v
    case "ge" => x >= v
  }

  private def eval(doc: Map[String, Long], t: FT): Boolean = t match {
    case FLeaf(f, ops) =>
      doc.get(f).exists(x => ops.forall { case (op, v) => opHolds(op, x, v) })
    case FAnd(l) => l.forall(eval(doc, _))
    case FOr(l) => l.exists(eval(doc, _))
    case FNot(c) => !eval(doc, c)
  }

  /** Fields whose bindings hoist to the conjunctive spine (required). */
  private def spine(t: FT): Set[String] = t match {
    case FLeaf(f, _) => Set(f)
    case FAnd(l) => l.flatMap(spine).toSet
    case FOr(_) | FNot(_) => Set.empty
  }

  test("random _and/_or/_not filter trees match a document-level evaluator") {
    (1L to 12L).foreach { seed =>
      val docs = sample(docsGen, seed * 31)
      val tree = sample(treeGen(3), seed * 131 + 7)
      val data = docs.toSeq.sortBy(_._1).flatMap { case (id, fs) =>
        (id, "rdf:type", ":Doc") +: fs.toSeq.sortBy(_._1).map {
          case (f, v) => (id, s":$f", v: Any)
        }
      }
      implicit val ctx: Ctx = ctxOf(triples(data: _*))
      val query = s"{ Doc(filter: {${render(tree)}}) { _id } }"
      val (_, df) = GraphQL.run(query, prefix = ":")
      val got = df.collect().map(_.getAs[Row]("_id").getAs[String]("iri")).toSet
      val req = spine(tree)
      val want = docs.collect { case (id, fs)
        if req.subsetOf(fs.keySet) && eval(fs, tree) => id }.toSet
      assert(got == want,
        s"\nseed=$seed\nquery=$query\ndocs=$docs\nspine=$req\ngot=$got want=$want")
    }
  }

  test("_or branches keep optional-field semantics; _not keeps absent-field docs") {
    // hand-picked shape from the round-8 fix: one doc has only f1, one
    // has only f2, one has both, one has neither
    val data = Seq(
      (":a", "rdf:type", ":Doc"), (":a", ":f1", 5: Any),
      (":b", "rdf:type", ":Doc"), (":b", ":f2", 5: Any),
      (":c", "rdf:type", ":Doc"), (":c", ":f1", 1: Any), (":c", ":f2", 1: Any),
      (":d", "rdf:type", ":Doc"))
    implicit val ctx: Ctx = ctxOf(triples(data: _*))
    val (_, or) = GraphQL.run(
      "{ Doc(filter: {_or: [{f1: {ge: 5}}, {f2: {ge: 5}}]}) { _id } }", ":")
    assert(or.collect().map(_.getAs[Row]("_id").getAs[String]("iri")).toSet
      == Set(":a", ":b"))
    val (_, not) = GraphQL.run(
      "{ Doc(filter: {_not: {f1: {ge: 5}}}) { _id } }", ":")
    assert(not.collect().map(_.getAs[Row]("_id").getAs[String]("iri")).toSet
      == Set(":b", ":c", ":d"))
  }
}
