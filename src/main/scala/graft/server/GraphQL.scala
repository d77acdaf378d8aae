package graft.server

import org.apache.spark.sql.DataFrame
import graft.core._

/** GraphQL query surface (the reference's v10 GraphQL API,
  * [ref:core/api/graphql] era) — a hand-rolled parser for the query
  * subset, compiled DIRECTLY to the WOQL AST, so filter / orderBy /
  * limit / link traversal reuse the whole existing engine: the same
  * partition-pruned EAV scans, broadcast join chains and Catalyst
  * optimization as every WOQL query. No new execution path exists to
  * keep correct.
  *
  * Supported subset (one top-level class field):
  * {{{
  * { Customer(filter: {c_mktsegment: {eq: "BUILDING"},
  *                     c_acctbal: {gt: 9000.0}},
  *            orderBy: {c_acctbal: DESC, c_name: ASC},
  *            limit: 10, offset: 0) {
  *     c_name
  *     c_acctbal
  *     c_nationkey { n_name }     # link traversal, one level
  * } }
  * }}}
  * Class `C` maps to IRI `prefix + C`, field `f` to predicate
  * `prefix + f`. Filter ops: eq, lt, le, gt, ge. Nested link fields
  * surface as `link_field` output columns. */
object GraphQL {

  // ---- query AST ----
  sealed trait GVal
  final case class GStr(v: String) extends GVal
  final case class GDbl(v: Double) extends GVal
  final case class GLng(v: Long) extends GVal
  final case class GBool(v: Boolean) extends GVal
  final case class GEnum(v: String) extends GVal
  final case class GObj(fields: Seq[(String, GVal)]) extends GVal

  final case class Sel(name: String, args: Seq[(String, GVal)], fields: Seq[Sel])

  // ---- parser (recursive descent; commas and whitespace are noise) ----
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < s.length && (s(i).isWhitespace || s(i) == ',' || s(i) == '#' && skipComment())) i += 1
    private def skipComment(): Boolean = {
      while (i < s.length && s(i) != '\n') i += 1
      true
    }
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"GraphQL parse error at $i: $msg")
    private def expect(c: Char): Unit = {
      ws(); if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1
    }
    private def peekIs(c: Char): Boolean = { ws(); i < s.length && s(i) == c }
    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) err("expected identifier")
      s.substring(start, i)
    }
    private def value(): GVal = {
      ws()
      s(i) match {
        case '"' =>
          i += 1; val sb = new StringBuilder
          while (s(i) != '"') {
            if (s(i) == '\\') { i += 1 }
            sb.append(s(i)); i += 1
          }
          i += 1; GStr(sb.toString)
        case '{' =>
          i += 1
          val fs = Seq.newBuilder[(String, GVal)]
          while (!peekIs('}')) { val n = ident(); expect(':'); fs += (n -> value()) }
          i += 1; GObj(fs.result())
        case c if c.isDigit || c == '-' =>
          val start = i
          i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
            s(i) == 'E' || s(i) == '-' || s(i) == '+')) i += 1
          val raw = s.substring(start, i)
          if (raw.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) GDbl(raw.toDouble)
          else GLng(raw.toLong)
        case _ =>
          ident() match {
            case "true" => GBool(true)
            case "false" => GBool(false)
            case e => GEnum(e)
          }
      }
    }
    private def selection(): Sel = {
      val n = ident()
      val args =
        if (peekIs('(')) {
          i += 1
          val as = Seq.newBuilder[(String, GVal)]
          while (!peekIs(')')) { val a = ident(); expect(':'); as += (a -> value()) }
          i += 1; as.result()
        } else Nil
      val fields =
        if (peekIs('{')) { i += 1
          val fs = Seq.newBuilder[Sel]
          while (!peekIs('}')) fs += selection()
          i += 1; fs.result()
        } else Nil
      Sel(n, args, fields)
    }
    def document(): Sel = {
      ws()
      if (peekIs('{')) i += 1 // anonymous operation
      else { val kw = ident(); if (kw != "query") err("expected query"); expect('{') }
      val root = selection()
      expect('}')
      root
    }
  }

  def parse(query: String): Sel = new P(query).document()

  // ---- compile to WOQL ----

  private def litTerm(v: GVal): Term = v match {
    case GStr(x) => Str(x)
    case GDbl(x) => Dbl(x)
    case GLng(x) => Lng(x)
    case GBool(x) => Bool(x)
    case other => throw new IllegalArgumentException(s"not a literal: $other")
  }

  /** (class name, WOQL query, output column order). */
  def toWoql(root: Sel, prefix: String = "tpch:"): (String, Woql, Seq[String]) = {
    val subj = "S"
    var pats = Vector[Woql](
      TriplePat(V(subj), Node("rdf:type"), Node(prefix + root.name)))
    val outs = Seq.newBuilder[String]
    var bound = Set.empty[String]

    root.fields.foreach {
      case Sel(f, _, Nil) =>
        pats :+= TriplePat(V(subj), Node(prefix + f), V(f))
        bound += f; outs += f
      case Sel(f, _, subs) =>
        val lv = "__" + f
        pats :+= TriplePat(V(subj), Node(prefix + f), V(lv))
        subs.foreach {
          case Sel(g, _, Nil) =>
            val out = s"${f}_$g"
            pats :+= TriplePat(V(lv), Node(prefix + g), V(out))
            bound += out; outs += out
          case nested =>
            throw new IllegalArgumentException(
              s"link selections are one level deep (at ${nested.name})")
        }
    }

    val args = root.args.toMap
    args.get("filter").foreach {
      case GObj(fs) => fs.foreach {
        case (f, GObj(ops)) =>
          if (!bound(f)) { pats :+= TriplePat(V(subj), Node(prefix + f), V(f)); bound += f }
          ops.foreach {
            case ("eq", v) => pats :+= Eq(V(f), litTerm(v))
            case ("lt", v) => pats :+= Cmp("<", V(f), litTerm(v))
            case ("le", v) => pats :+= Cmp("<=", V(f), litTerm(v))
            case ("gt", v) => pats :+= Cmp(">", V(f), litTerm(v))
            case ("ge", v) => pats :+= Cmp(">=", V(f), litTerm(v))
            case (op, _) => throw new IllegalArgumentException(s"unknown filter op $op")
          }
        case (f, other) =>
          throw new IllegalArgumentException(s"filter for $f must be an object, got $other")
      }
      case other => throw new IllegalArgumentException(s"filter must be an object, got $other")
    }

    var q: Woql = And(pats)
    args.get("orderBy").foreach {
      case GObj(specs) =>
        val resolved = specs.map {
          case (f, GEnum("ASC")) => (f, true)
          case (f, GEnum("DESC")) => (f, false)
          case (f, other) => throw new IllegalArgumentException(
            s"orderBy $f must be ASC or DESC, got $other")
        }
        require(resolved.forall(s => bound(s._1)),
          "orderBy fields must be selected or filtered")
        q = OrderBy(resolved, q)
      case other => throw new IllegalArgumentException(s"orderBy must be an object, got $other")
    }
    args.get("offset").foreach { case GLng(n) => q = Start(n, q)
      case other => throw new IllegalArgumentException(s"offset must be an int, got $other") }
    args.get("limit").foreach { case GLng(n) => q = Limit(n, q)
      case other => throw new IllegalArgumentException(s"limit must be an int, got $other") }
    val cols = outs.result()
    (root.name, Select(cols, q), cols)
  }

  /** Execute a GraphQL query against a compile context; bindings frame
    * with one column per selected field, in selection order. */
  def run(query: String, prefix: String = "tpch:")(implicit ctx: Ctx): (String, DataFrame) = {
    val (cls, woql, cols) = toWoql(parse(query), prefix)
    val df = Compiler.run(woql)
    (cls, df.select(cols.map(org.apache.spark.sql.functions.col): _*))
  }
}
