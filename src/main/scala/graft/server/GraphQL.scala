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
  *                     c_acctbal: {gt: 9000.0},
  *                     _or: [{c_name: {startsWith: "Customer#1"}},
  *                           {c_name: {regex: "9$"}}]},
  *            orderBy: {c_acctbal: DESC, c_name: ASC},
  *            limit: 10, offset: 0) {
  *     _id                        # subject IRI
  *     c_name
  *     c_acctbal
  *     c_nationkey {              # link traversal, any depth
  *       n_name
  *       _s_nationkey_of_Supplier(filter: {s_acctbal: {ge: 0.0}}) {
  *         s_name                 # back-link (reverse traversal)
  *       }
  *     }
  * } }
  * }}}
  * Class `C` maps to IRI `prefix + C`, field `f` to predicate
  * `prefix + f`. Root arguments: `filter`, `orderBy`, `limit`,
  * `offset`, `id: "<iri>"`, `ids: ["<iri>", ...]`; link selections
  * accept `filter`, plus `path: "<pattern>"` for regular-path
  * traversal (`knows+`, `(a|b),c`, `<inv`, `p{1,3}` — the reference's
  * path string syntax, compiled onto the WOQL path engine; the field
  * name is then just the output label). Filter ops: eq, ne, lt, le, gt, ge,
  * startsWith, regex (partial match), plus the combinators
  * `_and: [...]`, `_or: [...]`, `_not: {...}`. Nested link fields
  * surface as `link_field` output columns (path-joined with `_`);
  * back-link fields `_f_of_Class` traverse `f` in reverse. Links are
  * INNER semantics in the flat bindings frame: a parent with no
  * matching link row is absent (the nested-null shape of a GraphQL
  * tree response has no flat-relational equivalent). `_or` solutions
  * are deduplicated frame-wide, so overlapping branches keep boolean
  * filter semantics. A root selection of exactly `{ _count }` returns
  * the matching-document count (filter/id/ids respected), compiled
  * onto the WOQL count aggregate; a link or back-link whose ONLY
  * selection is `{ _count }` yields a per-parent count column
  * (`<link>__count`, filter respected, inner semantics — zero-match
  * parents are absent like every link). Links also take
  * `orderBy`/`limit` (per-PARENT top-k over a flat selection set,
  * compiled onto the native GroupTopK plan — partial bounded heaps,
  * never a full-group sort; the link var tiebreaks deterministic). */
object GraphQL {

  // ---- query AST ----
  sealed trait GVal
  final case class GStr(v: String) extends GVal
  final case class GDbl(v: Double) extends GVal
  final case class GLng(v: Long) extends GVal
  final case class GBool(v: Boolean) extends GVal
  final case class GEnum(v: String) extends GVal
  final case class GObj(fields: Seq[(String, GVal)]) extends GVal
  final case class GLst(items: Seq[GVal]) extends GVal

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
      if (i >= s.length) err("expected value")
      s(i) match {
        case '"' =>
          i += 1; val sb = new StringBuilder
          while (i < s.length && s(i) != '"') {
            if (s(i) == '\\') {
              i += 1
              if (i >= s.length) err("unterminated string")
              s(i) match {
                case 'n' => sb.append('\n')
                case 't' => sb.append('\t')
                case 'r' => sb.append('\r')
                case 'b' => sb.append('\b')
                case 'f' => sb.append('\f')
                case '"' => sb.append('"')
                case '\\' => sb.append('\\')
                case '/' => sb.append('/')
                case 'u' =>
                  if (i + 4 >= s.length) err("truncated \\u escape")
                  val hex = s.substring(i + 1, i + 5)
                  val cp =
                    try Integer.parseInt(hex, 16)
                    catch { case _: NumberFormatException =>
                      err(s"invalid \\u escape \\u$hex") }
                  sb.append(cp.toChar); i += 4
                case c => err(s"unknown escape \\$c")
              }
              i += 1
            } else { sb.append(s(i)); i += 1 }
          }
          if (i >= s.length) err("unterminated string")
          i += 1; GStr(sb.toString)
        case '{' =>
          i += 1
          val fs = Seq.newBuilder[(String, GVal)]
          while (!peekIs('}')) { val n = ident(); expect(':'); fs += (n -> value()) }
          i += 1; GObj(fs.result())
        case '[' =>
          i += 1
          val items = Seq.newBuilder[GVal]
          while (!peekIs(']')) items += value()
          i += 1; GLst(items.result())
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

  private val BackLink = "^_(.+)_of_([A-Za-z][A-Za-z0-9_]*)$".r

  /** (class name, WOQL query, output column order). */
  def toWoql(root: Sel, prefix: String = "tpch:"): (String, Woql, Seq[String]) = {
    val subj = "S"
    var pats = Vector[Woql](
      TriplePat(V(subj), Node("rdf:type"), Node(prefix + root.name)))
    val outs = Seq.newBuilder[String]
    var bound = Set.empty[String]   // output/filter binding vars
    var subjs = Vector(subj)        // subject + link vars (frame identity)
    var orUsed = false              // _or may duplicate → dedup frame-wide
    var pathDeferred = Vector.empty[() => Unit] // path subtrees, run post-filter

    def fieldVar(path: String, f: String) =
      if (path.isEmpty) f else s"${path}_$f"

    /** Bind `subjV.pred(f)` into the path-scoped var unless already bound. */
    def bindField(subjV: String, path: String, f: String): String = {
      val v = fieldVar(path, f)
      if (!bound(v)) { pats :+= TriplePat(V(subjV), Node(prefix + f), V(v)); bound += v }
      v
    }

    /** Filter tree → a predicate Woql. Fields referenced in the
      * CONJUNCTIVE spine (`scope = None`) bind as a side effect in the
      * top-level conjunction, sharing one binding scan. Fields first
      * referenced inside an `_or` branch or a `_not` body
      * (`scope = Some(seen)`) bind IN-BRANCH instead: hoisting them
      * would make the field implicitly required for every solution —
      * a document lacking the field could never match the OTHER `_or`
      * branch, and `_not` on an absent field would drop the document
      * instead of keeping it. Per-branch TriplePats restore optional-
      * field semantics: an `_or` branch only constrains documents that
      * have its fields, and a self-contained `_not` anti-joins on the
      * subject alone (absent field ⇒ no match ⇒ document survives).
      * `seen` dedups bindings within one branch conjunction; nested
      * branches clone it so sibling branches stay independent. */
    def filterWoql(subjV: String, path: String, v: GVal,
        scope: Option[scala.collection.mutable.Set[String]] = None): Woql = v match {
      case GObj(fs) =>
        def branchScope() =
          Some(scope.fold(scala.collection.mutable.Set.empty[String])(_.clone()))
        And(fs.map {
          case ("_and", GLst(items)) => And(items.map(filterWoql(subjV, path, _, scope)))
          case ("_or", GLst(items)) =>
            orUsed = true
            Or(items.map(filterWoql(subjV, path, _, branchScope())))
          case ("_not", o: GObj) => Not(filterWoql(subjV, path, o, branchScope()))
          case (comb, other) if comb.startsWith("_") =>
            throw new IllegalArgumentException(
              s"$comb expects ${if (comb == "_not") "an object" else "a list"}, got $other")
          case (f, GObj(ops)) =>
            val fv = fieldVar(path, f)
            val binds: Seq[Woql] = scope match {
              case None => bindField(subjV, path, f); Nil // hoisted to `pats`
              case Some(seen) =>
                if (bound(fv) || seen(fv)) Nil
                else { seen += fv
                  Seq(TriplePat(V(subjV), Node(prefix + f), V(fv))) }
            }
            And(binds ++ ops.map {
              case ("eq", x) => Eq(V(fv), litTerm(x))
              case ("ne", x) => Not(Eq(V(fv), litTerm(x)))
              case ("lt", x) => Cmp("<", V(fv), litTerm(x))
              case ("le", x) => Cmp("<=", V(fv), litTerm(x))
              case ("gt", x) => Cmp(">", V(fv), litTerm(x))
              case ("ge", x) => Cmp(">=", V(fv), litTerm(x))
              case ("regex", GStr(p)) => RegexTest(p, V(fv))
              case ("startsWith", GStr(p)) =>
                RegexTest("^" + java.util.regex.Pattern.quote(p), V(fv))
              case (op, _) => throw new IllegalArgumentException(s"unknown filter op $op")
            })
          case (f, other) =>
            throw new IllegalArgumentException(s"filter for $f must be an object, got $other")
        })
      case other => throw new IllegalArgumentException(s"filter must be an object, got $other")
    }

    def linkArgs(subjV: String, path: String, args: Seq[(String, GVal)]): Unit =
      args.foreach {
        case ("filter", f) =>
          // two steps: filterWoql appends binding TriplePats to `pats` as
          // a side effect, and `pats :+= rhs` captures the OLD vector
          // before evaluating rhs — fusing them would drop the bindings
          val pred = filterWoql(subjV, path, f)
          pats :+= pred
        case (a, _) => throw new IllegalArgumentException(
          s"link selections accept filter only, got $a")
      }

    /** Filter pats for a COUNTED link's sub-query: field bindings stay
      * INSIDE the sub (in-branch scope) — the sub compiles as an
      * independent conjunction joined back per parent. */
    def countFilterPats(lv: String, path: String,
        args: Seq[(String, GVal)]): Seq[Woql] =
      args.map {
        case ("filter", f) => filterWoql(lv, path, f,
          Some(scala.collection.mutable.Set.empty[String]))
        case (a, _) => throw new IllegalArgumentException(
          s"link selections accept filter only, got $a")
      }

    /** Per-link orderBy/limit: the link subtree compiles as an
      * INDEPENDENT sub-conjunction, per-parent top-k'd on the native
      * GroupTopK plan and conj-joined back (the flat-frame spelling of
      * the reference's nested-collection orderBy/limit). Selection set
      * must be FLAT (scalars/_id) — a nested link under a limited link
      * has no flat-relational equivalent. orderBy fields not selected
      * are bound sub-side just for the sort; the link var tiebreaks so
      * the page is deterministic. */
    def compileTopKLink(name: String, linkPat: String => Seq[Woql],
        args: Seq[(String, GVal)], subs: Seq[Sel],
        subjV: String, path: String): Unit = {
      val p2 = fieldVar(path, name)
      val lv = "__" + p2
      require(subs.nonEmpty, s"link $name needs a selection set")
      val subPats = scala.collection.mutable.ArrayBuffer[Woql](linkPat(lv): _*)
      val localOuts = subs.map {
        case Sel("_id", Nil, Nil) =>
          val out = fieldVar(p2, "_id")
          subPats += Eq(V(out), V(lv)); out
        case Sel(sf, Nil, Nil) =>
          val v = fieldVar(p2, sf)
          subPats += TriplePat(V(lv), Node(prefix + sf), V(v)); v
        case other => throw new IllegalArgumentException(
          s"orderBy/limit link $name supports a flat selection set " +
            s"(scalars/_id) only, got ${other.name}")
      }
      args.foreach {
        case ("filter", f) =>
          subPats += filterWoql(lv, p2, f,
            Some(scala.collection.mutable.Set.empty[String]))
        case ("orderBy", _) | ("limit", _) => ()
        case (a, _) => throw new IllegalArgumentException(
          s"ordered link selections accept filter/orderBy/limit, got $a")
      }
      val order: Seq[(String, Boolean)] = args.collectFirst {
        case ("orderBy", GObj(specs)) => specs.map {
          case (sf, GEnum("ASC")) => (fieldVar(p2, sf), true)
          case (sf, GEnum("DESC")) => (fieldVar(p2, sf), false)
          case (sf, other) => throw new IllegalArgumentException(
            s"orderBy $sf must be ASC or DESC, got $other")
        }
      }.getOrElse(Nil)
      // sort fields not in the selection bind sub-side, sort-only
      order.map(_._1).filterNot(localOuts.contains).foreach { v =>
        val sf = v.stripPrefix(p2 + "_")
        subPats += TriplePat(V(lv), Node(prefix + sf), V(v))
      }
      val k = args.collectFirst { case ("limit", GLng(n)) => n }
        .getOrElse(throw new IllegalArgumentException(
          s"orderBy on link $name requires limit"))
      require(k >= 1, s"link limit must be >= 1 (got $k)")
      pats :+= GroupTopKJoin(And(subPats.toSeq), Seq(subjV),
        order :+ (lv -> true), k, lv +: localOuts)
      subjs :+= lv
      localOuts.foreach { v => bound += v; outs += v }
    }

    /** Per-link numeric aggregates: a link whose selections are ALL
      * aggregate fields (`_count` plus `_sum`/`_min`/`_max` with a
      * `field: "..."` argument) compiles to ONE GroupStats conjunct —
      * every aggregate computed in a single per-parent aggregate and
      * joined back in a single (broadcast-able, count-sized) equi-join.
      * Inner semantics like `_count`: zero-match parents are absent. */
    val aggSelNames = Set("_count", "_sum", "_min", "_max")
    def isAggSel(s: Sel): Boolean = aggSelNames(s.name) && s.fields.isEmpty
    def compileAggLink(name: String, linkPat: String => Seq[Woql],
        args: Seq[(String, GVal)], subs: Seq[Sel],
        subjV: String, path: String): Unit = {
      val fp = fieldVar(path, name)
      val lv = "__" + fp
      val extra = scala.collection.mutable.ArrayBuffer[Woql]()
      val fieldVars = scala.collection.mutable.Map[String, String]()
      def valueVar(f: String): String =
        fieldVars.getOrElseUpdate(f, {
          val fv = "__" + fieldVar(fp, f)
          extra += TriplePat(V(lv), Node(prefix + f), V(fv))
          fv
        })
      val aggs: Seq[(String, Option[String], String)] = subs.map {
        case Sel("_count", cargs, Nil) =>
          require(cargs.isEmpty, "_count takes no arguments")
          ("count", None, fieldVar(fp, "_count"))
        case Sel(fn, fargs, Nil) =>
          val f = fargs.collectFirst { case ("field", GStr(x)) => x }
            .getOrElse(throw new IllegalArgumentException(
              s"""$fn requires a field: "..." argument"""))
          require(fargs.size == 1,
            s"$fn takes exactly the field argument")
          (fn.drop(1), Some(valueVar(f)), fieldVar(fp, fn + "_" + f))
        case other => throw new IllegalArgumentException(
          s"aggregate link $name cannot mix ${other.name} with aggregates")
      }
      pats :+= GroupStats(
        And(linkPat(lv) ++ extra.toSeq ++ countFilterPats(lv, fp, args)),
        Seq(subjV), aggs)
      aggs.foreach { a => bound += a._3; outs += a._3 }
    }

    def compileSels(subjV: String, path: String, sels: Seq[Sel]): Unit = sels.foreach {
      case Sel("_count", _, _) =>
        throw new IllegalArgumentException(
          "_count alone in a selection set counts that collection; it " +
            "cannot mix with per-row fields (flat bindings frame)")
      // per-link COUNT: a link/back-link whose ONLY selection is
      // `_count` compiles to a GroupCount conjunct — the link pattern
      // (+ its filter) counted per parent subject and joined back, so
      // the row-level fields of the enclosing frame survive. Inner
      // semantics like every link: a parent with zero matches is
      // absent, not 0.
      // per-link AGGREGATES (_sum/_min/_max, optionally with _count):
      // one GroupStats conjunct per link — single aggregate + join
      case Sel(name @ BackLink(pred, cls), args, subs)
          if subs.nonEmpty && subs.forall(isAggSel) &&
            subs.exists(_.name != "_count") =>
        compileAggLink(name, lv => Seq(
            TriplePat(V(lv), Node("rdf:type"), Node(prefix + cls)),
            TriplePat(V(lv), Node(prefix + pred), V(subjV))),
          args, subs, subjV, path)
      case Sel(f, args, subs)
          if subs.nonEmpty && subs.forall(isAggSel) &&
            subs.exists(_.name != "_count") && !args.exists(_._1 == "path") =>
        compileAggLink(f, lv => Seq(
            TriplePat(V(subjV), Node(prefix + f), V(lv))),
          args, subs, subjV, path)
      case Sel(name @ BackLink(pred, cls), args, Seq(Sel("_count", cargs, Nil))) =>
        require(cargs.isEmpty, "_count takes no arguments")
        val lv = "__" + fieldVar(path, name)
        val out = fieldVar(fieldVar(path, name), "_count")
        val linkPats = Seq[Woql](
          TriplePat(V(lv), Node("rdf:type"), Node(prefix + cls)),
          TriplePat(V(lv), Node(prefix + pred), V(subjV)))
        pats :+= GroupCount(
          And(linkPats ++ countFilterPats(lv, fieldVar(path, name), args)),
          Seq(subjV), out)
        bound += out; outs += out
      case Sel(f, args, Seq(Sel("_count", cargs, Nil)))
          if !args.exists(_._1 == "path") =>
        require(cargs.isEmpty, "_count takes no arguments")
        val lv = "__" + fieldVar(path, f)
        val out = fieldVar(fieldVar(path, f), "_count")
        val linkPats = Seq[Woql](TriplePat(V(subjV), Node(prefix + f), V(lv)))
        pats :+= GroupCount(
          And(linkPats ++ countFilterPats(lv, fieldVar(path, f), args)),
          Seq(subjV), out)
        bound += out; outs += out
      case Sel("_id", _, Nil) =>
        val out = fieldVar(path, "_id")
        pats :+= Eq(V(out), V(subjV))
        bound += out; outs += out
      // per-link orderBy/limit → per-parent top-k (GroupTopKJoin)
      case Sel(name @ BackLink(pred, cls), args, subs)
          if args.exists(a => a._1 == "orderBy" || a._1 == "limit") =>
        compileTopKLink(name, lv => Seq(
            TriplePat(V(lv), Node("rdf:type"), Node(prefix + cls)),
            TriplePat(V(lv), Node(prefix + pred), V(subjV))),
          args, subs, subjV, path)
      case Sel(f, args, subs)
          if subs.nonEmpty && !args.exists(_._1 == "path") &&
            args.exists(a => a._1 == "orderBy" || a._1 == "limit") =>
        compileTopKLink(f, lv => Seq(
            TriplePat(V(subjV), Node(prefix + f), V(lv))),
          args, subs, subjV, path)
      case Sel(name @ BackLink(pred, cls), args, subs) =>
        // reverse traversal: instances of `cls` whose `pred` points here
        val lv = "__" + fieldVar(path, name)
        pats :+= TriplePat(V(lv), Node("rdf:type"), Node(prefix + cls))
        pats :+= TriplePat(V(lv), Node(prefix + pred), V(subjV))
        subjs :+= lv
        linkArgs(lv, fieldVar(path, name), args)
        require(subs.nonEmpty, s"back-link $name needs a selection set")
        compileSels(lv, fieldVar(path, name), subs)
      case Sel(f, args, subs) if args.exists(_._1 == "path") =>
        // regular-path traversal (the reference v10 GraphQL `path:`
        // argument): targets reachable from this subject through the
        // path expression, compiled onto the SAME path engine as WOQL
        // path(). The field name is the output label; the selection
        // set's bindings narrow mixed-type targets (inner semantics,
        // like every link). The whole subtree is DEFERRED until the
        // root constraints are in `pats`, so the walk seeds from the
        // filtered root set (see the pathDeferred note below).
        val patStr = args.collectFirst { case ("path", GStr(p)) => p }
          .getOrElse(throw new IllegalArgumentException(
            s"path argument of $f must be a string"))
        require(subs.nonEmpty, s"path field $f needs a selection set")
        pathDeferred :+= { () =>
          val lv = "__" + fieldVar(path, f)
          pats :+= PathQ(V(subjV), PathSyntax.parse(patStr, prefix), V(lv))
          subjs :+= lv
          linkArgs(lv, fieldVar(path, f), args.filterNot(_._1 == "path"))
          compileSels(lv, fieldVar(path, f), subs)
        }
      case Sel(f, args, Nil) =>
        require(args.isEmpty, s"scalar field $f takes no arguments")
        outs += bindField(subjV, path, f)
      case Sel(f, args, subs) =>
        val lv = "__" + fieldVar(path, f)
        pats :+= TriplePat(V(subjV), Node(prefix + f), V(lv))
        subjs :+= lv
        linkArgs(lv, fieldVar(path, f), args)
        compileSels(lv, fieldVar(path, f), subs)
    }

    // Root-level `_count` (the reference's v10 GraphQL count
    // aggregation on collection queries): `{ C(filter: ...) { _count } }`
    // returns ONE row with the number of matching documents, compiled
    // onto the same WOQL aggregate path as woql count() — a distinct
    // over the subject then CountQ, so Spark plans it as one partial-
    // aggregated count over the filtered class scan, never a fetch-
    // and-count page. Must be the sole selected field (enforced in
    // compileSels): the flat frame cannot mix aggregate and row shape.
    val countOnly = root.fields match {
      case Seq(Sel("_count", cargs, Nil)) =>
        require(cargs.isEmpty, "_count takes no arguments")
        true
      case _ => false
    }
    if (!countOnly) compileSels(subj, "", root.fields)

    val args = root.args.toMap
    args.get("id").foreach {
      case GStr(iri) => pats :+= Eq(V(subj), Node(iri))
      case other => throw new IllegalArgumentException(s"id must be a string, got $other")
    }
    args.get("ids").foreach {
      case GLst(items) =>
        // disjoint Eq branches → no duplicate solutions, no dedup needed
        pats :+= Or(items.map {
          case GStr(iri) => Eq(V(subj), Node(iri))
          case other => throw new IllegalArgumentException(s"ids entries must be strings, got $other")
        })
      case other => throw new IllegalArgumentException(s"ids must be a list, got $other")
    }
    args.get("filter").foreach { f =>
      val pred = filterWoql(subj, "", f) // binds fields into pats first
      pats :+= pred
    }

    // Path traversals compile AFTER the root id/ids/filter constraints:
    // the conjunction folds left-to-right, so the frontier walk seeds
    // from the FILTERED root set instead of every instance of the class
    // (measured at sf0.1: filtered-seed walk vs full-closure-then-join
    // was 0.3 s vs 6.6 s on ext_graphql_path). Deferring ONLY the path
    // subtrees keeps the scalar/_or binding order unchanged — hoisting
    // the whole filter ahead of the selections would re-bind _or-branch
    // fields in-branch and break optional-field null alignment.
    // Drain as a QUEUE, not a snapshot iteration: a deferred closure
    // that compiles a nested selection set can itself append to
    // pathDeferred (a `path:` field inside another path field's
    // selections); foreach over the Vector captured at call time would
    // silently drop those late arrivals.
    while (pathDeferred.nonEmpty) {
      val f = pathDeferred.head
      pathDeferred = pathDeferred.tail
      f()
    }

    var q: Woql = And(pats)
    // overlapping _or branches union their frames; collapse exact-
    // duplicate solutions (same subject chain ⇒ same row, since every
    // encoded predicate is functional) to keep boolean filter semantics
    if (orUsed) {
      val allVars = (bound ++ subjs).toSeq.sorted
      q = Distinct(allVars, q)
    }
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
    if (countOnly) {
      // distinct on the subject first: an overlapping-_or filter frame
      // carries one row per matching branch, and _count means matching
      // DOCUMENTS, not matching filter derivations
      (root.name, Select(Seq("_count"),
        CountQ(Distinct(Seq(subj), q), "_count")), Seq("_count"))
    } else {
      val cols = outs.result()
      (root.name, Select(cols, q), cols)
    }
  }

  /** Introspection subset: `{ __schema { types { name } } }` lists
    * the classes the schema graph declares (rdfs:domain owners +
    * rdfs:subClassOf endpoints), `{ __type(name: "C") { fields } }`
    * lists a class's frame — own + inherited properties with range
    * and cardinality (docs/Frames). Names are prefix-stripped to the
    * same short form queries use. Responses are FLAT binding frames
    * like every other query (the facade nests them under the root
    * field). The reference's GraphQL is likewise READ-only — document
    * mutation goes through the document API — so introspection
    * completes the read surface; no mutations by design. */
  private def introspect(root: Sel, prefix: String)(
      implicit ctx: Ctx): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = ctx.triples.filter(col("g") === "schema")
    def short(c: org.apache.spark.sql.Column) = regexp_replace(
      c, "^" + java.util.regex.Pattern.quote(prefix), "")
    root.name match {
      case "__schema" =>
        val subs = schema.filter(col("p") === "rdfs:subClassOf")
        schema.filter(col("p") === "rdfs:domain").select(col("o_iri").as("cls"))
          .union(subs.select(col("s").as("cls")))
          .union(subs.select(col("o_iri").as("cls")))
          .distinct()
          .select(short(col("cls")).as("name"))
          .orderBy(col("name"))
      case "__type" =>
        val name = root.args.collectFirst { case ("name", GStr(v)) => v }
          .getOrElse(throw new IllegalArgumentException(
            "__type requires a name: String argument"))
        graft.docs.Frames.classFrame(schema, ctx.subclass, prefix + name)
          .select(short(col("property")).as("name"),
            short(col("range")).as("type"),
            col("maxCard").as("max_card"))
          .orderBy(col("name"))
      case other => throw new IllegalArgumentException(
        s"unknown introspection root $other")
    }
  }

  /** Execute a GraphQL query against a compile context; bindings frame
    * with one column per selected field, in selection order. */
  def run(query: String, prefix: String = "tpch:")(implicit ctx: Ctx): (String, DataFrame) = {
    val root = parse(query)
    if (root.name.startsWith("__")) (root.name, introspect(root, prefix))
    else {
      val (cls, woql, cols) = toWoql(root, prefix)
      val df = Compiler.run(woql)
      (cls, df.select(cols.map(org.apache.spark.sql.functions.col): _*))
    }
  }
}
