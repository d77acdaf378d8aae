package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** AST → pre-v10 ("v3") WOQL JSON-LD serializer — the inverse of
  * [[JsonWoqlV3]] on that reader's subset (reference:
  * core/query/json_woql.pl, the JSON-LD branch used by older clients).
  * Writes the v3 wire shape: `woql:`-prefixed types, indexed
  * `woql:QueryListElement`/`woql:VariableListElement` lists, and
  * `{"@value": …, "@type": "xsd:…"}` scalar wrappers.
  *
  * Contract: `JsonWoqlV3.parse(JsonWoqlWriteV3.write(q)) == q` for every
  * query built from the v3 subset (triple/quad, and/or, select, not/opt,
  * when/immediately, eq, compare, true/false, limit/start, order_by,
  * eval, path, group_by, count, sum, length). Terms outside the v3 term
  * grammar (lang-tagged strings, timestamps) and engine-internal or
  * v10-only nodes raise — callers serialize those with the v10 writer
  * ([[JsonWoqlWrite]]). Decimals travel as `@value` strings (JSON
  * doubles cannot carry (38,18) exactly; the reader accepts the string
  * form losslessly).
  */
object JsonWoqlWriteV3 {

  def write(q: Woql): String = JsonMethods.compact(JsonMethods.render(toJson(q)))

  private def t(name: String): JField = "@type" -> JString(s"woql:$name")

  private def wrap(typ: String, value: JValue): JValue =
    JObject("@value" -> value, "@type" -> JString(typ))

  private def idx(i: Int): JField =
    "woql:index" -> wrap("xsd:nonNegativeInteger", JInt(BigInt(i)))

  def term(x: Term): JValue = x match {
    case V(n) => JObject(t("Variable"),
      "woql:variable_name" -> wrap("xsd:string", JString(n)))
    case Node(i) => JObject(t("Node"), "woql:node" -> JString(i))
    case Str(s, null) => JObject(t("Datatype"),
      "woql:datatype" -> wrap("xsd:string", JString(s)))
    case Lng(v) => JObject(t("Datatype"),
      "woql:datatype" -> wrap("xsd:integer", JInt(BigInt(v))))
    case Dbl(v) if v.isNaN || v.isInfinite =>
      // json4s renders these as bare NaN/Infinity tokens — not JSON;
      // other v3 clients would reject the document
      throw new IllegalArgumentException(
        s"non-finite xsd:double not in the v3 wire grammar: $v")
    case Dbl(v) => JObject(t("Datatype"),
      "woql:datatype" -> wrap("xsd:double", JDouble(v)))
    case Dec(v) => JObject(t("Datatype"),
      "woql:datatype" -> wrap("xsd:decimal", JString(v.bigDecimal.toPlainString)))
    case Bool(v) => JObject(t("Datatype"),
      "woql:datatype" -> wrap("xsd:boolean", JBool(v)))
    case other => throw new IllegalArgumentException(
      s"term not in the v3 wire grammar: $other — use the v10 writer")
  }

  private def queryList(qs: Seq[Woql]): JValue =
    JArray(qs.zipWithIndex.toList.map { case (q, i) =>
      JObject(t("QueryListElement"), idx(i), "woql:query" -> toJson(q))
    })

  private def varList(vars: Seq[String]): JValue =
    JArray(vars.zipWithIndex.toList.map { case (n, i) =>
      JObject(t("VariableListElement"), idx(i), "woql:variable_name" -> JString(n))
    })

  def arith(e: ArithE): JValue = e match {
    case ATerm(x) => JObject(t("ArithmeticValue"), "woql:arithmetic_value" -> term(x))
    case AFloor(a) => JObject(t("Floor"), "woql:argument" -> arith(a))
    case ABin(op, l, r) =>
      val name = op match {
        case "+" => "Plus"; case "-" => "Minus"; case "*" => "Times"
        case "/" => "Divide"; case "div" => "Div"; case "exp" => "Exp"
        case other => throw new IllegalArgumentException(s"unserializable arith op $other")
      }
      JObject(t(name), "woql:first" -> arith(l), "woql:second" -> arith(r))
  }

  def path(p: PathPat): JValue = p match {
    case PPred(x) => JObject(t("PathPredicate"), "woql:path_predicate" -> JString(x))
    case PInv(x) => JObject(t("InversePathPredicate"), "woql:path_predicate" -> JString(x))
    case PSeq(a, b) => JObject(t("PathSequence"),
      "woql:path_first" -> path(a), "woql:path_second" -> path(b))
    case PAlt(a, b) => JObject(t("PathOr"),
      "woql:path_left" -> path(a), "woql:path_right" -> path(b))
    case PPlus(x) => JObject(t("PathPlus"), "woql:path_pattern" -> path(x))
    case PStar(x) => JObject(t("PathStar"), "woql:path_pattern" -> path(x))
    case PTimes(x, n, m) => JObject(t("PathTimes"), "woql:path_pattern" -> path(x),
      "woql:from" -> wrap("xsd:nonNegativeInteger", JInt(BigInt(n))),
      "woql:to" -> wrap("xsd:nonNegativeInteger", JInt(BigInt(m))))
  }

  def toJson(q: Woql): JValue = q match {
    case TriplePat(s, p, o, "instance") => JObject(t("Triple"),
      "woql:subject" -> term(s), "woql:predicate" -> term(p), "woql:object" -> term(o))
    case TriplePat(s, p, o, g) => JObject(t("Quad"),
      "woql:subject" -> term(s), "woql:predicate" -> term(p),
      "woql:object" -> term(o), "woql:graph_filter" -> JString(g))
    case And(qs) => JObject(t("And"), "woql:query_list" -> queryList(qs))
    case Or(qs) => JObject(t("Or"), "woql:query_list" -> queryList(qs))
    case Select(vars, x) => JObject(t("Select"),
      "woql:variable_list" -> varList(vars), "woql:query" -> toJson(x))
    case Not(x) => JObject(t("Not"), "woql:query" -> toJson(x))
    case Using(res, x) => JObject(t("Using"),
      "woql:collection" -> JString(res), "woql:query" -> toJson(x))
    case Opt(x) => JObject(t("Optional"), "woql:query" -> toJson(x))
    case Immediately(x) => JObject(t("Immediately"), "woql:query" -> toJson(x))
    case WhenQ(c, cq) => JObject(t("When"),
      "woql:query" -> toJson(c), "woql:consequent" -> toJson(cq))
    case Eq(a, b) => JObject(t("Equals"), "woql:left" -> term(a), "woql:right" -> term(b))
    case Cmp("<", a, b) => JObject(t("Less"), "woql:left" -> term(a), "woql:right" -> term(b))
    case Cmp(">", a, b) => JObject(t("Greater"), "woql:left" -> term(a), "woql:right" -> term(b))
    case True => JObject(t("True"))
    case False => JObject(t("False"))
    case Limit(n, x) => JObject(t("Limit"),
      "woql:limit" -> wrap("xsd:nonNegativeInteger", JInt(BigInt(n))),
      "woql:query" -> toJson(x))
    case Start(n, x) => JObject(t("Start"),
      "woql:start" -> wrap("xsd:nonNegativeInteger", JInt(BigInt(n))),
      "woql:query" -> toJson(x))
    case OrderBy(specs, x) => JObject(t("OrderBy"),
      "woql:variable_ordering" -> JArray(specs.zipWithIndex.toList.map { case ((n, asc), i) =>
        JObject(t("VariableOrdering"), idx(i),
          "woql:variable" -> JObject(t("Variable"),
            "woql:variable_name" -> wrap("xsd:string", JString(n))),
          "woql:ascending" -> wrap("xsd:boolean", JBool(asc)))
      }),
      "woql:query" -> toJson(x))
    case Eval(e, into) => JObject(t("Eval"),
      "woql:expression" -> arith(e), "woql:result" -> term(V(into)))
    case PathQ(_, _, _, _, ew) if ew.nonEmpty =>
      throw new IllegalArgumentException(
        "Path with an edge-object variable is not expressible in the " +
          "v3 wire format — drop the edges variable before serializing")
    case PathQ(s, pat, o, w, _) =>
      val base = List(t("Path"), "woql:subject" -> term(s),
        "woql:path_pattern" -> path(pat), "woql:object" -> term(o))
      JObject(w.map(n => base :+ ("woql:path" -> term(V(n)))).getOrElse(base): _*)
    case GroupBy(tmpl, by, x, into) => JObject(t("GroupBy"),
      "woql:group_template" -> JArray(tmpl.zipWithIndex.toList.map { case (n, i) =>
        JObject(t("VariableListElement"), idx(i), "woql:variable_name" -> JString(n))
      }),
      "woql:group_by" -> JArray(by.zipWithIndex.toList.map { case (n, i) =>
        JObject(t("VariableListElement"), idx(i), "woql:variable_name" -> JString(n))
      }),
      "woql:query" -> toJson(x), "woql:grouped" -> term(V(into)))
    case CountQ(x, into) => JObject(t("Count"),
      "woql:query" -> toJson(x), "woql:count" -> term(V(into)))
    case SumList(l, into) => JObject(t("Sum"),
      "woql:list" -> term(V(l)), "woql:result" -> term(V(into)))
    case LengthList(l, into) => JObject(t("Length"),
      "woql:list" -> term(V(l)), "woql:result" -> term(V(into)))
    case other => throw new IllegalArgumentException(
      s"not in the v3 wire subset: ${other.getClass.getSimpleName} — use the v10 writer")
  }
}
