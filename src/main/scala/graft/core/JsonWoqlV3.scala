package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pre-v10 ("v3") WOQL JSON-LD reader (reference: core/query/json_woql.pl
  * — the JSON-LD branch; wire format of the older terminusdb clients).
  *
  * Shape differences from the v10 class style handled here:
  *  - every key/type carries a `woql:` prefix (`woql:And`,
  *    `woql:query_list`, …);
  *  - n-ary connectives wrap children in indexed list elements
  *    (`woql:QueryListElement` with `woql:index` + `woql:query`);
  *  - `select` carries `woql:variable_list` of indexed
  *    `woql:VariableListElement`s;
  *  - terms are `woql:Node` / `woql:Variable` / `woql:Datatype` objects
  *    whose scalars are `{"@value": …, "@type": "xsd:…"}` wrappers.
  *
  * The subset below covers the operators stored v3 queries use most
  * (triple/quad, and/or, select, not/opt, equals, compare, limit/start,
  * order_by); anything else raises with the unknown type name so callers
  * can migrate to the v10 reader.
  */
object JsonWoqlV3 {

  def parse(json: String): Woql = toWoql(JsonMethods.parse(json))

  private def typ(j: JValue): String = j \ "@type" match {
    case JString(s) => s.stripPrefix("woql:")
    case _ => throw new IllegalArgumentException(s"v3 node without @type: $j")
  }

  /** Unwrap `{"@value": v, "@type": "xsd:…"}` to a scala value. */
  private def value(j: JValue): Any = j \ "@value" match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JDouble(d) => d
    case JDecimal(d) => d
    case JBool(b) => b
    case _ => throw new IllegalArgumentException(s"bad @value wrapper: $j")
  }

  /** Bare JSON string or an `@value` wrapper — v3 uses both. */
  private def str(j: JValue): String = j match {
    case JString(s) => s
    case _ => value(j).toString
  }

  private def int(j: JValue): Long = value(j) match {
    case l: Long => l
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(s"expected int, got $other")
  }

  /** Indexed list elements → children ordered by woql:index. */
  private def listOf(j: JValue, field: String): Seq[JValue] = j \ field match {
    case JArray(xs) => xs.sortBy(x => int(x \ "woql:index")).map { x =>
      (x \ "woql:query", x \ "woql:variable_name") match {
        case (JNothing, v) => v
        case (q, _) => q
      }
    }
    case other => throw new IllegalArgumentException(s"expected $field list, got $other")
  }

  def toTerm(j: JValue): Term = typ(j) match {
    case "Node" => Node(str(j \ "woql:node"))
    case "Variable" => V(str(j \ "woql:variable_name"))
    case "Datatype" =>
      val d = j \ "woql:datatype"
      (d \ "@type", value(d)) match {
        case (JString("xsd:string"), s: String) => Str(s)
        case (JString("xsd:integer" | "xsd:long"), l: Long) => Lng(l)
        case (JString("xsd:integer" | "xsd:long"), s: String) => Lng(s.toLong)
        case (JString("xsd:decimal"), b: BigDecimal) => Dec(b)
        case (JString("xsd:decimal"), l: Long) => Dec(BigDecimal(l))
        case (JString("xsd:decimal" | "xsd:double" | "xsd:float"), x: Double) => Dbl(x)
        case (JString("xsd:double" | "xsd:float"), b: BigDecimal) => Dbl(b.toDouble)
        case (JString("xsd:boolean"), b: Boolean) => Bool(b)
        case (_, s: String) => Str(s)
        case (_, other) => throw new IllegalArgumentException(s"bad v3 datatype $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported v3 term woql:$other")
  }

  def toWoql(j: JValue): Woql = typ(j) match {
    case "Triple" => TriplePat(toTerm(j \ "woql:subject"),
      toTerm(j \ "woql:predicate"), toTerm(j \ "woql:object"))
    case "Quad" => TriplePat(toTerm(j \ "woql:subject"),
      toTerm(j \ "woql:predicate"), toTerm(j \ "woql:object"),
      str(j \ "woql:graph_filter"))
    case "And" => And(listOf(j, "woql:query_list").map(toWoql))
    case "Or" => Or(listOf(j, "woql:query_list").map(toWoql))
    case "Select" =>
      Select(listOf(j, "woql:variable_list").map(str), toWoql(j \ "woql:query"))
    case "Not" => Not(toWoql(j \ "woql:query"))
    case "Optional" | "Opt" => Opt(toWoql(j \ "woql:query"))
    case "When" => WhenQ(toWoql(j \ "woql:query"), toWoql(j \ "woql:consequent"))
    case "Equals" => Eq(toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "Less" => Cmp("<", toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "Greater" => Cmp(">", toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "Limit" => Limit(int(j \ "woql:limit"), toWoql(j \ "woql:query"))
    case "Start" => Start(int(j \ "woql:start"), toWoql(j \ "woql:query"))
    case other => throw new IllegalArgumentException(
      s"unsupported v3 WOQL op woql:$other — use the v10 reader (JsonWoql)")
  }
}
