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
  * The subset below covers the operators stored v3 queries use
  * (triple/quad, and/or, select, not/opt, when, equals, compare,
  * limit/start, order_by, eval arithmetic, path patterns, group_by, and
  * the AddTriple/DeleteTriple update leaves via `parseUpdate`); anything
  * else raises with the unknown type name so callers can migrate to the
  * v10 reader.
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
        // decimal as @value STRING (lossless — JSON doubles round-trip
        // through float64 and cannot carry (38,18); v3 clients and our
        // v3 writer both use the string form)
        case (JString("xsd:decimal"), s: String) => Dec(BigDecimal(s))
        case (JString("xsd:decimal" | "xsd:double" | "xsd:float"), x: Double) => Dbl(x)
        case (JString("xsd:double" | "xsd:float"), b: BigDecimal) => Dbl(b.toDouble)
        case (JString("xsd:boolean"), b: Boolean) => Bool(b)
        case (_, s: String) => Str(s)
        case (_, other) => throw new IllegalArgumentException(s"bad v3 datatype $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported v3 term woql:$other")
  }

  /** v3 arithmetic tree: binary ops carry `woql:first`/`woql:second`;
    * leaves are `woql:ArithmeticValue` wrappers or bare terms. */
  def toArith(j: JValue): ArithE = typ(j) match {
    case "Plus"   => ABin("+", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Minus"  => ABin("-", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Times"  => ABin("*", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Divide" => ABin("/", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Div"    => ABin("div", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Exp"    => ABin("exp", toArith(j \ "woql:first"), toArith(j \ "woql:second"))
    case "Floor"  => AFloor(toArith(j \ "woql:argument"))
    case "ArithmeticValue" => ATerm(toTerm(j \ "woql:arithmetic_value"))
    case _ => ATerm(toTerm(j))
  }

  /** v3 path patterns (`woql:path_pattern` trees). */
  def toPath(j: JValue): PathPat = typ(j) match {
    case "PathPredicate" => PPred(str(j \ "woql:path_predicate"))
    case "InversePathPredicate" => PInv(str(j \ "woql:path_predicate"))
    case "PathSequence" =>
      PSeq(toPath(j \ "woql:path_first"), toPath(j \ "woql:path_second"))
    case "PathOr" =>
      PAlt(toPath(j \ "woql:path_left"), toPath(j \ "woql:path_right"))
    case "PathPlus" => PPlus(toPath(j \ "woql:path_pattern"))
    case "PathStar" => PStar(toPath(j \ "woql:path_pattern"))
    case "PathTimes" => PTimes(toPath(j \ "woql:path_pattern"),
      int(j \ "woql:from").toInt, int(j \ "woql:to").toInt)
    case other => throw new IllegalArgumentException(
      s"unsupported v3 path pattern woql:$other")
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
    case "Using" => Using(
      (j \ "woql:collection") match {
        case JString(s) => s
        case o => (o \ "@value") match {
          case JString(s) => s
          case other => throw new IllegalArgumentException(s"bad collection $other")
        }
      }, toWoql(j \ "woql:query"))
    case "Optional" | "Opt" => Opt(toWoql(j \ "woql:query"))
    case "Immediately" => Immediately(toWoql(j \ "woql:query"))
    case "When" => WhenQ(toWoql(j \ "woql:query"), toWoql(j \ "woql:consequent"))
    case "Equals" => Eq(toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "Less" => Cmp("<", toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "Greater" => Cmp(">", toTerm(j \ "woql:left"), toTerm(j \ "woql:right"))
    case "True" => True
    case "False" => False
    case "Limit" => Limit(int(j \ "woql:limit"), toWoql(j \ "woql:query"))
    case "Start" => Start(int(j \ "woql:start"), toWoql(j \ "woql:query"))
    case "OrderBy" =>
      val specs = j \ "woql:variable_ordering" match {
        case JArray(xs) => xs.sortBy(x => int(x \ "woql:index")).map { x =>
          val v = str(x \ "woql:variable" \ "woql:variable_name" match {
            case JNothing => x \ "woql:variable"
            case w => w
          })
          val asc = x \ "woql:ascending" match {
            case JBool(b) => b
            case w => w \ "@value" match { case JBool(b) => b; case _ => true }
          }
          (v, asc)
        }
        case other => throw new IllegalArgumentException(
          s"expected woql:variable_ordering list, got $other")
      }
      OrderBy(specs, toWoql(j \ "woql:query"))
    case "Eval" =>
      Eval(toArith(j \ "woql:expression"), varName(j \ "woql:result"))
    case "Path" =>
      val w = j \ "woql:path" match {
        case JNothing => None
        case p => Some(varName(p))
      }
      PathQ(toTerm(j \ "woql:subject"), toPath(j \ "woql:path_pattern"),
        toTerm(j \ "woql:object"), w)
    case "GroupBy" =>
      GroupBy(listOf(j, "woql:group_template").map(varName),
        listOf(j, "woql:group_by").map(varName),
        toWoql(j \ "woql:query"), varName(j \ "woql:grouped"))
    case "Count" => CountQ(toWoql(j \ "woql:query"), varName(j \ "woql:count"))
    case "Sum" => SumList(varName(j \ "woql:list"), varName(j \ "woql:result"))
    case "Length" => LengthList(varName(j \ "woql:list"), varName(j \ "woql:result"))
    // update leaves parse to True in the READ view; `parseUpdate` collects
    // them into staging templates (the engine's Updates.stage contract)
    case "AddTriple" | "DeleteTriple" => True
    case other => throw new IllegalArgumentException(
      s"unsupported v3 WOQL op woql:$other — use the v10 reader (JsonWoql)")
  }

  /** A `woql:Variable` node, a bare name, or an `@value` wrapper. */
  private def varName(j: JValue): String = j match {
    case JString(s) => s
    case o if (o \ "woql:variable_name") != JNothing => str(o \ "woql:variable_name")
    case o => str(o)
  }

  /** Parse a v3 UPDATE query: returns the read query (update leaves
    * replaced by True) plus the collected insert/delete triple templates,
    * matching `Updates.stage(q, inserts, deletes)`. Conditional updates
    * (`woql:When`-wrapped) keep their read-side semantics through the
    * engine's null-template skip only when staged via the v10 WhenQ path;
    * v3 callers with when-updates should migrate (documented subset). */
  def parseUpdate(json: String): (Woql, Seq[(Term, Term, Term)], Seq[(Term, Term, Term)]) = {
    val root = JsonMethods.parse(json)
    val adds = scala.collection.mutable.ArrayBuffer.empty[(Term, Term, Term)]
    val dels = scala.collection.mutable.ArrayBuffer.empty[(Term, Term, Term)]
    def walk(j: JValue): Unit = j match {
      case o: JObject =>
        (o \ "@type") match {
          case JString("woql:AddTriple") =>
            adds += ((toTerm(o \ "woql:subject"), toTerm(o \ "woql:predicate"),
              toTerm(o \ "woql:object")))
          case JString("woql:DeleteTriple") =>
            dels += ((toTerm(o \ "woql:subject"), toTerm(o \ "woql:predicate"),
              toTerm(o \ "woql:object")))
          case _ => o.obj.foreach { case (_, v) => walk(v) }
        }
      case JArray(xs) => xs.foreach(walk)
      case _ => ()
    }
    walk(root)
    (toWoql(root), adds.toSeq, dels.toSeq)
  }
}
