package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** WOQL JSON (v10-class-name style) → AST parser (SURVEY §2, reference:
  * core/query/json_woql.pl — the JSON-LD reader; v10 names each operator
  * as a class `{"@type": "Select", ...}`). This covers the operator
  * subset the engine implements so reference users can ship their
  * existing JSON queries; field names follow the v10 woql schema
  * (`subject/predicate/object`, `variables`, `query`, `and`, `or`, …).
  */
object JsonWoql {

  def parse(json: String): Woql = toWoql(JsonMethods.parse(json))

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  private def strs(j: JValue): Seq[String] = j match {
    case JArray(xs) => xs.map(str)
    case JString(s) => Seq(s)
    case other => throw new IllegalArgumentException(s"expected strings, got $other")
  }

  /** NodeValue / Value / DataValue term positions. */
  def toTerm(j: JValue): Term = j match {
    case JString(s) => Node(s)
    case o: JObject =>
      (o \ "variable") match {
        case JString(v) => V(v)
        case _ => (o \ "node") match {
          case JString(n) => Node(n)
          case _ => (o \ "data") match {
            case d: JObject => dataLit(d)
            case _ => (o \ "@value") match {
              case JNothing => throw new IllegalArgumentException(s"bad term $o")
              case _ => dataLit(o)
            }
          }
        }
      }
    case other => throw new IllegalArgumentException(s"bad term $other")
  }

  private def dataLit(o: JObject): Term = {
    val v = o \ "@value"
    (o \ "@type") match {
      case JString("xsd:string") => (o \ "@language") match {
        case JString(lang) => Str(str(v), lang)
        case _ => Str(str(v))
      }
      case JString("xsd:integer") | JString("xsd:long") => v match {
        case JInt(i) => Lng(i.toLong)
        case JString(s) => Lng(s.toLong)
        case other => throw new IllegalArgumentException(s"bad integer $other")
      }
      // exact decimal when the wire value is exact (string/int/decimal
      // node); a JSON double literal stays double — the writer already
      // narrowed it
      case JString("xsd:decimal") => v match {
        case JDouble(d) => Dbl(d)
        case JInt(i) => Dec(BigDecimal(i))
        case JDecimal(d) => Dec(d)
        case JString(s) => Dec(BigDecimal(s))
        case other => throw new IllegalArgumentException(s"bad decimal $other")
      }
      case JString("xsd:double") | JString("xsd:float") => v match {
        case JDouble(d) => Dbl(d)
        case JInt(i) => Dbl(i.toDouble)
        case JDecimal(d) => Dbl(d.toDouble)
        case JString(s) => Dbl(s.toDouble)
        case other => throw new IllegalArgumentException(s"bad double $other")
      }
      case JString("xsd:boolean") => v match {
        case JBool(b) => Bool(b)
        case other => throw new IllegalArgumentException(s"bad boolean $other")
      }
      case JString("xsd:dateTime") =>
        Ts(java.sql.Timestamp.from(java.time.Instant.parse(str(v))))
      case _ => v match { // untyped @value: infer
        case JString(s) => Str(s)
        case JInt(i) => Lng(i.toLong)
        case JDouble(d) => Dbl(d)
        case JBool(b) => Bool(b)
        case other => throw new IllegalArgumentException(s"bad literal $other")
      }
    }
  }

  private def varName(j: JValue): String = j match {
    case JString(s) => s
    case o: JObject => str(o \ "variable")
    case other => throw new IllegalArgumentException(s"expected variable, got $other")
  }

  def toPath(j: JValue): PathPat = j \ "@type" match {
    case JString("PathPredicate") => PPred(str(j \ "predicate"))
    case JString("InversePathPredicate") => PInv(str(j \ "predicate"))
    case JString("PathSequence") =>
      val JArray(xs) = (j \ "sequence"): @unchecked
      xs.map(toPath).reduce(PSeq(_, _))
    case JString("PathOr") =>
      val JArray(xs) = (j \ "or"): @unchecked
      xs.map(toPath).reduce(PAlt(_, _))
    case JString("PathPlus") => PPlus(toPath(j \ "plus"))
    case JString("PathStar") => PStar(toPath(j \ "star"))
    case JString("PathTimes") =>
      val JInt(from) = (j \ "from"): @unchecked
      val JInt(to) = (j \ "to"): @unchecked
      PTimes(toPath(j \ "times"), from.toInt, to.toInt)
    case other => throw new IllegalArgumentException(s"bad path pattern $other")
  }

  def toArith(j: JValue): ArithE = j \ "@type" match {
    case JString("Plus")   => ABin("+", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Minus")  => ABin("-", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Times")  => ABin("*", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Divide") => ABin("/", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Div")    => ABin("div", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Exp")    => ABin("exp", toArith(j \ "left"), toArith(j \ "right"))
    case JString("Floor")  => AFloor(toArith(j \ "argument"))
    case _ => ATerm(toTerm(j))
  }

  def toWoql(j: JValue): Woql = j \ "@type" match {
    case JString("Triple") =>
      TriplePat(toTerm(j \ "subject"), toTerm(j \ "predicate"), toTerm(j \ "object"),
        j \ "graph" match { case JString(g) => g; case _ => "instance" })
    case JString("AddedTriple") =>
      AddedTriple(toTerm(j \ "subject"), toTerm(j \ "predicate"), toTerm(j \ "object"),
        str(j \ "commit"))
    case JString("RemovedTriple") =>
      RemovedTriple(toTerm(j \ "subject"), toTerm(j \ "predicate"), toTerm(j \ "object"),
        str(j \ "commit"))
    case JString("And") =>
      val JArray(xs) = (j \ "and"): @unchecked
      And(xs.map(toWoql))
    case JString("Or") =>
      val JArray(xs) = (j \ "or"): @unchecked
      Or(xs.map(toWoql))
    case JString("Not") => Not(toWoql(j \ "query"))
    case JString("Optional" | "Opt") => Opt(toWoql(j \ "query"))
    case JString("Once") => Once(toWoql(j \ "query"))
    case JString("Immediately") => Immediately(toWoql(j \ "query"))
    case JString("When") => WhenQ(toWoql(j \ "query"), toWoql(j \ "consequent"))
    case JString("Using") => Using(str(j \ "collection"), toWoql(j \ "query"))
    case JString("True") => True
    case JString("Select") => Select(strs(j \ "variables"), toWoql(j \ "query"))
    case JString("Distinct") => Distinct(strs(j \ "variables"), toWoql(j \ "query"))
    case JString("Equals") => Eq(toTerm(j \ "left"), toTerm(j \ "right"))
    case JString("Less") => Cmp("<", toTerm(j \ "left"), toTerm(j \ "right"))
    case JString("Greater") => Cmp(">", toTerm(j \ "left"), toTerm(j \ "right"))
    case JString("Like") =>
      LikeSim(toTerm(j \ "left"), toTerm(j \ "right"), varName(j \ "similarity"))
    case JString("IsA") => Isa(toTerm(j \ "element"), toTerm(j \ "of_type"))
    case JString("Subsumption") =>
      Subsumption(toTerm(j \ "child"), toTerm(j \ "parent"))
    case JString("TypeOf") => TypeOf(toTerm(j \ "value"), toTerm(j \ "type"))
    case JString("OrderBy") =>
      val JArray(specs) = (j \ "ordering"): @unchecked
      OrderBy(specs.map {
        case o: JObject => (varName(o \ "variable"),
          (o \ "order") match { case JString("desc") => false; case _ => true })
        case JString(v) => (v, true)
        case other => throw new IllegalArgumentException(s"bad ordering $other")
      }, toWoql(j \ "query"))
    case JString("Limit") =>
      val JInt(n) = (j \ "limit"): @unchecked
      Limit(n.toLong, toWoql(j \ "query"))
    case JString("Start") =>
      val JInt(n) = (j \ "start"): @unchecked
      Start(n.toLong, toWoql(j \ "query"))
    case JString("GroupBy") =>
      GroupBy(strs(j \ "template"), strs(j \ "group_by"), toWoql(j \ "query"),
        varName(j \ "grouped"))
    case JString("Count") => CountQ(toWoql(j \ "query"), varName(j \ "count"))
    case JString("Sum") => SumList(varName(j \ "list"), varName(j \ "result"))
    case JString("Length") => LengthList(varName(j \ "list"), varName(j \ "result"))
    case JString("Eval") => Eval(toArith(j \ "expression"), varName(j \ "result"))
    case JString("Concatenate") =>
      val JArray(xs) = (j \ "list"): @unchecked
      ConcatList(xs.map(toTerm), varName(j \ "result"))
    case JString("Trim") => TrimS(toTerm(j \ "untrimmed"), varName(j \ "trimmed"))
    case JString("Upper") => UpperS(toTerm(j \ "mixed"), varName(j \ "upper"))
    case JString("Lower") => LowerS(toTerm(j \ "mixed"), varName(j \ "lower"))
    case JString("Pad") =>
      PadS(toTerm(j \ "string"), str(j \ "char"), toTerm(j \ "times"),
        varName(j \ "result"))
    case JString("Split") =>
      SplitS(toTerm(j \ "string"), str(j \ "pattern"), varName(j \ "list"))
    case JString("Join") =>
      JoinS(varName(j \ "list"), str(j \ "separator"), varName(j \ "result"))
    case JString("Substring") =>
      SubstrS(toTerm(j \ "string"), toTerm(j \ "before"), toTerm(j \ "length"),
        varName(j \ "after"), varName(j \ "substring"))
    case JString("Regexp") =>
      ReMatch(str(j \ "pattern"), toTerm(j \ "string"), varName(j \ "result"))
    case JString("Typecast") =>
      CastQ(toTerm(j \ "value"), str(j \ "type"), varName(j \ "result"))
    case JString("HashKey") =>
      val JArray(xs) = (j \ "key_list"): @unchecked
      HashKey(str(j \ "base"), xs.map(toTerm), varName(j \ "uri"))
    case JString("LexicalKey") =>
      val JArray(xs) = (j \ "key_list"): @unchecked
      LexKey(str(j \ "base"), xs.map(toTerm), varName(j \ "uri"))
    case JString("RandomKey") =>
      RandomKey(str(j \ "base"), varName(j \ "uri"))
    case JString("Member") =>
      MemberQ(varName(j \ "member"), varName(j \ "list"))
    case JString("Dot") =>
      DotQ(toTerm(j \ "document"), str(j \ "field"), varName(j \ "value"))
    case JString("Path") =>
      // optional 4th argument binds the path witness
      val w = j \ "path" match {
        case JNothing => None
        case p => Some(varName(p))
      }
      PathQ(toTerm(j \ "subject"), toPath(j \ "pattern"), toTerm(j \ "object"), w)
    // update leaves parse to True only inside [[parseUpdate]]'s read
    // view (which collects them into staging templates, same design as
    // the v3 reader); plain [[parse]] keeps the LOUD failure — a read
    // path silently discarding writes would be data loss
    case JString("AddTriple") | JString("DeleteTriple") =>
      if (writeView.value) True
      else throw new IllegalArgumentException(
        "AddTriple/DeleteTriple are write operations — execute them " +
          "through parseUpdate (POST /api/woql) rather than the " +
          "read-only parse")
    case other => throw new IllegalArgumentException(s"unsupported WOQL op $other")
  }

  private val writeView = new scala.util.DynamicVariable(false)

  /** One collected write template: (s, p, o, graph, isInsert). */
  type WriteTemplate = (Term, Term, Term, String, Boolean)

  /** Parse a v10 UPDATE query ([ref:core/query/woql_compile.pl]
    * AddTriple/DeleteTriple compiled against the transaction builder):
    * returns the read query (update leaves replaced by True) plus every
    * collected write template with its graph — the shape
    * `Updates.stage(q, inserts, deletes, graph)` consumes per graph
    * group. An AST with no templates is a plain read query. */
  def parseUpdate(json: String): (Woql, Seq[WriteTemplate]) = {
    val root = JsonMethods.parse(json)
    val writes = scala.collection.mutable.ArrayBuffer.empty[WriteTemplate]
    def graphOf(o: JValue): String = o \ "graph" match {
      case JString(g) => g; case _ => "instance"
    }
    def walk(j: JValue): Unit = j match {
      case o: JObject =>
        (o \ "@type") match {
          case JString("AddTriple") =>
            writes += ((toTerm(o \ "subject"), toTerm(o \ "predicate"),
              toTerm(o \ "object"), graphOf(o), true))
          case JString("DeleteTriple") =>
            writes += ((toTerm(o \ "subject"), toTerm(o \ "predicate"),
              toTerm(o \ "object"), graphOf(o), false))
          case _ => o.obj.foreach { case (_, v) => walk(v) }
        }
      case JArray(xs) => xs.foreach(walk)
      case _ => ()
    }
    walk(root)
    (writeView.withValue(true)(toWoql(root)), writes.toSeq)
  }
}
