package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.storage.Eav

/** Turtle reader/writer for bulk graph load/dump (SURVEY §2.1;
  * reference: core/triple/turtle_utils.pl). Supported: @prefix /
  * @base AND SPARQL-style PREFIX / BASE directives (case-insensitive,
  * dotless), <iri> refs, prefixed names, `a` for rdf:type, `;` / `,`
  * continuation syntax, plain/typed/lang literals in all four quote
  * forms (`"…"`, `'…'`, `"""…"""`, `'''…'''`), ECHAR + \uXXXX /
  * \UXXXXXXXX escapes, integers, decimals, doubles, booleans,
  * blank-node labels (`_:x`), anonymous blank nodes `[ ... ]` in
  * subject or object position (fresh `_:gbN` labels), and RDF
  * collections `( e1 e2 … )` in subject or object position (expanded
  * to the standard rdf:first / rdf:rest / rdf:nil chain over fresh
  * blanks; `()` is the node rdf:nil). Parsing is a pure function per
  * statement, so bulk load can run inside mapPartitions over
  * line-chunked input at scale; dump formats from the EAV frame. */
object Turtle {

  // ---- tokenizer ------------------------------------------------------
  private sealed trait Tok
  private case class TIri(v: String) extends Tok
  private case class TPName(v: String) extends Tok
  private case class TStr(v: String) extends Tok
  private case class TLang(v: String) extends Tok
  private case class TNum(v: String) extends Tok
  private case object TTypeSep extends Tok // ^^
  private case object TDot extends Tok
  private case object TSemi extends Tok
  private case object TComma extends Tok
  private case object TLBrack extends Tok // [
  private case object TRBrack extends Tok // ]
  private case object TLParen extends Tok // (
  private case object TRParen extends Tok // )
  private case class TDirective(v: String) extends Tok

  /** Append the char(s) of one string escape; `i` points at the char
    * AFTER the backslash; returns the index after the escape. Covers
    * the Turtle ECHAR set plus \\uXXXX and \\UXXXXXXXX numeric
    * escapes (appended as code points — astral chars become surrogate
    * pairs). */
  private def appendEscape(s: String, i: Int, sb: StringBuilder): Int =
    s(i) match {
      case 'n' => sb += '\n'; i + 1
      case 't' => sb += '\t'; i + 1
      case 'r' => sb += '\r'; i + 1
      case 'b' => sb += '\b'; i + 1
      case 'f' => sb += '\f'; i + 1
      case 'u' =>
        if (i + 4 >= s.length) throw new IllegalArgumentException(
          "truncated \\u escape")
        sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
        i + 5
      case 'U' =>
        if (i + 8 >= s.length) throw new IllegalArgumentException(
          "truncated \\U escape")
        sb.append(new String(Character.toChars(
          Integer.parseInt(s.substring(i + 1, i + 9), 16))))
        i + 9
      case other => sb += other; i + 1
    }

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '#' => while (i < s.length && s(i) != '\n') i += 1
        case '<' =>
          val j = s.indexOf('>', i)
          if (j < 0) throw new IllegalArgumentException(
            s"unterminated IRI starting at offset $i")
          out += TIri(s.substring(i + 1, j)); i = j + 1
        case q @ ('"' | '\'') if s.startsWith(s"$q$q$q", i) =>
          // long (triple-quoted) string, double- OR single-quoted:
          // literal newlines/quotes allowed. Per the Turtle grammar the
          // content may contain runs of one or two unescaped delimiter
          // quotes, so the CLOSING delimiter is greedy: in a run of
          // n >= 3 quotes, n-3 belong to the content ("""ab"""" has
          // content ab").
          val sb = new StringBuilder; i += 3
          var closed = false
          while (!closed) {
            if (i >= s.length) throw new IllegalArgumentException(
              s"unterminated $q$q$q long string literal")
            if (s(i) == q) {
              var n = 0
              while (i + n < s.length && s(i + n) == q) n += 1
              if (n >= 3) {
                if (n > 5) throw new IllegalArgumentException(
                  s"run of $n quotes after long string content — at most 2 " +
                    s"unescaped quotes may precede the closing $q$q$q")
                sb.append(q.toString * (n - 3)); i += n; closed = true
              } else { sb.append(q.toString * n); i += n }
            } else if (s(i) == '\\') {
              if (i + 1 >= s.length) throw new IllegalArgumentException(
                "dangling escape at end of long string literal")
              i = appendEscape(s, i + 1, sb)
            } else { sb += s(i); i += 1 }
          }
          out += TStr(sb.toString)
        case q @ ('"' | '\'') =>
          val sb = new StringBuilder; i += 1
          while (i < s.length && s(i) != q) {
            if (s(i) == '\\') {
              if (i + 1 >= s.length) throw new IllegalArgumentException(
                "dangling escape at end of string literal")
              i = appendEscape(s, i + 1, sb)
            } else { sb += s(i); i += 1 }
          }
          if (i >= s.length) throw new IllegalArgumentException(
            s"unterminated $q string literal")
          i += 1; out += TStr(sb.toString)
        case '@' =>
          val j0 = i + 1; var j = j0
          while (j < s.length && (s(j).isLetterOrDigit || s(j) == '-')) j += 1
          val word = s.substring(j0, j)
          if (word == "prefix" || word == "base") out += TDirective(word)
          else out += TLang(word)
          i = j
        case '^' if i + 1 < s.length && s(i + 1) == '^' => out += TTypeSep; i += 2
        case '.' => out += TDot; i += 1
        case ';' => out += TSemi; i += 1
        case ',' => out += TComma; i += 1
        case '[' => out += TLBrack; i += 1
        case ']' => out += TRBrack; i += 1
        case '(' => out += TLParen; i += 1
        case ')' => out += TRParen; i += 1
        case c if c.isDigit || c == '-' || c == '+' =>
          val j0 = i
          while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
          // a trailing '.' is the statement terminator, not part of the number
          var tok = s.substring(j0, i)
          if (tok.endsWith(".")) { tok = tok.dropRight(1); i -= 1 }
          out += TNum(tok)
        case _ =>
          val j0 = i
          while (i < s.length && !s(i).isWhitespace &&
            !".;,^<\"'#[]()".contains(s(i))) i += 1
          out += TPName(s.substring(j0, i))
      }
    }
    out.toList
  }

  // ---- parser ---------------------------------------------------------
  private def dec18(v: String): java.math.BigDecimal =
    new java.math.BigDecimal(v).setScale(18)

  private def mkRow(s: String, p: String, o: Tok, typ: Option[String],
                    lang: Option[String]): Row = o match {
    case TIri(i) => Row("instance", s, p, "i", i, null, null, null, null, null, null, null, null)
    case TPName("true") => Row("instance", s, p, "l", null, "xsd:boolean", null, null, null, null, java.lang.Boolean.TRUE, null, null)
    case TPName("false") => Row("instance", s, p, "l", null, "xsd:boolean", null, null, null, null, java.lang.Boolean.FALSE, null, null)
    case TPName(i) => Row("instance", s, p, "i", i, null, null, null, null, null, null, null, null)
    case TNum(n) if n.matches("[+-]?\\d+") =>
      Row("instance", s, p, "l", null, "xsd:integer", null, null, java.lang.Long.valueOf(n.toLong), null, null, null, null)
    case TNum(n) if !n.toLowerCase.contains("e") =>
      // turtle grammar: a plain `3.14` is xsd:decimal; exponent → double
      Row("instance", s, p, "l", null, "xsd:decimal", null, null, null, null, null, null, dec18(n))
    case TNum(n) =>
      Row("instance", s, p, "l", null, "xsd:double", null, java.lang.Double.valueOf(n.toDouble), null, null, null, null, null)
    case TStr(v) => typ match {
      case Some("xsd:integer") =>
        Row("instance", s, p, "l", null, "xsd:integer", null, null, java.lang.Long.valueOf(v.toLong), null, null, null, null)
      case Some("xsd:decimal") =>
        Row("instance", s, p, "l", null, "xsd:decimal", null, null, null, null, null, null, dec18(v))
      case Some("xsd:double") =>
        Row("instance", s, p, "l", null, "xsd:double", null, java.lang.Double.valueOf(v.toDouble), null, null, null, null, null)
      case Some("xsd:boolean") =>
        Row("instance", s, p, "l", null, "xsd:boolean", null, null, null, null, java.lang.Boolean.valueOf(v.toBoolean), null, null)
      case Some(t) => Row("instance", s, p, "l", null, t, v, null, null, null, null, null, null)
      case None => Row("instance", s, p, "l", null, "xsd:string", v, null, null, null, null, lang.orNull, null)
    }
    case other => throw new IllegalArgumentException(s"bad object token $other")
  }

  /** Parse turtle text into EAV rows. */
  /** Simplified RFC 3986 resolution for relative IRI refs: scheme'd
    * refs pass through; `#frag` replaces the base's fragment; `/abs`
    * keeps the base's authority; anything else resolves against the
    * base's last path segment. (No ../ normalization — the reference
    * corpus never emits dot-segments.) */
  private def resolveIri(base: Option[String], i: String): String =
    if (base.isEmpty || i.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*")) i
    else {
      val b = base.get
      if (i.startsWith("#")) b.takeWhile(_ != '#') + i
      else if (i.startsWith("/"))
        b.replaceAll("^([A-Za-z][A-Za-z0-9+.\\-]*://[^/]*).*", "$1") + i
      else b.substring(0, b.lastIndexOf('/') + 1) + i
    }

  def parse(text: String): Seq[Row] = {
    // resolve relative IRI refs in one forward pass — @base / BASE
    // apply to every <ref> AFTER them (incl. @prefix expansions);
    // the base IRI itself must be absolute and passes through
    val toks = {
      var base: Option[String] = None
      val out = List.newBuilder[Tok]
      var rest0 = tokenize(text)
      while (rest0.nonEmpty) rest0 match {
        case (d @ TDirective("base")) :: TIri(b) :: tl =>
          base = Some(b); out += d; out += TIri(b); rest0 = tl
        case (p @ TPName(w)) :: TIri(b) :: tl if w.equalsIgnoreCase("base") =>
          base = Some(b); out += p; out += TIri(b); rest0 = tl
        case TIri(i) :: tl =>
          out += TIri(resolveIri(base, i)); rest0 = tl
        case t :: tl => out += t; rest0 = tl
      }
      out.result()
    }
    val prefixes = scala.collection.mutable.Map[String, String]()
    val rows = scala.collection.mutable.ListBuffer[Row]()

    def expand(name: String): String = {
      if (name == "a") "rdf:type"
      else {
        val idx = name.indexOf(':')
        if (idx >= 0 && prefixes.contains(name.substring(0, idx + 1)))
          prefixes(name.substring(0, idx + 1)) + name.substring(idx + 1)
        else name
      }
    }
    def nodeOf(t: Tok): String = t match {
      case TIri(i) => i
      case TPName(n) => expand(n)
      case other => throw new IllegalArgumentException(s"expected node, got $other")
    }

    var bnodeN = 0
    def freshBlank(): String = { bnodeN += 1; s"_:gb$bnodeN" }

    /** RDF collection `( e1 e2 … )` → rdf:first/rdf:rest chain over
      * fresh blanks (standard expansion); returns (head node, tokens
      * after the closing paren). `()` is the node rdf:nil. Items may be
      * literals (with ^^/@ suffix), nodes, nested `[ … ]`, or nested
      * collections. */
    def parseCollection(tl0: List[Tok]): (String, List[Tok]) = {
      var tl = tl0
      val cells = scala.collection.mutable.ListBuffer[String]()
      while (tl.nonEmpty && tl.head != TRParen) {
        val cell = freshBlank()
        tl = tl match {
          case TLBrack :: restIn =>
            val b = freshBlank()
            rows += mkRow(cell, "rdf:first", TIri(b), None, None)
            restIn match {
              case TRBrack :: r2 => r2
              case r => predObjList(b, r) match {
                case TRBrack :: r2 => r2
                case other => throw new IllegalArgumentException(
                  s"unclosed [ in collection at $other")
              }
            }
          case TLParen :: restIn =>
            val (inner, r2) = parseCollection(restIn)
            rows += mkRow(cell, "rdf:first", TIri(inner), None, None)
            r2
          case obj :: t2 =>
            val (typ, lang, t3a) = t2 match {
              case TTypeSep :: tt :: rest2 => (Some(nodeOf(tt)), None, rest2)
              case TLang(l) :: rest2 => (None, Some(l), rest2)
              case _ => (None, None, t2)
            }
            val objNorm = obj match {
              case TPName(n) if n != "true" && n != "false" => TPName(expand(n))
              case o => o
            }
            rows += mkRow(cell, "rdf:first", objNorm, typ, lang)
            t3a
          case Nil => throw new IllegalArgumentException("unterminated ( collection")
        }
        cells += cell
      }
      if (tl.isEmpty) throw new IllegalArgumentException("unterminated ( collection")
      val after = tl.tail // consume )
      if (cells.isEmpty) ("rdf:nil", after)
      else {
        cells.zip(cells.drop(1)).foreach { case (a, b) =>
          rows += mkRow(a, "rdf:rest", TIri(b), None, None) }
        rows += mkRow(cells.last, "rdf:rest", TIri("rdf:nil"), None, None)
        (cells.head, after)
      }
    }

    /** predicateObjectList for `subj`: consumes `p o (, o)* (; p o ...)*`
      * and returns the tokens from the closing TDot / TRBrack / Nil
      * (NOT consumed — the caller owns the terminator). Anonymous blank
      * nodes `[ ... ]` in object position recurse with a fresh label. */
    def predObjList(subj: String, tl0: List[Tok]): List[Tok] = {
      var tl = tl0
      var done = false
      while (!done) {
        val pred = tl.head match {
          case TPName(n) => expand(n)
          case TIri(i) => i
          case other => throw new IllegalArgumentException(s"expected predicate, got $other")
        }
        tl = tl.tail
        var objDone = false
        while (!objDone) {
          val t3 = tl match {
            case TLBrack :: restIn =>
              val b = freshBlank()
              rows += mkRow(subj, pred, TIri(b), None, None)
              restIn match {
                case TRBrack :: r2 => r2 // bare []
                case r => predObjList(b, r) match {
                  case TRBrack :: r2 => r2
                  case other => throw new IllegalArgumentException(s"unclosed [ at $other")
                }
              }
            case TLParen :: restIn =>
              val (node, r2) = parseCollection(restIn)
              rows += mkRow(subj, pred, TIri(node), None, None)
              r2
            case obj :: t2 =>
              // optional ^^type or @lang
              val (typ, lang, t3a) = t2 match {
                case TTypeSep :: tt :: rest2 => (Some(nodeOf(tt)), None, rest2)
                case TLang(l) :: rest2 => (None, Some(l), rest2)
                case _ => (None, None, t2)
              }
              val objNorm = obj match {
                case TPName(n) if n != "true" && n != "false" => TPName(expand(n))
                case o => o
              }
              rows += mkRow(subj, pred, objNorm, typ, lang)
              t3a
            case Nil => throw new IllegalArgumentException("expected object")
          }
          t3 match {
            case TComma :: rest2 => tl = rest2
            case TSemi :: rest2 => tl = rest2; objDone = true
            case _ => tl = t3; objDone = true; done = true // Dot/RBrack/Nil
          }
        }
      }
      tl
    }

    def endStatement(tl: List[Tok]): List[Tok] = tl match {
      case TDot :: r => r
      case Nil => Nil
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }

    var rest = toks
    while (rest.nonEmpty) rest match {
      case TDirective("prefix") :: TPName(pfx) :: TIri(iri) :: TDot :: tl =>
        prefixes(pfx) = iri; rest = tl
      case TDirective("base") :: TIri(_) :: TDot :: tl => rest = tl
      // SPARQL-style directives (Turtle 1.1): case-insensitive keyword,
      // NO trailing dot (one tolerated). The pname-with-trailing-colon
      // guard keeps a genuine subject named "prefix" parseable.
      case TPName(w) :: TPName(pfx) :: TIri(iri) :: tl
          if w.equalsIgnoreCase("prefix") && pfx.endsWith(":") =>
        prefixes(pfx) = iri
        rest = tl match { case TDot :: r => r; case r => r }
      case TPName(w) :: TIri(_) :: tl if w.equalsIgnoreCase("base") =>
        rest = tl match { case TDot :: r => r; case r => r }
      case TLBrack :: tl0 =>
        // blank-node subject: `[] p o .` / `[ p1 o1 ; ... ] p o .` /
        // `[ p1 o1 ] .`
        val b = freshBlank()
        val afterBracket = tl0 match {
          case TRBrack :: r => r
          case r => predObjList(b, r) match {
            case TRBrack :: r2 => r2
            case other => throw new IllegalArgumentException(s"unclosed [ at $other")
          }
        }
        rest = afterBracket match {
          case TDot :: r => r // property list only, no outer predicates
          case r => endStatement(predObjList(b, r))
        }
      case TLParen :: tl0 =>
        // collection subject: `( … ) p o .`
        val (node, after) = parseCollection(tl0)
        rest = endStatement(predObjList(node, after))
      case subjTok :: tl0 =>
        rest = endStatement(predObjList(nodeOf(subjTok), tl0))
    }
    rows.toSeq
  }

  def load(spark: SparkSession, text: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(parse(text)), Eav.schema)

  /** One formatted turtle statement per EAV row, built entirely from
    * column expressions — the dump stays distributed (codegen'd string
    * ops, no driver collect). IRIs dump as <…> for unambiguity. */
  /** Object-term formatter over the EAV `o_*` columns — shared by the
    * turtle dump here and the N-Triples/N-Quads dumps in [[NTriples]].
    * `canonical = false` emits turtle's compact bare tokens for
    * numerics/booleans; `canonical = true` emits strict N-Triples
    * (every literal quoted, with an explicit `^^<datatype>`). */
  private[sources] def objectTermCol(
      canonical: Boolean = false): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // short-form turtle literals cannot contain RAW newlines/tabs — and
    // the dump is one statement per text line, so control characters
    // MUST leave as \n-style escapes or the written file is corrupt
    def esc(c: org.apache.spark.sql.Column) = {
      val steps = Seq( // literal char -> escaped form (\x)
        "\\" -> "\\\\\\\\", "\"" -> "\\\\\"",
        "\n" -> "\\\\n", "\r" -> "\\\\r", "\t" -> "\\\\t")
      steps.foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
      }
    }
    val strLit = concat(lit("\""), esc(col("o_str")), lit("\""),
      when(col("o_lang").isNotNull, concat(lit("@"), col("o_lang"))).otherwise(lit("")))
    // canonical export must be interoperable strict N-Triples: the
    // store keeps datatypes prefixed (xsd:integer) but an external RDF
    // tool reads <xsd:integer> as an IRI with scheme "xsd" — expand to
    // the full XML-Schema IRI on the way out (the reader normalizes
    // full IRIs back to prefixed form, so round-trip is unchanged)
    def expandTyp(typ: org.apache.spark.sql.Column) =
      when(typ.startsWith("xsd:"),
        concat(lit("http://www.w3.org/2001/XMLSchema#"),
          substring(typ, 5, 1000000)))
        .otherwise(typ)
    // canonical (strict N-Triples) form: quoted lexical value + ^^<typ>
    def typed(value: org.apache.spark.sql.Column,
              typ: org.apache.spark.sql.Column) =
      if (canonical) concat(lit("\""), value, lit("\"^^<"), expandTyp(typ), lit(">"))
      else value
    // blank-node objects dump as their bare label (both grammars);
    // wrapping them in <> would turn them into IRIs on re-read
    when(col("o_kind") === "i" && col("o_iri").startsWith("_:"), col("o_iri"))
      .when(col("o_kind") === "i", concat(lit("<"), col("o_iri"), lit(">")))
      .when(col("o_typ") === "xsd:string", strLit)
      .when(col("o_typ") === "xsd:integer",
        typed(col("o_lng").cast("string"), col("o_typ")))
      .when(col("o_typ") === "xsd:double",
        typed(col("o_dbl").cast("string"), col("o_typ")))
      .when(col("o_typ") === "xsd:decimal",
        typed(col("o_dec").cast("string"), col("o_typ")))
      .when(col("o_typ") === "xsd:boolean",
        typed(col("o_bool").cast("string"), col("o_typ")))
      .otherwise(concat(lit("\""),
        esc(coalesce(col("o_str"), col("o_ts").cast("string"))),
        lit("\"^^<"),
        if (canonical) expandTyp(col("o_typ")) else col("o_typ"),
        lit(">")))
  }

  def dumpLines(triples: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    triples.select(concat(lit("<"), col("s"), lit("> <"), col("p"), lit("> "),
      objectTermCol(), lit(" .")).as("line"))
  }

  /** Distributed dump to a text directory (the 100 TB path). */
  def dumpTo(triples: DataFrame, path: String): Unit =
    dumpLines(triples).write.mode("overwrite").text(path)

  /** In-memory dump string — a small-graph/test convenience over the
    * same distributed formatter. */
  def dump(triples: DataFrame): String =
    dumpLines(triples).collect().map(_.getString(0)).mkString("", "\n", "\n")
}
