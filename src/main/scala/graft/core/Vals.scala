package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime representation of a WOQL binding value.
  *
  * A binding column is a struct with one discriminator (`k`: "i" for IRI
  * nodes, "l" for literals) and typed slots. This mirrors the reference's
  * tagged Prolog terms (`node/1` vs typed literals,
  * reference: core/triple/literals.pl) but as a columnar struct so plans
  * stay inside whole-stage codegen — no UDFs, no Kryo objects.
  */
object Vals {

  /** Exact-decimal storage type for xsd:decimal (SURVEY §1.2: the one
    * documented narrowing — 38 digits, 18 fractional). */
  val Dec38: DecimalType = DecimalType(38, 18)

  val structType: StructType = StructType(Seq(
    StructField("k", StringType),      // "i" | "l"
    StructField("iri", StringType),
    StructField("typ", StringType),    // xsd type for literals
    StructField("str", StringType),
    StructField("dbl", DoubleType),
    StructField("lng", LongType),
    StructField("ts", TimestampType),
    StructField("bool", BooleanType),
    StructField("lang", StringType),
    StructField("dec", Dec38)          // exact xsd:decimal slot
  ))

  private def nullOf(dt: DataType): Column = lit(null).cast(dt)

  /** Build a value struct; pass nulls for unused slots. */
  def mk(k: Column, iri: Column, typ: Column, str: Column, dbl: Column,
         lng: Column, ts: Column, bool: Column, lang: Column,
         dec: Column): Column =
    struct(k.as("k"), iri.as("iri"), typ.as("typ"), str.as("str"),
      dbl.as("dbl"), lng.as("lng"), ts.as("ts"), bool.as("bool"), lang.as("lang"),
      dec.as("dec"))

  def iriVal(iri: Column): Column =
    mk(lit("i"), iri, nullOf(StringType), nullOf(StringType), nullOf(DoubleType),
      nullOf(LongType), nullOf(TimestampType), nullOf(BooleanType), nullOf(StringType),
      nullOf(Dec38))

  def strVal(s: Column, lang: Column = nullOf(StringType)): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:string"), s, nullOf(DoubleType),
      nullOf(LongType), nullOf(TimestampType), nullOf(BooleanType), lang, nullOf(Dec38))

  /** Extension-typed lexical value (the xdd: family): the canonical
    * lexical lives in the str slot under its own type tag, so typeof /
    * equality / ordering all work through the existing string paths. */
  def typedStr(typ: String, s: Column): Column =
    mk(lit("l"), nullOf(StringType), lit(typ), s, nullOf(DoubleType),
      nullOf(LongType), nullOf(TimestampType), nullOf(BooleanType),
      nullOf(StringType), nullOf(Dec38))

  def dblVal(d: Column): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:double"), nullOf(StringType), d,
      nullOf(LongType), nullOf(TimestampType), nullOf(BooleanType), nullOf(StringType),
      nullOf(Dec38))

  def lngVal(l: Column): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:integer"), nullOf(StringType),
      nullOf(DoubleType), l, nullOf(TimestampType), nullOf(BooleanType), nullOf(StringType),
      nullOf(Dec38))

  def tsVal(t: Column): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:dateTime"), nullOf(StringType),
      nullOf(DoubleType), nullOf(LongType), t, nullOf(BooleanType), nullOf(StringType),
      nullOf(Dec38))

  def boolVal(b: Column): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:boolean"), nullOf(StringType),
      nullOf(DoubleType), nullOf(LongType), nullOf(TimestampType), b, nullOf(StringType),
      nullOf(Dec38))

  def decVal(d: Column): Column =
    mk(lit("l"), nullOf(StringType), lit("xsd:decimal"), nullOf(StringType),
      nullOf(DoubleType), nullOf(LongType), nullOf(TimestampType), nullOf(BooleanType),
      nullOf(StringType), d.cast(Dec38))

  /** Constant term → value struct column. */
  def ofTerm(t: Term): Column = t match {
    case Node(i)      => iriVal(lit(i))
    case Str(s, null) => strVal(lit(s))
    case Str(s, lang) => strVal(lit(s), lit(lang))
    case Dbl(d)       => dblVal(lit(d))
    case Lng(l)       => lngVal(lit(l))
    case Bool(b)      => boolVal(lit(b))
    case Ts(ts)       => tsVal(lit(ts))
    case Dec(d)       => decVal(lit(d.bigDecimal))
    case V(n) => throw new IllegalArgumentException(s"unbound variable $n used as constant")
  }

  /** Numeric view of a value (literals only). */
  def num(v: Column): Column = coalesce(v.getField("dbl"),
    v.getField("lng").cast(DoubleType), v.getField("dec").cast(DoubleType))

  /** Canonical textual view: IRI string or literal lexical form. */
  def text(v: Column): Column = coalesce(
    v.getField("iri"), v.getField("str"),
    v.getField("lng").cast(StringType),
    v.getField("dbl").cast(StringType),
    v.getField("dec").cast(StringType),
    v.getField("ts").cast(StringType),
    v.getField("bool").cast(StringType))

  /** xsd-ordered comparison: numeric if both numeric, timestamps if both
    * temporal, else lexical/IRI text. Mirrors the reference's typed compare
    * (core/triple/literals.pl ordering). */
  def cmp(op: String, a: Column, b: Column): Column = {
    def apply2(x: Column, y: Column): Column = op match {
      case "<"  => x < y
      case ">"  => x > y
      case "<=" => x <= y
      case ">=" => x >= y
    }
    when(num(a).isNotNull && num(b).isNotNull, apply2(num(a), num(b)))
      .when(a.getField("ts").isNotNull && b.getField("ts").isNotNull,
        apply2(a.getField("ts"), b.getField("ts")))
      .otherwise(apply2(text(a), text(b)))
  }

  /** Sort key for order_by: numbers before text, consistently. */
  def sortKeyNum(v: Column): Column = coalesce(num(v), v.getField("ts").cast(DoubleType))
  def sortKeyText(v: Column): Column = text(v)
}
