package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** xsd:duration lexical validation + canonicalization (reference:
  * core/triple/casting.pl duration clauses — the one typed cast the
  * xsd matrix still lacked). XSD 1.0 canonical form: the year/month
  * block reduces to total months re-expressed as Y/M with M < 12; the
  * day/time block reduces to total seconds re-expressed as D/H/M/S
  * with H < 24, M < 60, S < 60; zero components are omitted; the zero
  * duration renders as `PT0S`. All arithmetic is exact decimal
  * (months ≤ 38 digits, seconds with ≤ 9 fractional digits — the
  * documented precision bound of this cast), so the canonical string
  * is bit-identical across engines; invalid lexicals → null,
  * consistent with the lenient cast matrix. */
object XsdDuration {

  private val Dec0 = DecimalType(38, 0)
  private val Dec9 = DecimalType(38, 9)

  // validity: something must follow P; a T block must contain at least
  // one time component (lookaheads keep "P" / "P1YT" / "PT" invalid)
  private val validRe =
    "^-?P(?=.)(?:\\d+Y)?(?:\\d+M)?(?:\\d+D)?(?:T(?=\\d)(?:\\d+H)?(?:\\d+M)?(?:\\d+(?:\\.\\d+)?S)?)?$"
  private val extractRe =
    "^(-)?P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$"

  /** Validated lexical → canonical lexical (null when invalid). */
  def canonical(c: Column): Column = {
    val s = trim(c)
    def g(i: Int) = regexp_extract(s, extractRe, i)
    def num0(i: Int) =
      coalesce(nullif(g(i), lit("")).cast(Dec0), lit(0).cast(Dec0))
    val neg = g(1) === "-"
    val months = num0(2) * 12 + num0(3)
    val secs = (((num0(4) * 24 + num0(5)) * 60 + num0(6)) * 60)
      .cast(Dec9) + coalesce(nullif(g(7), lit("")).cast(Dec9), lit(0).cast(Dec9))
    val cy = ((months - pmod(months, lit(12))) / 12).cast(Dec0)
    val cm = pmod(months, lit(12)).cast(Dec0)
    val cd = floor(secs / 86400).cast(Dec0)
    val rem1 = secs - cd.cast(Dec9) * 86400
    val ch = floor(rem1 / 3600).cast(Dec0)
    val rem2 = rem1 - ch.cast(Dec9) * 3600
    val cmi = floor(rem2 / 60).cast(Dec0)
    val cs = rem2 - cmi.cast(Dec9) * 60
    // decimal(38,9) renders "5.000000000": strip the trailing zeros of
    // an actual fraction, then a bare trailing dot — never digits
    val csStr = regexp_replace(
      regexp_replace(cs.cast(StringType), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
    val timeAny = (ch > 0) || (cmi > 0) || (cs > 0)
    val allZero = (cy === 0) && (cm === 0) && (cd === 0) && !timeAny
    def part(v: Column, suffix: String) =
      when(v > 0, concat(v.cast(StringType), lit(suffix))).otherwise(lit(""))
    val body = concat(
      part(cy, "Y"), part(cm, "M"), part(cd, "D"),
      when(timeAny, concat(lit("T"),
        part(ch, "H"), part(cmi, "M"),
        when(cs > 0, concat(csStr, lit("S"))).otherwise(lit(""))))
        .otherwise(lit("")))
    when(s.rlike(validRe),
      when(allZero, lit("PT0S"))
        .otherwise(concat(when(neg, lit("-")).otherwise(lit("")), lit("P"), body)))
  }
}
