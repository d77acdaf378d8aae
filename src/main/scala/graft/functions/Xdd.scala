package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `xdd:` extension literal types (the reference's xdd namespace,
  * [ref:core/triple/literals.pl] — ranges and validated strings).
  *
  * Each cast validates the lexical form and yields the CANONICAL
  * lexical: whitespace dropped, the extracted component substrings
  * re-joined VERBATIM — numbers are never re-rendered through a
  * float, so the canonical form is bit-identical across engines.
  * Invalid input casts to null, consistent with the lenient xsd cast
  * matrix. */
object Xdd {

  private val num = "(-?\\d+(?:\\.\\d+)?)"
  private val int = "(-?\\d+)"
  private def pair(elem: String) = s"^\\s*\\[\\s*$elem\\s*,\\s*$elem\\s*\\]\\s*$$"

  /** `[lat,lng]` numeric pair → canonical `[a,b]`. */
  def coordinate(c: Column): Column = {
    val p = pair(num)
    when(c.rlike(p), concat(lit("["), regexp_extract(c, p, 1),
      lit(","), regexp_extract(c, p, 2), lit("]")))
  }

  // ---- lexical numeric comparison ----
  // A range's lo <= hi check must hold for ANY lexically-valid
  // component — casting through long/decimal(38,18) silently nulled
  // values beyond those bounds and reported valid ranges invalid.
  // Equal-length all-digit strings compare correctly as strings, so
  // magnitude order is (length, then lexicographic) after stripping
  // leading zeros; sign and fraction are handled around that.

  /** Non-negative integer strings, leading zeros stripped: a <= b. */
  private def magLeq(a: Column, b: Column): Column =
    (length(a) < length(b)) || (length(a) === length(b) && a <= b)

  private def stripZeros(c: Column): Column =
    regexp_replace(c, "^0+(?=\\d)", "")

  /** Negative iff a '-' sign AND any nonzero digit ("-0" is zero). */
  private def isNeg(c: Column): Column = c.startsWith("-") && c.rlike("[1-9]")

  /** Signed integer strings: a <= b, any width. */
  private def intLeq(a: Column, b: Column): Column = {
    val negA = isNeg(a); val negB = isNeg(b)
    val magA = stripZeros(regexp_replace(a, "^-", ""))
    val magB = stripZeros(regexp_replace(b, "^-", ""))
    when(negA && !negB, lit(true))
      .when(!negA && negB, lit(false))
      .when(!negA && !negB, magLeq(magA, magB))
      .otherwise(magLeq(magB, magA))
  }

  /** Signed decimal strings: a <= b, any width (fractions compared
    * right-padded to 64 digits — the documented fraction bound). */
  private def decLeq(a: Column, b: Column): Column = {
    val negA = isNeg(a); val negB = isNeg(b)
    def ip(c: Column) =
      stripZeros(regexp_extract(regexp_replace(c, "^-", ""), "^(\\d+)", 1))
    def fp(c: Column) =
      rpad(regexp_extract(c, "\\.(\\d+)$", 1), 64, "0")
    def magDecLeq(x: Column, y: Column, fx: Column, fy: Column) =
      when(length(x) =!= length(y), length(x) < length(y))
        .when(x =!= y, x < y)
        .otherwise(fx <= fy)
    when(negA && !negB, lit(true))
      .when(!negA && negB, lit(false))
      .when(!negA && !negB, magDecLeq(ip(a), ip(b), fp(a), fp(b)))
      .otherwise(magDecLeq(ip(b), ip(a), fp(b), fp(a)))
  }

  /** `[lo,hi]` integer range with lo <= hi (lexical compare — full
    * arbitrary-precision range, not bounded by long). */
  def integerRange(c: Column): Column = {
    val p = pair(int)
    val lo = regexp_extract(c, p, 1); val hi = regexp_extract(c, p, 2)
    when(c.rlike(p) && intLeq(lo, hi),
      concat(lit("["), lo, lit(","), hi, lit("]")))
  }

  /** `[lo,hi]` decimal range with lo <= hi (lexical compare — exact at
    * any magnitude, fractions to 64 digits). */
  def decimalRange(c: Column): Column = {
    val p = pair(num)
    val lo = regexp_extract(c, p, 1); val hi = regexp_extract(c, p, 2)
    when(c.rlike(p) && decLeq(lo, hi),
      concat(lit("["), lo, lit(","), hi, lit("]")))
  }

  private val urlRe = "^https?://[A-Za-z0-9.-]+(?::\\d+)?(?:/\\S*)?$"

  /** http(s) URL (validated, trimmed). */
  def url(c: Column): Column = when(trim(c).rlike(urlRe), trim(c))

  private val emailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  /** email address (validated, trimmed). */
  def email(c: Column): Column = when(trim(c).rlike(emailRe), trim(c))
}
