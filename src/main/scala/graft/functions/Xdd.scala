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

  /** `[lo,hi]` integer range with lo <= hi. */
  def integerRange(c: Column): Column = {
    val p = pair(int)
    val lo = regexp_extract(c, p, 1); val hi = regexp_extract(c, p, 2)
    when(c.rlike(p) && lo.cast("long") <= hi.cast("long"),
      concat(lit("["), lo, lit(","), hi, lit("]")))
  }

  /** `[lo,hi]` decimal range with lo <= hi (exact decimal compare). */
  def decimalRange(c: Column): Column = {
    val p = pair(num)
    val lo = regexp_extract(c, p, 1); val hi = regexp_extract(c, p, 2)
    when(c.rlike(p) && lo.cast("decimal(38,18)") <= hi.cast("decimal(38,18)"),
      concat(lit("["), lo, lit(","), hi, lit("]")))
  }

  private val urlRe = "^https?://[A-Za-z0-9.-]+(?::\\d+)?(?:/\\S*)?$"

  /** http(s) URL (validated, trimmed). */
  def url(c: Column): Column = when(trim(c).rlike(urlRe), trim(c))

  private val emailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  /** email address (validated, trimmed). */
  def email(c: Column): Column = when(trim(c).rlike(emailRe), trim(c))
}
