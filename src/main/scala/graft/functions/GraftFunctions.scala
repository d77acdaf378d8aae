package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library built from codegen'd Spark built-ins only —
  * no UDFs in the hot path (SURVEY §2.11). */
object GraftFunctions {

  /** Character bigrams of a string (empty array below length 2). */
  def bigrams(s: Column): Column =
    when(length(s) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - 1), i => s.substr(i, lit(2))))

  /** Dice coefficient over distinct character bigrams — our semantics for
    * the reference's fuzzy `like/3` (reference: core/utils isub-style
    * similarity; we document Dice as the divergence, SURVEY §2.2). */
  def dice_similarity(a: Column, b: Column): Column = {
    val ba = array_distinct(bigrams(a))
    val bb = array_distinct(bigrams(b))
    val denom = size(ba) + size(bb)
    when(denom === 0, when(a === b, lit(1.0)).otherwise(lit(0.0)))
      .otherwise(lit(2.0) * size(array_intersect(ba, bb)) / denom)
  }

  /** Cosine similarity of two double-array embedding columns via the
    * fused [[ArrayDot]] expression (no intermediate arrays, stays in
    * whole-stage codegen; summation order identical to the previous
    * aggregate(zip_with) fold, so oracle hashes are unchanged). */
  def cosine(a: Column, b: Column): Column = {
    val dot = ArrayDot.dot(a, b)
    dot / (sqrt(ArrayDot.dot(a, a)) * sqrt(ArrayDot.dot(b, b)))
  }

  /** Deterministic 32-bit-ish hash of a string via md5 (stable across
    * Spark and DuckDB — both expose md5(), unlike their native hashes). */
  def md5Hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")
}
