package graft.docs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document / graph DIFF and PATCH (reference: the v10 server's
  * /api/diff and /api/patch endpoints, core/document/patch.pl —
  * compare two document states, emit a patch, apply a patch).
  *
  * Spark-first shape: a document is a subgraph, so the diff of two
  * document states is a SET DIFFERENCE of their EAV triples — two
  * null-safe anti-joins (`exceptAll` over every typed column, one
  * shuffle each, work ∝ |old ∪ new|), never a per-document JSON
  * round-trip through the driver. At 100 TB both sides stay
  * distributed and AQE picks the join strategy.
  *
  * Two granularities:
  *  - [[diffTriples]]: lossless, full typed EAV rows tagged
  *    op = insert | delete. This is what [[applyPatch]] consumes —
  *    `applyPatch(old, diffTriples(old, new)) == new` exactly.
  *  - [[patchView]]: the reference's patch presentation — one row per
  *    changed (document, field) with op ∈ swap | insert | delete and
  *    lexical old/new values; a single-valued field that changed
  *    reports as the reference's `SwapValue`, multi-valued fields keep
  *    per-value insert/delete rows.
  */
object Diff {

  /** Triple-level diff of two graph states: full EAV rows tagged with
    * op = "insert" (in new only) / "delete" (in old only). `exceptAll`
    * compares null-safely across all typed object columns, so typed
    * literals diff exactly (no lexical collapsing). */
  def diffTriples(oldG: DataFrame, newG: DataFrame): DataFrame =
    newG.exceptAll(oldG).withColumn("op", lit("insert"))
      .unionByName(oldG.exceptAll(newG).withColumn("op", lit("delete")))

  private def lex = coalesce(col("o_iri"), col("o_str"),
    col("o_lng").cast("string"), col("o_dbl").cast("string"),
    col("o_dec").cast("string"), col("o_ts").cast("string"),
    col("o_bool").cast("string"))

  /** Patch presentation over a [[diffTriples]] result: (s, p, op,
    * old_v, new_v). A (s, p) with EXACTLY one deleted and one inserted
    * value fuses into op = "swap" (the reference's SwapValue); every
    * other change stays a per-value insert/delete row. Grouping + the
    * fusion joins shuffle on (g, s, p) — cost ∝ |diff|, not |graph|. */
  def patchView(d: DataFrame): DataFrame = {
    val keys = Seq("g", "s", "p")
    val ins = d.filter(col("op") === "insert")
      .select(col("g"), col("s"), col("p"), lex.as("v"))
    val del = d.filter(col("op") === "delete")
      .select(col("g"), col("s"), col("p"), lex.as("v"))
    val swapKeys = ins.groupBy(keys.map(col): _*).agg(count(lit(1)).as("ic"))
      .join(del.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dc")), keys)
      .filter(col("ic") === 1 && col("dc") === 1)
      .select(keys.map(col): _*)
    val swaps = swapKeys
      .join(del.withColumnRenamed("v", "old_v"), keys)
      .join(ins.withColumnRenamed("v", "new_v"), keys)
      .select(col("s"), col("p"), lit("swap").as("op"),
        col("old_v"), col("new_v"))
    val insOnly = ins.join(swapKeys, keys, "left_anti")
      .select(col("s"), col("p"), lit("insert").as("op"),
        lit(null).cast("string").as("old_v"), col("v").as("new_v"))
    val delOnly = del.join(swapKeys, keys, "left_anti")
      .select(col("s"), col("p"), lit("delete").as("op"),
        col("v").as("old_v"), lit(null).cast("string").as("new_v"))
    swaps.unionByName(insOnly).unionByName(delOnly)
  }

  /** Apply a triple-level diff: old − deletes + inserts. Exact inverse
    * of [[diffTriples]]: `applyPatch(old, diffTriples(old, new))` is
    * multiset-equal to `new`. */
  def applyPatch(oldG: DataFrame, d: DataFrame): DataFrame = {
    val cols = oldG.columns.toSeq.map(col)
    oldG.exceptAll(d.filter(col("op") === "delete").select(cols: _*))
      .unionByName(d.filter(col("op") === "insert").select(cols: _*))
  }
}
