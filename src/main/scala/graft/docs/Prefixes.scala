package graft.docs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prefix-context management (reference: `/api/prefixes` in
  * server/routes.pl; the context JSON of core/document/json.pl).
  *
  * A database's prefix context maps short prefixes to base IRIs. The
  * engine stores IRIs in COMPACT form (`tpch:nation/3`) — the same
  * choice the reference makes internally — so `expand` produces the
  * full form for interchange (turtle, JSON-LD) and `contract` maps a
  * full IRI back to the shortest compact form.
  *
  * Both directions exist twice: Scala-side (driver strings, used by
  * the turtle/JSON-LD readers) and Column-side (codegen'd `when`
  * chains over the longest-match ordering, for whole-corpus rewrites
  * with zero UDFs).
  */
object Prefixes {

  /** Default context — the reference ships rdf/rdfs/xsd plus the
    * db-local `@base`; our testdata graphs use `tpch:`/`graft:`. */
  val Default: Map[String, String] = Map(
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "tpch" -> "http://example.org/tpch#",
    "graft" -> "http://example.org/graft#")

  /** Longest base first so `contract` picks the most specific prefix
    * when one base IRI extends another. */
  private def byLongestBase(ctx: Map[String, String]): Seq[(String, String)] =
    ctx.toSeq.sortBy { case (_, base) => (-base.length, base) }

  /** `tpch:nation/3` → `http://example.org/tpch#nation/3`; strings
    * without a known prefix (or already-full IRIs) pass through. */
  def expand(ctx: Map[String, String])(s: String): String = {
    val i = s.indexOf(':')
    if (i < 0) s
    else ctx.get(s.substring(0, i)) match {
      case Some(base) => base + s.substring(i + 1)
      case None => s
    }
  }

  /** Inverse of [[expand]]: longest matching base wins; unknown IRIs
    * pass through. */
  def contract(ctx: Map[String, String])(iri: String): String =
    byLongestBase(ctx).collectFirst {
      case (pfx, base) if iri.startsWith(base) =>
        pfx + ":" + iri.substring(base.length)
    }.getOrElse(iri)

  /** Column-side expand: a codegen'd when-chain (no UDF). */
  def expandCol(ctx: Map[String, String], c: Column): Column =
    ctx.foldLeft(c) { case (acc, (pfx, base)) =>
      when(c.startsWith(pfx + ":"),
        concat(lit(base), c.substr(lit(pfx.length + 2), length(c)))).otherwise(acc)
    }

  /** Column-side contract: longest base first, same tie-break as the
    * Scala side (the fold nests later `when`s OUTSIDE earlier ones, so
    * iterate shortest-to-longest to make the longest base win). */
  def contractCol(ctx: Map[String, String], c: Column): Column =
    byLongestBase(ctx).reverse.foldLeft(c) { case (acc, (pfx, base)) =>
      when(c.startsWith(base),
        concat(lit(pfx + ":"), c.substr(lit(base.length + 1), length(c))))
        .otherwise(acc)
    }
}
