package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components of a directed graph, labeled by each
  * component's LEAST member id — the deterministic analogue of
  * [[graft.llm.Dedup.clustersFromPairs]]'s undirected min-label law,
  * so the result is oracle-checkable row for row.
  *
  * Algorithm: forward-backward reachability (Fleischer, Hendrickson &
  * Pinar 2000 — the standard distributed SCC decomposition; Tarjan's
  * stack DFS is inherently sequential and has no Spark shape) with
  * trimming:
  *
  *  1. TRIM to fixpoint: a node with no in-edge or no out-edge inside
  *     the surviving subgraph is its own singleton SCC — label it with
  *     itself and drop it. One degree semi-join per pass, work ∝ |E|;
  *     this collapses the DAG portion (for an FK-shaped graph, almost
  *     everything) without any reachability work, which is what makes
  *     FW-BW viable on graphs whose SCC count is large: the pivot loop
  *     only ever runs on the cyclic core.
  *  2. PIVOT: take the least surviving node id (1-row aggregate).
  *     F = forward BFS from the pivot, B = backward BFS (same
  *     semi-naive frontier discipline as [[Centrality]] — each hop
  *     joins only the new frontier, eagerly localCheckpoint'ed
  *     serialized). SCC(pivot) = F ∩ B. Because the pivot is the
  *     minimum of the surviving set and belongs to its own SCC, the
  *     pivot IS the least member — the label falls out for free.
  *  3. Remove the SCC, re-trim, repeat.
  *
  * Rounds are BOUNDED AND ASSERTED ([[KCore]]'s law): the pivot loop
  * runs once per non-trivial SCC and each BFS once per eccentricity
  * hop; exceeding `maxPivotRounds`/`maxHops` throws rather than
  * returning a partial labeling the fixed oracle would catch anyway.
  *
  * 100 TB shape: every step is an equi-join or aggregate on the edge
  * list (shuffle on node id); no step materializes anything larger
  * than |V| + |E|, frontiers shrink monotonically, and the surviving
  * edge list is re-checkpointed serialized per round so peak block
  * residency is one edge list regardless of round count.
  */
object Scc {

  /** (node, component) for every endpoint of `edges` — `component` is
    * the least node id of the member's SCC. `edges` columns: src, dst. */
  def components(edges: DataFrame, maxPivotRounds: Int = 32,
                 maxHops: Int = 64, maxTrimRounds: Int = 32): DataFrame = {
    val spark = edges.sparkSession
    def ckpt(df: DataFrame): DataFrame = graft.util.Scratch.trackCheckpoint(
      df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER))

    var e = ckpt(edges.where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct())
    val labeled = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var active = ckpt(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct())
    var nActive = active.count()

    // trim singleton SCCs (no in- or no out-edge in the live subgraph)
    // to fixpoint; returns whether anything survives
    def trim(): Unit = {
      var changed = true
      var r = 0
      while (changed && nActive > 0 && r < maxTrimRounds) {
        r += 1
        val hasOut = e.select(col("src").as("v")).distinct()
        val hasIn = e.select(col("dst").as("v")).distinct()
        val live = ckpt(active
          .join(hasOut, Seq("v"), "left_semi")
          .join(hasIn, Seq("v"), "left_semi"))
        val nLive = live.count()
        changed = nLive != nActive
        if (changed) {
          labeled += active.join(live, Seq("v"), "left_anti")
            .select(col("v").as("node"), col("v").as("component"))
          active = live
          nActive = nLive
          e = ckpt(e
            .join(live.select(col("v").as("src")), Seq("src"), "left_semi")
            .join(live.select(col("v").as("dst")), Seq("dst"), "left_semi"))
        }
      }
      if (changed && nActive > 0) throw new IllegalStateException(
        s"SCC trim did not converge in $maxTrimRounds rounds")
    }

    // semi-naive directed BFS over the live edge list; returns the set
    // of nodes reachable from `root` (inclusive), one `v` column
    def reach(root: String, forward: Boolean): DataFrame = {
      val (from, to) = if (forward) ("src", "dst") else ("dst", "src")
      var frontier = ckpt(spark.range(1).select(lit(root).as("v")))
      var seen = frontier
      var h = 0
      var exhausted = false
      while (!exhausted) {
        h += 1
        if (h > maxHops) throw new IllegalStateException(
          s"SCC reachability exceeded $maxHops hops")
        val next = ckpt(frontier.join(e, col("v") === col(from))
          .select(col(to).as("v")).distinct()
          .join(seen, Seq("v"), "left_anti"))
        if (next.isEmpty) exhausted = true
        else {
          frontier = next
          seen = ckpt(seen.unionByName(next))
        }
      }
      seen
    }

    trim()
    var round = 0
    while (nActive > 0) {
      round += 1
      if (round > maxPivotRounds) throw new IllegalStateException(
        s"SCC pivot loop exceeded $maxPivotRounds rounds — cyclic core " +
          "has more non-trivial components than expected")
      val pivot = active.agg(min(col("v"))).head().getString(0)
      val scc = ckpt(reach(pivot, forward = true)
        .join(reach(pivot, forward = false), Seq("v"), "left_semi"))
      // pivot = min(active) ∈ scc ⇒ pivot = min(scc): the label law
      labeled += scc.select(col("v").as("node"), lit(pivot).as("component"))
      active = ckpt(active.join(scc, Seq("v"), "left_anti"))
      nActive = active.count()
      if (nActive > 0) {
        e = ckpt(e
          .join(active.select(col("v").as("src")), Seq("src"), "left_semi")
          .join(active.select(col("v").as("dst")), Seq("dst"), "left_semi"))
        trim()
      }
    }
    if (labeled.isEmpty) spark.emptyDataFrame
      .select(lit("").as("node"), lit("").as("component")).limit(0)
    else labeled.reduce(_ unionByName _)
  }
}
