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
  *  2. MULTI-PIVOT: one pivot per WEAKLY-connected component of the
  *     surviving cyclic core (min-label WCC — the same engine that
  *     labels near-dup clusters), so pivots are provably in distinct
  *     SCCs and ALL forward/backward searches advance together as
  *     label-keyed multi-source BFS (the [[Centrality]] frontier
  *     discipline with an `l` column; per-hop work is one join
  *     regardless of pivot count). SCC(l) = F(l) ∩ B(l). A pivot is
  *     its WCC's least node and belongs to its own SCC, so the pivot
  *     IS the least member — the label falls out for free.
  *  3. Remove the found SCCs, re-trim, repeat: outer rounds consume
  *     one layer of the DAG-of-SCCs per iteration (≤ its chain depth,
  *     NOT the SCC count — a million independent cycles finish in one
  *     round).
  *
  * Rounds are BOUNDED AND ASSERTED ([[KCore]]'s law): exceeding
  * `maxPivotRounds`/`maxHops` throws rather than returning a partial
  * labeling the fixed oracle would catch anyway.
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
    val debug = sys.env.contains("GRAFT_SCC_DEBUG")
    val t00 = System.nanoTime()
    def mark(what: String): Unit = if (debug)
      System.err.println(f"[scc] ${(System.nanoTime() - t00) / 1e9}%6.2fs $what")

    var e = ckpt(edges.where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct())
    mark("edges ready")
    val labeled = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var active = ckpt(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct())
    var nActive = active.count()

    // broadcast hint once the surviving set is driver-known small —
    // every inner structure (live sets, labels, frontiers) is bounded
    // by the cyclic core, which trim counts every round
    val bcCap = 2000000L
    def bc(df: DataFrame, n: Long): DataFrame =
      if (n <= bcCap) broadcast(df) else df

    // trim singleton SCCs (no in- or no out-edge in the live subgraph)
    // to fixpoint. ONE degree aggregation per round (max(out), max(in)
    // over the tagged endpoint union) replaces the two distincts + two
    // semi-joins of the first cut; the edge restrict broadcast-gates
    // on the freshly counted live set.
    def trim(): Unit = {
      var changed = true
      var r = 0
      while (changed && nActive > 0 && r < maxTrimRounds) {
        r += 1
        val deg = e.select(col("src").as("v"), lit(1).as("o"), lit(0).as("i"))
          .unionByName(e.select(col("dst").as("v"), lit(0).as("o"), lit(1).as("i")))
          .groupBy(col("v")).agg(max(col("o")).as("o"), max(col("i")).as("i"))
        val live = ckpt(deg.where(col("o") === 1 && col("i") === 1)
          .select(col("v")))
        val nLive = live.count()
        mark(s"trim round $r: $nLive live")
        changed = nLive != nActive
        if (changed) {
          labeled += active.join(bc(live, nLive), Seq("v"), "left_anti")
            .select(col("v").as("node"), col("v").as("component"))
          active = live
          nActive = nLive
          e = ckpt(e
            .join(bc(live.select(col("v").as("src")), nLive), Seq("src"), "left_semi")
            .join(bc(live.select(col("v").as("dst")), nLive), Seq("dst"), "left_semi"))
        }
      }
      if (changed && nActive > 0) throw new IllegalStateException(
        s"SCC trim did not converge in $maxTrimRounds rounds")
    }

    // min-label WCC of the live core, inlined with broadcast hints (the
    // generic clustersFromPairs engine assumes corpus-scale inputs and
    // spent 5+ s on a 13k-node core): labels fold to the least member
    // by synchronous propagation over the undirected edge view, one
    // small aggregation + one broadcast join per round, fixpoint
    // detected by an isEmpty probe on the changed set.
    def wccPivots(): DataFrame = {
      var lbl = ckpt(active.select(col("v"), col("v").as("l")))
      var r = 0
      var changed = true
      while (changed) {
        r += 1
        if (r > maxHops) throw new IllegalStateException(
          s"SCC pivot WCC did not converge in $maxHops rounds")
        val und = e.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
        val nb = und.join(bc(lbl.select(col("v").as("a"), col("l")), nActive),
          Seq("a")).select(col("b").as("v"), col("l"))
        val upd = ckpt(lbl.unionByName(nb)
          .groupBy(col("v")).agg(min(col("l")).as("l")))
        changed = !upd.join(
            bc(lbl.select(col("v"), col("l").as("l0")), nActive), Seq("v"))
          .where(col("l") =!= col("l0")).isEmpty
        lbl = upd
      }
      mark("wcc fixpoint")
      ckpt(lbl.select(col("l")).distinct())
    }

    // MULTI-SOURCE labeled reachability, BOTH DIRECTIONS FUSED: the
    // frontier carries (l, node, dir) with dir ∈ {f, b}, so every
    // pivot's forward AND backward BFS advance in the same per-hop
    // job — one checkpoint + one emptiness probe per hop total (the
    // first cut ran one pivot at a time, ~250 tiny jobs, 23 s; the
    // second ran F and B as separate loops). Broadcast hints on the
    // frontier/seen sides (core-bounded, driver-counted): each hop is
    // two broadcast joins + one small exchange, never three shuffles.
    def reachBoth(seeds: DataFrame): DataFrame = {
      var frontier = ckpt(seeds
        .select(col("l"), col("l").as("node"), lit("f").as("dir"))
        .unionByName(seeds
          .select(col("l"), col("l").as("node"), lit("b").as("dir"))))
      var seen = frontier
      var h = 0
      var exhausted = false
      while (!exhausted) {
        h += 1
        if (h > maxHops) throw new IllegalStateException(
          s"SCC reachability exceeded $maxHops hops")
        val fwd = bc(frontier.where(col("dir") === "f"), nActive)
          .join(e, col("node") === col("src"))
          .select(col("l"), col("dst").as("node"), col("dir"))
        val bwd = bc(frontier.where(col("dir") === "b"), nActive)
          .join(e, col("node") === col("dst"))
          .select(col("l"), col("src").as("node"), col("dir"))
        val next = ckpt(fwd.unionByName(bwd).distinct()
          .join(bc(seen, 2 * nActive), Seq("l", "node", "dir"), "left_anti"))
        mark(s"reach hop $h")
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
        s"SCC pivot loop exceeded $maxPivotRounds rounds — the residual " +
          "DAG-of-SCCs is deeper than expected")
      // One pivot per WEAKLY-connected component of the surviving
      // cyclic core: pivots of different WCCs are in different SCCs by
      // construction, so all their FW/BW searches run label-parallel.
      // A pivot is its WCC's least node, it belongs to its own SCC,
      // hence pivot = least member of that SCC — the label law holds
      // per pivot. SCCs sharing a WCC with a smaller-id SCC resolve in
      // later outer rounds (outer depth ≤ DAG-of-SCCs chain length,
      // not SCC count).
      val pivots = wccPivots()
      mark(s"round $round pivots ready")
      val both = reachBoth(pivots)
      val scc = ckpt(both.where(col("dir") === "f")
        .select(col("l"), col("node"))
        .join(bc(both.where(col("dir") === "b")
          .select(col("l"), col("node")), nActive),
          Seq("l", "node"), "left_semi"))
      mark(s"round $round scc intersected")
      labeled += scc.select(col("node"), col("l").as("component"))
      active = ckpt(active.join(scc.select(col("node").as("v")),
        Seq("v"), "left_anti"))
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
