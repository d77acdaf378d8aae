package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted single/multi-source shortest paths by SYNCHRONOUS
  * Bellman-Ford rounds — the weighted companion to
  * [[graft.core.Paths]]' hop-count shortest path (reference has only
  * unweighted path search; weighted distance is the warehouse-graph
  * question its users answer by hand).
  *
  * All-integer arithmetic: weights are integer costs (cents, hops,
  * micro-units), distances exact BIGINT sums — order-independent and
  * oracle-checkable, no float accumulation anywhere. Round h relaxes
  * ONLY the out-edges of nodes IMPROVED in round h−1 (the semi-naive
  * delta frontier — the same trick the RPQ closure and Centrality
  * BFS use): dist after h rounds is still exactly min over paths of
  * ≤ h edges, the classical bounded-round Bellman-Ford guarantee, so
  * the synchronous-relaxation SQL oracle matches value for value
  * while the engine never re-relaxes settled regions. `maxHops` ≥
  * the graph's weighted hop diameter gives the true fixpoint; the
  * loop stops early when a round improves nothing. Negative edges
  * are refused up-front (min-plus rounds would need cycle
  * detection).
  *
  * 100 TB shape per round: one frontier ⋈ edges equi-join (frontier
  * is only the just-improved nodes) + one map-side-combinable min
  * aggregate on dst + one node-sized min-merge; dist never exceeds
  * |V| rows, frontiers shrink to the wavefront, and lineage is
  * localCheckpoint-truncated every 4 rounds (like [[PageRank.katz]]),
  * so a deep weighted diameter grows the plan tree by at most 4
  * rounds, not linearly. Unreached nodes carry NULL dist (not a
  * sentinel ∞ that a sum could overflow on).
  */
object Sssp {

  /** (node, dist) for every node of `edges` (columns src, dst, w ≥ 0);
    * `sources` is a one-column (node) frame of distance-0 seeds. */
  def weighted(edges: DataFrame, sources: DataFrame,
               maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = graft.util.Scratch.track(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val neg = e.where(col("w") < 0).limit(1).count()
    require(neg == 0, "negative edge weights are not supported")
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    // dist persists LAZILY (cache fills on the frontier probe's action,
    // later references hit it — an eager node-sized checkpoint per
    // round would double the fixed job count); the frontier is tiny
    // (just-improved nodes) and its isEmpty probe drives the loop.
    def keep(df: DataFrame): DataFrame = graft.util.Scratch.track(
      df.persist(StorageLevel.MEMORY_AND_DISK_SER))
    var dist = keep(nodes.join(
        sources.select(col("node")).distinct().withColumn("__s", lit(0L)),
        Seq("node"), "left")
      .select(col("node"), col("__s").as("dist")))
    var frontier = keep(dist.where(col("dist").isNotNull))
    var h = 0
    var live = !frontier.isEmpty
    while (live && h < maxHops) {
      h += 1
      val cand = relax(e, frontier)
      val merged = dist.join(cand, Seq("node"), "left")
      frontier = keep(merged
        .where(col("cand").isNotNull &&
          (col("dist").isNull || col("cand") < col("dist")))
        .select(col("node"), col("cand").as("dist")))
      dist = keep(merged
        .select(col("node"), least(col("dist"), col("cand")).as("dist")))
      // truncate lineage every 4 rounds (katz's cadence): without it
      // the dist plan tree deepens linearly with rounds and a deep
      // weighted diameter pays quadratic driver analysis cost
      if (h % 4 == 0) {
        dist = dist.localCheckpoint(false)
        frontier = frontier.localCheckpoint(false)
      }
      live = !frontier.isEmpty
    }
    dist
  }

  /** One delta-relaxation step: best candidate distance per
    * destination of the frontier's out-edges — exposed so the
    * plan-shape guard can pin its map-side partial aggregate. */
  private[graft] def relax(e: DataFrame, frontier: DataFrame): DataFrame =
    e.join(frontier.select(col("node").as("src"), col("dist")), Seq("src"))
      .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
      .groupBy(col("node")).agg(min(col("cand")).as("cand"))

  /** DAG longest path ending at each node (the CRITICAL PATH of a
    * dependency/workflow graph — max-plus where [[weighted]] is
    * min-plus): dist(v) = max over paths into v of the weight sum,
    * every node a distance-0 source. Same semi-naive delta-frontier
    * rounds and exact-BIGINT discipline as [[weighted]]; round h
    * relaxes only nodes IMPROVED in round h−1, so dist after h rounds
    * is exactly the max over paths of ≤ h edges and the unrolled
    * synchronous SQL oracle matches value for value.
    *
    * On a DAG the fixpoint arrives within depth rounds and the loop
    * exits early; a graph that is STILL improving after `maxHops`
    * rounds has a positive-weight cycle (where longest path is
    * undefined) or a deeper DAG than the caller promised — both raise
    * rather than silently returning the truncated answer. Negative
    * weights refused like [[weighted]] (a max-plus round would accept
    * them, but a "longest path" over negative costs is a modeling
    * error nine times out of ten). */
  def dagLongest(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = graft.util.Scratch.track(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val neg = e.where(col("w") < 0).limit(1).count()
    require(neg == 0, "negative edge weights are not supported")
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    def keep(df: DataFrame): DataFrame = graft.util.Scratch.track(
      df.persist(StorageLevel.MEMORY_AND_DISK_SER))
    var dist = keep(nodes.withColumn("dist", lit(0L)))
    var frontier = dist
    var h = 0
    var live = true
    while (live && h < maxHops) {
      h += 1
      val cand = e
        .join(frontier.select(col("node").as("src"), col("dist")), Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("node")).agg(max(col("cand")).as("cand"))
      val merged = dist.join(cand, Seq("node"), "left")
      frontier = keep(merged
        .where(col("cand").isNotNull && col("cand") > col("dist"))
        .select(col("node"), col("cand").as("dist")))
      dist = keep(merged.select(col("node"),
        when(col("cand").isNotNull && col("cand") > col("dist"), col("cand"))
          .otherwise(col("dist")).as("dist")))
      if (h % 4 == 0) {
        dist = dist.localCheckpoint(false)
        frontier = frontier.localCheckpoint(false)
      }
      live = !frontier.isEmpty
    }
    require(!live, s"longest path still improving after $maxHops rounds — " +
      "positive-weight cycle, or a deeper DAG than maxHops promises")
    dist
  }
}
