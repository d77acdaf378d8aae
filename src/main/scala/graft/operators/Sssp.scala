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
  * oracle-checkable, no float accumulation anywhere. Each round
  * relaxes EVERY edge (dist' = min(dist, min over in-edges of
  * dist(u) + w)): after H rounds the result is exact for every node
  * whose shortest path uses ≤ H edges, the classical bounded-round
  * Bellman-Ford guarantee; `maxHops` ≥ the graph's weighted-path hop
  * diameter gives the true fixpoint. Negative edges are refused
  * up-front (min-plus rounds would need cycle detection).
  *
  * 100 TB shape per round: one dist ⋈ edges equi-join (shuffle on
  * src) + one map-side-combinable min aggregate on dst + one
  * node-sized min-merge — the PageRank plan shape; dist never exceeds
  * |V| rows and lineage is checkpoint-truncated every 4 rounds.
  * Unreached nodes carry NULL dist (not a sentinel ∞ that a sum could
  * overflow on).
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
    var dist = nodes.join(
        sources.select(col("node")).distinct().withColumn("__s", lit(0L)),
        Seq("node"), "left")
      .select(col("node"), col("__s").as("dist"))
    var h = 0
    for (_ <- 1 to maxHops) {
      val relaxed = e
        .join(dist.select(col("node").as("src"), col("dist")), Seq("src"))
        .where(col("dist").isNotNull)
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("node")).agg(min(col("cand")).as("cand"))
      dist = dist.join(relaxed, Seq("node"), "left")
        .select(col("node"), least(col("dist"), col("cand")).as("dist"))
      h += 1
      if (h % 4 == 0) dist = dist.localCheckpoint(false)
    }
    dist
  }
}
