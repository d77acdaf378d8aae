package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-point PageRank — power iteration in SCALED INTEGER
  * arithmetic.
  *
  * Floating-point PageRank is not reproducible on a cluster: inflow
  * sums accumulate in partition order, so the same graph yields
  * different low bits run-to-run, and no oracle can hash-check it.
  * Holding ranks as integers scaled by `scale` makes every step exact
  * and order-independent — integer division for the per-edge
  * contribution (pr div outdeg), exact BIGINT sums for inflow, and
  * (85·inflow) div 100 for damping — so two engines agree bit-for-bit
  * after any number of rounds. Overflow headroom: Σpr ≤ N·scale, so
  * 85·Σ stays under 2⁶³ for N·scale < 10¹⁷ (10⁸ nodes at the default
  * scale). The deliberate simplification: dangling-node mass is NOT
  * redistributed (ranks need renormalization for a strict probability
  * reading) — standard for link-analysis ranking, documented here.
  *
  * Plan shape per round: edges ⋈ ranks on src (one shuffle), inflow
  * aggregate on dst (map-side partial — the 100 TB shape), left join
  * back to the node set. Edges and nodes are persisted once; the
  * iteration count is a constant, so lineage stays bounded.
  */
object PageRank {

  /** (node, pr) after `iters` damped rounds; pr scaled by `scale`. */
  def fixedPoint(edges: DataFrame, iters: Int,
                 scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100)
    val e = graft.util.Scratch.track(edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var pr = nodes.withColumn("pr", lit(scale))
    var i = 0
    for (_ <- 1 to iters) {
      val inflow = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), (lit(15L * scale / 100) +
          expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      // deep runs: truncate lineage every few rounds or the plan (and
      // Catalyst's optimization time) grows without bound. Lazy
      // localCheckpoint — no job fires here; same trade the RPQ
      // closure makes (non-recoverable under executor loss, standard
      // for iterative graph algorithms; rerun on failure).
      i += 1
      if (i % 4 == 0) pr = pr.localCheckpoint(false)
    }
    pr
  }
}
