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

  /** Truncated Katz centrality (Katz 1953): c(v) = Σ_{h=1..H} α^h ·
    * |walks of length h ending at v|, in the same SCALED INTEGER
    * arithmetic as [[fixedPoint]] — t_0 = scale per node, t_h(v) =
    * (Σ_{u→v} t_{h−1}(u)) div alphaDen (α = 1/alphaDen), katz = Σ t_h
    * — so every round is exact, order-independent and
    * oracle-checkable. The H-hop truncation replaces the
    * (I − αAᵀ)⁻¹ solve: at 100 TB a bounded damped frontier walk is
    * the only Katz that exists; α below 1/λ_max is the classical
    * convergence condition and small H bounds cost and lineage both.
    * Plan per round: one edges ⋈ t join (shuffle on src) + one
    * map-side-combinable inflow aggregate — [[fixedPoint]]'s shape. */
  def katz(edges: DataFrame, hops: Int, alphaDen: Long = 8L,
           scale: Long = 1000000000L): DataFrame = {
    require(hops >= 1 && alphaDen >= 2 && scale >= 100)
    val e = graft.util.Scratch.track(edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    var t = nodes.withColumn("t", lit(scale))
    var acc = nodes.withColumn("katz", lit(0L))
    var i = 0
    for (_ <- 1 to hops) {
      val inflow = e.join(t.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("t"))
        .groupBy(col("node")).agg(sum(col("t")).as("in"))
      t = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(in, 0L) div $alphaDen").as("t"))
      acc = acc.join(t.withColumnRenamed("t", "th"), Seq("node"))
        .select(col("node"), (col("katz") + col("th")).as("katz"))
      i += 1
      if (i % 4 == 0) { t = t.localCheckpoint(false); acc = acc.localCheckpoint(false) }
    }
    acc
  }

  /** Personalized PageRank (Haveliwala 2002): teleport mass lands on
    * the SEED set only, so rank measures proximity-to-seeds instead of
    * global centrality — the recommendation / related-entities query.
    * Same scaled-integer arithmetic and per-round plan shape as
    * [[fixedPoint]] (bit-reproducible, map-side-combined inflow);
    * nodes unreachable from the seeds stay at exactly 0, so the result
    * is also the reachability-weighted neighborhood of the seeds. */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100)
    val e = graft.util.Scratch.track(edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER))
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seeds.select(col("node")).distinct()
        .withColumn("__s", lit(1L)), Seq("node"), "left")
      .select(col("node"), (coalesce(col("__s"), lit(0L)) === 1L).as("seed"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val base = when(col("seed"), lit(15L * scale / 100)).otherwise(lit(0L))
    var pr = nodes.select(col("node"), col("seed"),
      when(col("seed"), lit(scale)).otherwise(lit(0L)).as("pr"))
    var i = 0
    for (_ <- 1 to iters) {
      val inflow = e
        .join(pr.select(col("node").as("src"), col("pr")), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), col("seed"),
          (base + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      i += 1
      if (i % 4 == 0) pr = pr.localCheckpoint(false)
    }
    pr.select(col("node"), col("pr"))
  }
}
