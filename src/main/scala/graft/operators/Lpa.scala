package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Label-propagation community detection (Raghavan et al. 2007) —
  * SYNCHRONOUS rounds with a deterministic tie rule, so the result is
  * a pure function of the graph (classic async LPA is run-order
  * dependent and cannot be oracle-checked or reproduced on a cluster).
  *
  * Update rule per round, for every node v:
  *   label(v) ← the label most frequent among v's neighbors;
  *   ties broken toward the LEXICOGRAPHICALLY LEAST label;
  *   isolated nodes keep their own label.
  * All quantities are integer counts and string comparisons — no
  * floats anywhere, so two engines agree bit-for-bit after any number
  * of rounds (the same determinism contract as PageRank's scaled
  * integers).
  *
  * The argmax is ONE aggregate, not a per-node sort window:
  * min(struct(-cnt, label)) minimizes the negated count first (= max
  * count) then the label (= least label on ties) — map-side
  * combinable, no "sort every node's label list" stage.
  *
  * Plan shape per round (the 100 TB shape): edges ⋈ labels on src
  * (shuffle ∝ E), neighbor-label count groupBy (dst, label) with
  * partial aggregation, per-node argmin aggregate, left join back to
  * the node set for isolated nodes. Edges and nodes persist once;
  * rounds are a small constant, with lineage truncated every 4 rounds
  * like the PageRank loop. Hot nodes cost ∝ their degree in the count
  * shuffle — no per-node quadratic term anywhere.
  */
object Lpa {

  /** (node, community) after `rounds` synchronous updates over the
    * UNDIRECTED view of `edges` (src/dst columns; each edge counts
    * once per direction, self-loops dropped). */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val dir = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val und = graft.util.Scratch.track(
      dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.util.Scratch.track(
      und.select(col("src").as("node")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    var lbl = nodes.withColumn("lbl", col("node"))
    var i = 0
    for (_ <- 1 to rounds) {
      val winner = und
        .join(lbl.select(col("node").as("src"), col("lbl").as("nl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("nl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("nl"))).as("w"))
        .select(col("node"), col("w.nl").as("wl"))
      lbl = nodes.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("wl"), col("node")).as("lbl"))
      i += 1
      if (i % 4 == 0)
        lbl = graft.util.Scratch.trackCheckpoint(lbl.localCheckpoint(true))
    }
    lbl.select(col("node"), col("lbl").as("community"))
  }

  /** Newman modularity of the [[communities]] partition — the standard
    * community-quality score, computed EXACTLY in integers:
    *   Q · (2m)² = 2m · (2·E_within) − Σ_c D_c²
    * where 2m = Σ degrees, 2·E_within = directed undirected-view edges
    * with both ends in one community, D_c = Σ degrees inside c. Only
    * the final Q is a (micro-rounded) division, so both engines agree
    * bit-for-bit. One row: (communities, two_m, e_within2, dc2_sum,
    * q_micro).
    *
    * Shape: the undirected view + labels are the LPA scratch re-joined
    * (edges ⋈ labels twice on src/dst — shuffle ∝ E); degrees and D_c
    * are two partial-agg groupBys; the moment sums collapse to ONE
    * row. No per-pair work outside existing edges. */
  def modularity(edges: DataFrame, rounds: Int): DataFrame = {
    val dir = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val und = graft.util.Scratch.track(
      dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    val lab = graft.util.Scratch.track(
      communities(und, rounds).persist(StorageLevel.MEMORY_AND_DISK))
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    val twoM = deg.agg(sum(col("d")).as("two_m"))
    val eWin = und
      .join(lab.select(col("node").as("src"), col("community").as("cs")),
        Seq("src"))
      .join(lab.select(col("node").as("dst"), col("community").as("cd")),
        Seq("dst"))
      .where(col("cs") === col("cd"))
      .agg(count(lit(1)).as("e_within2"))
    val dc2 = lab.join(deg, Seq("node"))
      .groupBy(col("community")).agg(sum(col("d")).as("dc"))
      .agg(sum(col("dc") * col("dc")).as("dc2_sum"),
        count(lit(1)).as("communities"))
    dc2.crossJoin(twoM).crossJoin(eWin)
      .select(col("communities"), col("two_m"), col("e_within2"),
        col("dc2_sum"),
        round(lit(1000000.0) *
          (col("two_m") * col("e_within2") - col("dc2_sum")).cast("double") /
          (col("two_m") * col("two_m")).cast("double"), 0)
          .cast("long").as("q_micro"))
  }
}
