package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-truss decomposition membership (Cohen 2008, the triangle-based
  * community core): the maximal subgraph in which EVERY edge
  * participates in at least k−2 triangles within the subgraph —
  * [[KCore]]'s edge-strength analogue, and the standard cohesive-
  * subgraph primitive one level stronger than k-core.
  *
  * Peel rounds: enumerate triangles on the surviving edges with the
  * degree-ordered orientation ([[Triangles]]' √m wedge bound — each
  * triangle exactly once, no celebrity-node Θ(deg²) fan-out), credit
  * each triangle to its three edges, drop edges whose support is
  * below k−2, repeat. The loop exits early when a round removes
  * nothing, and the operator REQUIRES the fixpoint to land within
  * `rounds` — peeling is idempotent past the fixpoint, so the
  * `rounds`-unrolled SQL oracle replays it exactly (the k-core
  * convention).
  *
  * 100 TB shape per round: one degree aggregate + two dim joins +
  * the oriented wedge self-join (fan-out O(√m)) + one closing
  * equi-join + one edge-keyed support aggregate — triangle counting's
  * inventory; rounds shrink as edges peel. */
object KTruss {

  /** (a, b, support) for every edge of the k-truss of `edges`
    * (columns a, b, undirected; canonicalized/deduped here). */
  def kTruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1)
    def keep(df: DataFrame): DataFrame = graft.util.Scratch.track(
      df.persist(StorageLevel.MEMORY_AND_DISK_SER))
    var cur = keep(edges.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct())
    var r = 0
    var live = true
    while (live && r < rounds) {
      r += 1
      val sup = support(cur)
      // localCheckpoint EVERY round: support() references its input
      // ~6 times (degree union, two degree joins, both wedge arms,
      // closing probe), so without truncation the logical plan grows
      // ~10× per round — by round 6 the plan STRING alone hits the
      // 2^31 cap and driver analysis dominates the job
      val kept = keep(sup.where(col("support") >= k - 2)
        .select(col("a"), col("b"))).localCheckpoint(false)
      // fixpoint probe: a round that removed nothing ends the peel
      // (kept ⊆ cur always, so count equality is set equality)
      live = kept.count() != cur.count()
      cur = kept
    }
    require(!live, s"k-truss peel still removing after $rounds rounds — " +
      "raise `rounds` (the oracle unroll must cover the fixpoint)")
    support(cur).where(col("support") >= k - 2)
  }

  /** Per-edge triangle support over canonical (a < b) edges: oriented
    * triangle enumeration, 3 edge credits per triangle, left-joined
    * back (edges in no triangle carry 0). */
  private def support(e: DataFrame): DataFrame = {
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = graft.util.Scratch.track(withDeg.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("da").as("ds"),
               col("b").as("dst"), col("db").as("dd")))
        .otherwise(
          struct(col("b").as("src"), col("db").as("ds"),
                 col("a").as("dst"), col("da").as("dd"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.dd"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER))
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    val wedges = o1.join(o2, Seq("src"))
      .where(col("dv") < col("dw") ||
             (col("dv") === col("dw") && col("v") < col("w")))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
    val contrib = tris.select(explode(array(
        struct(least(col("x"), col("y")).as("a"),
               greatest(col("x"), col("y")).as("b")),
        struct(least(col("x"), col("z")).as("a"),
               greatest(col("x"), col("z")).as("b")),
        struct(least(col("y"), col("z")).as("a"),
               greatest(col("y"), col("z")).as("b")))).as("t"))
      .select(col("t.a").as("a"), col("t.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    e.join(contrib, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }
}
