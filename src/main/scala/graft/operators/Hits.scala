package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Truncated HITS (Kleinberg, JACM 1999): hubs point at good
  * authorities, authorities are pointed at by good hubs. The classical
  * algorithm L2-normalizes after every half-step — a float reduction
  * whose accumulation order a distributed engine cannot pin. Like
  * [[PageRank.katz]]'s treatment of the (I − αAᵀ)⁻¹ solve, this
  * variant replaces the normalization with a fixed integer damping
  * divisor per half-step and truncates at H rounds: scores stay EXACT
  * BIGINTs (order-independent sums + one `div`), the RANKING the
  * operator exists for is preserved (damping is monotone within a
  * round), and the unrolled-rounds SQL oracle matches value for
  * value.
  *
  * 100 TB shape per round: two edges ⋈ scores equi-joins + two
  * map-side-combinable sum aggregates (auth flows src←dst, hub flows
  * dst←src) — [[PageRank.fixedPoint]]'s shape, twice. Scores are
  * node-sized frames; lineage localCheckpoint-truncated every 4
  * rounds. `den` bounds growth: values ≤ scale·(maxdeg/den)^2h, so
  * pick den ≥ 2 and small H (H=2-3 is the standard truncated regime).
  */
object Hits {

  /** (node, hub, auth) after `rounds` damped half-step pairs over
    * `edges` (columns src, dst). a₀ = scale everywhere;
    * hₜ(u) = (Σ_{u→v} aₜ₋₁(v)) div den; aₜ(v) = (Σ_{u→v} hₜ(u)) div den. */
  def truncated(edges: DataFrame, rounds: Int, den: Long = 4L,
                scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && den >= 2 && scale >= 100)
    val e = graft.util.Scratch.track(edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.util.Scratch.track(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    var auth = nodes.withColumn("auth", lit(scale))
    var hub = nodes.withColumn("hub", lit(0L))
    for (i <- 1 to rounds) {
      val hin = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("auth"))
        .groupBy(col("node")).agg(sum(col("auth")).as("s"))
      hub = nodes.join(hin, Seq("node"), "left")
        .select(col("node"), expr(s"coalesce(s, 0L) div $den").as("hub"))
      val ain = e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("hub"))
        .groupBy(col("node")).agg(sum(col("hub")).as("s"))
      auth = nodes.join(ain, Seq("node"), "left")
        .select(col("node"), expr(s"coalesce(s, 0L) div $den").as("auth"))
      if (i % 4 == 0) {
        hub = hub.localCheckpoint(false); auth = auth.localCheckpoint(false)
      }
    }
    hub.join(auth, Seq("node"))
  }
}
