package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Landmark closeness centrality — the Eppstein–Wang estimator with
  * FIXED, DETERMINISTIC landmarks (the k lexicographically least node
  * ids) instead of random ones, so the result is a pure function of
  * the graph and two engines replay it exactly. Random landmarks have
  * the better theoretical error bound; deterministic least-id ones
  * keep the oracle property every operator here carries, and the
  * estimator shape (closeness from a small landmark set, not all-pairs
  * BFS) is identical.
  *
  * closeness_micro(v) = round(1e6 · reached(v) / Σ_l dist(l, v)) over
  * the landmarks that reach v within `maxHops` (0 when every reaching
  * landmark is v itself — an isolated landmark has no finite
  * distance sum).
  *
  * Scale shape: the distance table is ≤ k·V rows (landmarks × nodes),
  * NEVER V² — each of the `maxHops` synchronous rounds is one
  * frontier⋈edges shuffle + a min-dist partial aggregate, with
  * lineage cut every 4 rounds like the other iterative operators.
  * All-pairs exact closeness is the refused shape at 100 TB; k
  * landmarks is the published scale path. */
object Centrality {

  def landmarkCloseness(edges: DataFrame, k: Int = 4,
                        maxHops: Int = 6): DataFrame = {
    require(k >= 1 && maxHops >= 1)
    val dir = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val und = graft.util.Scratch.track(
      dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    val landmarks = und.select(col("src").as("node")).distinct()
      .orderBy(col("node")).limit(k)
    var dist = landmarks
      .select(col("node").as("l"), col("node"), lit(0L).as("dist"))
    for (_ <- 1 to maxHops) {
      dist = dist.unionByName(
          dist.join(und, col("node") === col("src"))
            .select(col("l"), col("dst").as("node"),
              (col("dist") + 1L).as("dist")))
        .groupBy(col("l"), col("node")).agg(min(col("dist")).as("dist"))
      // EAGER checkpoint EVERY hop: the round's groupBy consumes the
      // whole prior-round plan, so uncut lineage re-executes hops
      // 1..h−1 inside hop h — measured 10.7 s → ~1 s at sf0.1 for the
      // identical result; the table is ≤ k·V rows, so the
      // materialization is the cheap side of that trade
      dist = graft.util.Scratch.trackCheckpoint(dist.localCheckpoint(true))
    }
    dist.groupBy(col("node"))
      .agg(count(lit(1)).as("reached"), sum(col("dist")).as("sum_dist"))
      .select(col("node"), col("reached"), col("sum_dist").cast(LongType)
          .as("sum_dist"),
        when(col("sum_dist") > 0,
          round(lit(1000000.0) * col("reached").cast("double") /
            col("sum_dist").cast("double"), 0).cast(LongType))
          .otherwise(lit(0L)).as("closeness_micro"))
  }
}
