package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Deterministic "random" walk corpora over a directed graph — the
  * DeepWalk / node2vec input generator (walk sequences feed skip-gram
  * embedding training), made HASH-DETERMINISTIC so the corpus is
  * bit-reproducible and oracle-checkable: no RNG state, no seed
  * plumbing, the same walk set on every engine.
  *
  * Step rule: out-edges of each node are ranked by destination id
  * (dense 1..outdeg); from node v at step t of walk w, the walk takes
  * the edge with rank = hash32(w ":" t ":" v) mod outdeg(v) + 1
  * (the md5-derived 32-bit hash every sampler here uses). Walks stop
  * at sinks. This is exactly the pseudo-random uniform next-step
  * choice of DeepWalk with the RNG replaced by a position-keyed hash
  * — unbiased across (walk, step, node) triples by md5 mixing.
  *
  * 100 TB shape: the rank table is built HUB-SAFE — a range
  * repartition on (src, dst) + per-partition sort gives a global
  * total order whose zipWithIndex position, rebased per src by a
  * keys-sized min-aggregate, IS the dense dst-order rank. A hub
  * node's out-edge list therefore spreads across as many range
  * partitions as its size needs, where the r16 per-src
  * `row_number().over(partitionBy(src))` window sorted a power-law
  * hub's entire adjacency in ONE task (the classic straggler). The
  * rank values are identical (position within the src's dst-ordered
  * list, invariant to where the range bounds fall), so the SQL
  * oracle is unchanged. Each step is then two equi-joins (degree,
  * pick) shuffled on node id; the frontier is |starts| rows and
  * never grows.
  */
object GraphWalks {

  /** Dense dst-order rank 1..outdeg per (src, dst) edge WITHOUT a
    * per-src window: range-sort the edge list on (src, dst), take the
    * global zipWithIndex position, and rebase per src by min-position
    * (one keys-sized aggregate + one join). Deterministic regardless
    * of sampled range bounds — rank depends only on the total order. */
  private[graft] def dstRank(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    // persisted: zipWithIndex is TWO passes (per-partition count job +
    // the data pass) and the rebase join consumes idx twice more (the
    // min aggregate and the probe side) — unpersisted, the range sort
    // re-ran up to 4× (measured 9.4 vs 5.1 s at sf1 on the walk corpus)
    val sorted = graft.util.Scratch.track(e.select(col("src"), col("dst"))
      .repartitionByRange(col("src"), col("dst"))
      .sortWithinPartitions(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER))
    val schema = StructType(sorted.schema.fields :+
      StructField("__gidx", LongType, nullable = false))
    val idx = graft.util.Scratch.track(spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i) },
      schema).persist(StorageLevel.MEMORY_AND_DISK_SER))
    val base = idx.groupBy(col("src").as("bsrc"))
      .agg(min(col("__gidx")).as("__base"))
    idx.join(base, col("src") === col("bsrc"))
      .select(col("src").as("rsrc"), col("dst").as("rdst"),
        (col("__gidx") - col("__base") + 1L).as("rnk"))
  }

  /** (walk_id, node, step) rows for walks of length ≤ `steps` from
    * every node of `starts` (one walk per start; walk_id = start). */
  def deterministic(edges: DataFrame, starts: DataFrame,
                    steps: Int): DataFrame = {
    require(steps >= 1)
    val e = graft.util.Scratch.track(edges.select(col("src"), col("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    val ranked = graft.util.Scratch.track(
      dstRank(e).persist(StorageLevel.MEMORY_AND_DISK))
    val deg = ranked.groupBy(col("rsrc").as("dsrc"))
      .agg(count(lit(1)).as("deg"))
    var cur = starts.select(col("node").as("walk_id"), col("node"),
      lit(0L).as("step"))
    val segs = scala.collection.mutable.ArrayBuffer(cur)
    for (t <- 1 to steps) {
      val h = graft.llm.Dedup.hash32(concat(
        col("walk_id").cast("string"), lit(s":$t:"),
        col("node").cast("string")))
      val stepped = cur
        .join(deg, col("node") === col("dsrc"))
        .withColumn("pick", pmod(h, col("deg")) + 1)
        .join(ranked, col("node") === col("rsrc") && col("pick") === col("rnk"))
        .select(col("walk_id"), col("rdst").as("node"), lit(t).cast("long").as("step"))
      segs += stepped
      cur = stepped
    }
    segs.reduce(_ unionByName _)
  }
}
