package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ctx
import graft.storage.Eav

/** Engine entry: builds (and caches) the compile context for a testdata
  * scale-factor directory.
  *
  * The EAV encoding is written once per sfDir as parquet **partitioned by
  * predicate** (`p`) and read back, so every bound-predicate triple
  * pattern in the compiler benefits from real partition pruning — the
  * same physical property the reference store gets from per-predicate
  * succinct indexes. At cluster scale this cache directory is the
  * database; here it lives under target/. */
object Graft {

  /** Cache layout version — bump when Eav.schema changes so stale
    * parquet from an earlier round is never read with the new schema. */
  val cacheRoot: String =
    sys.env.getOrElse("GRAFT_EAV_CACHE", "/root/repo/target/eav") + "/v3"
  private val ctxCache = new java.util.concurrent.ConcurrentHashMap[String, Ctx]()

  def ctx(spark: SparkSession, sfDir: String): Ctx =
    ctxCache.computeIfAbsent(sfDir, _ => build(spark, sfDir))

  private def build(spark: SparkSession, sfDir: String): Ctx = {
    // no leading underscore: Spark's file listing treats _-prefixed names
    // as hidden metadata and logs a confusing "all paths ignored" warning
    val name = "db" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"$cacheRoot/$name"
    val marker = new java.io.File(s"$dir/_SUCCESS")
    if (!marker.exists()) {
      // Salt the shuffle: hashing on p alone puts each heavyweight
      // predicate (17 lineitem props × 600k rows at sf0.1) in a single
      // write task — the straggler dominates the whole encode (measured
      // 38-133s at sf0.1). p+salt spreads each predicate over 8 writers
      // (~20s); pruning is unaffected (partitionBy dirs, not files).
      Eav.encodeAll(spark, sfDir)
        .repartition(col("p"), pmod(xxhash64(col("s")), lit(8)))
        .sortWithinPartitions("s")
        .write.mode("overwrite").partitionBy("g", "p").parquet(dir)
      // fresh encode: any preflight profile memoized against an older
      // cache generation of this dir is stale
      graft.core.Preflight.invalidate()
    }
    val triples = spark.read.parquet(dir)
    // closure derives from the (tiny) schema graph but its class list
    // scans rdf:type — cache the result as parquet beside the EAV data
    val closureDir = s"$dir-closure"
    if (!new java.io.File(s"$closureDir/_SUCCESS").exists()) {
      Eav.subclassClosure(spark, triples)
        .coalesce(1).write.mode("overwrite").parquet(closureDir)
    }
    val closure = spark.read.parquet(closureDir)
    // Functional predicates (≤1 triple per subject) enable the
    // compiler's star-join collapse. Default OFF: measured at sf0.1
    // (BenchOne, min of 3), AQE broadcast-join chains beat the pivot's
    // subject shuffle on every star query (flagship 0.68s vs 3.31s) —
    // partition-pruned per-predicate scans are small enough to
    // broadcast. The pivot wins only when both join sides exceed the
    // broadcast threshold (billion-subject stars), so it stays an
    // opt-in knob for that regime: GRAFT_STAR_FUSION=on.
    val funcPreds =
      if (sys.env.getOrElse("GRAFT_STAR_FUSION", "off") != "on") Set.empty[String]
      else triples.filter(col("g") === "instance")
        .groupBy(col("p"), col("s")).count()
        .groupBy(col("p")).agg(max(col("count")).as("m"))
        .filter(col("m") === 1)
        .select("p").collect().map(_.getString(0)).toSet
    Ctx(spark, triples, closure, functionalPreds = funcPreds,
      // the encoded EAV dir is immutable once written — a stable
      // identity for cross-query memoization (path step relations)
      graphKey = Some(dir))
  }

  /** Plain relational reads for the extension operators. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some
    * environments and TIMESTAMP(MICROS)/NTZ in others; normalize both
    * to session-zoned TimestampType so downstream operators (windows,
    * as-of joins, watermarks) see one type. `nanosAsLong` makes the
    * nanos variant load as LongType instead of failing analysis; it is
    * ignored by micros files. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Branch on the loaded `ts` type:
    *  - LongType (nanos read via nanosAsLong): integer-truncate to
    *    micros (`div` — double division would lose precision at 2^60),
    *    matching DuckDB's nanos→micros truncation;
    *  - TIMESTAMP_NTZ (micros/NTZ parquet): cast to TimestampType —
    *    identity on stored values under the UTC session timezone, and
    *    keeps oracle hash/schema parity with DuckDB's native read;
    *  - already TimestampType: pass through. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
