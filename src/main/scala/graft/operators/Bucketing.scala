package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables for co-located joins — the standing answer
  * to the biggest cost at 100 TB: a fact⋈fact equi-join on a stable
  * key. Writing both sides `bucketBy(n, key).sortBy(key)` once makes
  * every subsequent join on that key shuffle-FREE (each bucket pair
  * merge-joins in place; Catalyst recognizes the matching
  * `HashPartitioning` from the bucketed scans and plans no Exchange on
  * either input). Cluster guidance: pick `buckets` ≈ total cores (or a
  * small multiple) and keep it IDENTICAL on every table sharing the
  * key — mismatched bucket counts reintroduce the shuffle.
  *
  * Spark-first note: this is the DataFrame-API spelling of what the
  * reference's native storage achieves with its own layer layout;
  * the table metadata (in-memory catalog) is per-JVM, but the bucketed
  * FILES persist in the warehouse dir, and a fresh JVM simply rewrites
  * the table once (mode overwrite) before reusing it. */
object Bucketing {

  /** Materialize `df` as bucketed+sorted parquet table `name` (reused
    * when the catalog already has it) and return the bucketed scan.
    * The in-memory catalog is per-JVM while the warehouse FILES persist,
    * so a fresh JVM may find the location without the table entry —
    * clear the stale directory before rewriting (saveAsTable refuses to
    * adopt an existing location it has no metadata for). */
  def ensureBucketed(spark: SparkSession, name: String, df: DataFrame,
                     key: String, buckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write.bucketBy(buckets, key).sortBy(key)
        .format("parquet").mode("overwrite").saveAsTable(name)
    }
    spark.table(name)
  }
}
