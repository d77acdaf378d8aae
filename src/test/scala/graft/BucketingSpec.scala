package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Safety contract of the bucketed-layout cache (round-8 hardening):
  * fingerprint-keyed physical names mean a regenerated source can
  * never be served stale buckets, and a completed write is ADOPTED by
  * a catalog-less JVM via bucketed DDL instead of deleted+rewritten. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def freshSource(dir: java.io.File, n: Int): String = {
    val p = new java.io.File(dir, "src.parquet").getAbsolutePath
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  test("regenerated source gets fresh buckets, never stale reuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_spec").toFile
    val src = freshSource(dir, 100)
    val b1 = Bucketing.ensureBucketed(spark, "graft_spec_regen",
      spark.read.parquet(src), "k", 4, src)
    assert(b1.count() == 100)
    // regenerate in place with DIFFERENT content (and bump mtime far
    // enough that a same-second rewrite still changes the fingerprint)
    Thread.sleep(5)
    freshSource(dir, 150)
    new java.io.File(src).setLastModified(System.currentTimeMillis() + 1000)
    val b2 = Bucketing.ensureBucketed(spark, "graft_spec_regen",
      spark.read.parquet(src), "k", 4, src)
    assert(b2.count() == 150, "stale buckets served after source regen")
  }

  test("a catalog-less session adopts completed buckets without rewriting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_spec2").toFile
    val src = freshSource(dir, 80)
    val df = spark.read.parquet(src)
    val b1 = Bucketing.ensureBucketed(spark, "graft_spec_adopt", df, "k", 4, src)
    assert(b1.count() == 80)
    val table = s"graft_spec_adopt_${graft.util.Fingerprint.of(src)}"
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    val mtimes = loc.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    // simulate a second JVM: same warehouse files, empty catalog
    spark.sql(s"DROP TABLE $table") // external ⇒ files survive the drop
    assert(loc.listFiles().exists(_.getName.endsWith(".parquet")),
      "bucketed table must be external — DROP TABLE deleted the files")
    val b2 = Bucketing.ensureBucketed(spark, "graft_spec_adopt", df, "k", 4, src)
    assert(b2.count() == 80)
    val after = loc.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes, "adoption path rewrote files it should have reused")
    // adopted bucket metadata must still co-locate the join: self-join
    // on the bucket key plans no exchange on either input
    val plan = b2.hint("merge").join(b2.withColumnRenamed("v", "v2"), "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"adopted buckets lost their HashPartitioning:\n$plan")
  }

  test("concurrent same-fingerprint writers serialize via the lock") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_spec3").toFile
    val src = freshSource(dir, 60)
    val df = spark.read.parquet(src)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = (1 to 3).map { _ => Future {
      Bucketing.ensureBucketed(spark, "graft_spec_race", df, "k", 4, src).count()
    }}
    assert(Await.result(Future.sequence(runs), 120.seconds).forall(_ == 60L))
  }
}
