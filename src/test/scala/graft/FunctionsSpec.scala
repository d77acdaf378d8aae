package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.ArrayDot

/** Custom Catalyst expressions and resource/wire-reader edges. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("ArrayDot equals the aggregate(zip_with) fold on both eval paths") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, -0.2), Seq(0.3, 0.4)),
      (3L, Seq.empty[Double], Seq.empty[Double])
    ).toDF("id", "a", "b")
    val expected = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // codegen path (normal execution)
    val got = df.select(col("id"), ArrayDot.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    // interpreted path (nullSafeEval): force by evaluating on a literal
    val lone = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(lone == 11.0)
  }

  test("ArrayDot is null-safe and length-tolerant") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    assert(df.select(ArrayDot.dot(col("a"), col("b"))).head().isNullAt(0))
    val short = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0))).toDF("a", "b")
    assert(short.select(ArrayDot.dot(col("a"), col("b"))).head().getDouble(0) == 10.0)
  }

  test("Resources resolves file:// URLs") {
    val f = java.nio.file.Files.createTempDirectory("graft-res")
    java.nio.file.Files.writeString(f.resolve("x.csv"), "a,b\n7,q\n")
    val df = graft.sources.Resources.csv(spark, s"file://$f", header = true)
    assert(df.select("a").head().getString(0) == "7")
  }

  test("v3 reader rejects unknown ops with a migration hint") {
    val e = intercept[IllegalArgumentException] {
      JsonWoqlV3.parse("""{"@type":"woql:Exotic"}""")
    }
    assert(e.getMessage.contains("woql:Exotic") && e.getMessage.contains("v10"))
  }
}
