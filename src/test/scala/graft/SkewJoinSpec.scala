package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hub key
    val big = (1 to 1000).map(i => (if (i <= 900) "hub" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hub", "H"), ("k901", "A"), ("k999", "B")).toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = SkewJoin.salted(big, small, "key", saltFactor = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain && plain.size == 902)
  }

  test("skew diagnostic flags the hub key") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (if (i <= 900) "hub" else s"k$i", i))
      .toDF("key", "v")
    val hot = SkewJoin.skewedKeys(big, col("key"), 0.5).collect()
    assert(hot.map(_.getString(0)).toSeq == Seq("hub"))
  }
}
