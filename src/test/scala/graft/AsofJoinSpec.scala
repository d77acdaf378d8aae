package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward picks latest right row at or before each left row") {
    import spark.implicits._
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 11:00:00"), 2.0),
      ("A", ts("2024-01-01 12:00:00"), 3.0),
      ("B", ts("2024-01-01 10:30:00"), 9.0)
    ).toDF("sym", "q_ts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:59:59"), 100L), // before 11:00 → px 1.0
      ("A", ts("2024-01-01 11:00:00"), 101L), // tie with quote → px 2.0
      ("A", ts("2024-01-01 13:00:00"), 102L), // after all → px 3.0
      ("B", ts("2024-01-01 10:00:00"), 103L), // before any B quote → null
      ("C", ts("2024-01-01 10:00:00"), 104L)  // key never quoted → null
    ).toDF("sym", "t_ts", "qty")
    val out = AsofJoin.backward(trades, quotes, Seq("sym"),
      "t_ts", "q_ts", Seq("px"))
      .select("qty", "px").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(100L -> Some(1.0), 101L -> Some(2.0),
      102L -> Some(3.0), 103L -> None, 104L -> None))
  }

  test("rightTie breaks equal-timestamp right rows deterministically") {
    import spark.implicits._
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 10.0),
      ("A", ts("2024-01-01 10:00:00"), 5L, 50.0), // max tie wins
      ("A", ts("2024-01-01 10:00:00"), 3L, 30.0)
    ).toDF("k", "r_ts", "id", "v")
    val left = Seq(("A", ts("2024-01-01 10:30:00"))).toDF("k", "l_ts")
    val out = AsofJoin.backward(left, right, Seq("k"), "l_ts", "r_ts",
      Seq("v"), rightTie = Some("id"))
    assert(out.select("v").head().getDouble(0) == 50.0)
  }

  test("forward picks earliest right row at or after each left row") {
    import spark.implicits._
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 11:00:00"), 2.0),
      ("A", ts("2024-01-01 12:00:00"), 3.0),
      ("B", ts("2024-01-01 10:30:00"), 9.0)
    ).toDF("sym", "q_ts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:59:59"), 100L), // next is 11:00 → px 2.0
      ("A", ts("2024-01-01 11:00:00"), 101L), // tie with quote → px 2.0
      ("A", ts("2024-01-01 13:00:00"), 102L), // after all → null
      ("B", ts("2024-01-01 10:00:00"), 103L), // next B quote → 9.0
      ("C", ts("2024-01-01 10:00:00"), 104L)  // key never quoted → null
    ).toDF("sym", "t_ts", "qty")
    val out = AsofJoin.forward(trades, quotes, Seq("sym"),
      "t_ts", "q_ts", Seq("px"))
      .select("qty", "px").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(100L -> Some(2.0), 101L -> Some(2.0),
      102L -> None, 103L -> Some(9.0), 104L -> None))
  }

  test("all right columns come from ONE matched row even when it has nulls") {
    import spark.implicits._
    // nearest right row carries a NULL in one column: a per-column fill
    // would take px2 from the EARLIER row (mixing two right rows); the
    // struct fill must report the matched row's null instead
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), Some(11.0)),
      ("A", ts("2024-01-01 11:00:00"), Some(2.0), None)
    ).toDF("k", "r_ts", "px", "px2")
    val left = Seq(("A", ts("2024-01-01 11:30:00"))).toDF("k", "l_ts")
    val bwd = AsofJoin.backward(left, right, Seq("k"), "l_ts", "r_ts",
      Seq("px", "px2")).select("px", "px2").head()
    assert(bwd.getDouble(0) == 2.0 && bwd.isNullAt(1))
    // mirrored for forward: earliest right ≥ left has the null column
    val left2 = Seq(("A", ts("2024-01-01 10:30:00"))).toDF("k", "l_ts")
    val fwd = AsofJoin.forward(left2, right, Seq("k"), "l_ts", "r_ts",
      Seq("px", "px2")).select("px", "px2").head()
    assert(fwd.getDouble(0) == 2.0 && fwd.isNullAt(1))
  }

  test("forward rightTie: largest tie wins among co-timestamped rights") {
    import spark.implicits._
    val right = Seq(
      ("A", ts("2024-01-01 11:00:00"), 1L, 10.0),
      ("A", ts("2024-01-01 11:00:00"), 5L, 50.0),
      ("A", ts("2024-01-01 11:00:00"), 3L, 30.0)
    ).toDF("k", "r_ts", "id", "v")
    val left = Seq(("A", ts("2024-01-01 10:30:00"))).toDF("k", "l_ts")
    val out = AsofJoin.forward(left, right, Seq("k"), "l_ts", "r_ts",
      Seq("v"), rightTie = Some("id"))
    assert(out.select("v").head().getDouble(0) == 50.0)
  }
}
