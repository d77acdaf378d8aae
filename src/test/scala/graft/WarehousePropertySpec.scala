package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.Warehouse

/** Algebraic invariants of the warehouse operators over random event
  * logs (SURVEY §5.2 property tier). Generators are driven with fixed
  * seeds — deterministic suite, one Spark job per case. */
class WarehousePropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val logGen: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 20L) // seconds; collisions likely
      ty <- Gen.oneOf("a", "b", "c")
    } yield (u, t, ty))
  } yield rows.zipWithIndex.map { case ((u, t, ty), i) =>
    (u, t, i.toLong, ty) } // unique event ids

  private def df(log: List[(Long, Long, Long, String)]) = {
    import spark.implicits._
    log.map { case (u, t, id, ty) =>
      (u, new java.sql.Timestamp(t * 1000L), id, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
  }

  test("scd2: intervals tile each user's timeline with no overlap or gap") {
    for (seed <- 1L to 8L) {
      val log = sample(logGen, seed)
      val rows = Warehouse.scd2(df(log), "user_id", "ts", "event_id",
          "event_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getLong(4)))
        .groupBy(_._1)
      rows.foreach { case (_, iv0) =>
        val iv = iv0.sortBy(_._5)
        // versions are 1..n dense
        assert(iv.map(_._5).toSeq == (1L to iv.length).toSeq, s"seed $seed")
        // each interval closes exactly where the next opens
        iv.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"seed $seed: gap/overlap")
            // adjacent states differ — otherwise no change row
            assert(a._2 != b._2, s"seed $seed: non-change row survived")
          case _ => ()
        }
        // last interval is open
        assert(iv.last._4.isEmpty, s"seed $seed")
      }
    }
  }

  test("scd2: per-user current state equals the (ts, id)-last event's type") {
    for (seed <- 11L to 16L) {
      val log = sample(logGen, seed)
      val current = Warehouse.scd2(df(log), "user_id", "ts", "event_id",
          "event_type")
        .where(col("valid_to").isNull)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = log.groupBy(_._1).map { case (u, evs) =>
        u -> evs.maxBy(e => (e._2, e._3))._4 }
      assert(current == expect, s"seed $seed")
    }
  }

  test("transitions: counts sum to events minus users, and marginals agree") {
    for (seed <- 21L to 26L) {
      val log = sample(logGen, seed)
      val tr = Warehouse.transitions(df(log), "user_id", "ts", "event_id",
          "event_type")
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val users = log.map(_._1).distinct.size
      assert(tr.values.sum == log.size - users, s"seed $seed")
      // brute check against the sorted per-user fold
      val brute = log.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b) }.toSeq
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(tr == brute, s"seed $seed")
    }
  }

  test("gap islands: active hours conserve and islands partition them") {
    for (seed <- 31L to 36L) {
      val log = sample(logGen, seed)
      // spread events across hours to make real islands
      val hourly = log.map { case (u, t, id, ty) => (u, t * 1800, id, ty) }
      val gi = Warehouse.gapIslands(df(hourly), "user_id", "ts")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val activeByUser = hourly.map { case (u, t, _, _) => (u, t / 3600) }
        .distinct.groupBy(_._1)
      activeByUser.foreach { case (u, hrs0) =>
        val hrs = hrs0.map(_._2).sorted
        val (n, longest, total) = gi(u)
        assert(total == hrs.size, s"seed $seed: active-hour conservation")
        // brute islands
        val runs = hrs.foldLeft(List.empty[List[Long]]) {
          case (acc, h) if acc.nonEmpty && acc.head.head == h - 1 =>
            (h :: acc.head) :: acc.tail
          case (acc, h) => List(h) :: acc
        }
        assert(n == runs.size, s"seed $seed: island count")
        assert(longest == runs.map(_.size).max, s"seed $seed: longest run")
      }
    }
  }

  test("range frame equals brute trailing-interval sum on random logs") {
    // the rel_range_window shape: sum over [t−6, t] by VALUE, per key —
    // brute per-row filter-sum is the ground truth; gaps in t must
    // shrink the window (the rows-frame failure mode)
    import org.apache.spark.sql.expressions.Window
    for (seed <- 51L to 56L) {
      val log = sample(logGen, seed)
      val in = df(log).select(col("user_id"), col("ts").cast("long").as("t"),
        col("event_id").as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        .rangeBetween(-6L, 0)
      val got = in.select(col("user_id"), col("t"), col("v"),
          sum(col("v")).over(w).as("s"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      val rows = log.map { case (u, t, id, _) => (u, t, id) }
      for ((u, t, id) <- rows) {
        val brute = rows.filter { case (u2, t2, _) =>
          u2 == u && t2 >= t - 6 && t2 <= t }.map(_._3).sum
        assert(got((u, t, id)) == brute, s"seed $seed at ($u,$t)")
      }
    }
  }

  test("funnel level counts: streaming fold equals batch on random logs") {
    for (seed <- 41L to 44L) {
      val log = sample(logGen, seed)
      val batch = graft.operators.Funnel.windowFunnel(df(log), "user_id",
          "ts", "event_id", "event_type", Seq("a", "b", "c"), 10000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // levels partition all users
      assert(batch.values.sum == log.map(_._1).distinct.size, s"seed $seed")
    }
  }
}
