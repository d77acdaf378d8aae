package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.Row
import graft.core._

/** Property-based algebraic laws over random tiny graphs (SURVEY §5.2):
  * opt ⊇ and, double negation, times(p,1,1) ≡ pred(p), cast
  * round-trips. ScalaCheck generators are driven directly with fixed
  * seeds (one Spark job per case is expensive, and fixed seeds keep the
  * suite deterministic). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private val nodes = Gen.oneOf(":a", ":b", ":c", ":d")
  private val edgeGen = for { s <- nodes; o <- nodes } yield (s, o)
  private val graphGen = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, edgeGen)).map(_.distinct)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def graphCtx(seed: Long): Ctx = {
    val edges = sample(graphGen, seed)
    ctxOf(triples(edges.map { case (s, o) => (s, "e", o: Any) }: _*))
  }

  private def solutions(q: Woql, ctx: Ctx): Set[Seq[String]] =
    Compiler.run(q)(ctx).collect().map { r =>
      r.schema.fieldNames.sorted.toSeq.map { f =>
        Option(r.getAs[Row](f)).map(v =>
          Option(v.getAs[String]("iri"))
            .getOrElse(String.valueOf(v.getAs[Any]("str")))).orNull
      }
    }.toSet

  test("retention state fold is batch-split-invariant and equals brute force") {
    // any event-hour multiset, split into arbitrarily ordered batches,
    // must fold to the same (cohort, offset mask) the batch operator
    // computes from the flat log — this is exactly the out-of-order
    // remap algebra (cohort refinements shifting recorded bits)
    val hourUs = 3600000000L
    val offs = Array(1, 3, 6, 24)
    val maxOff = offs.max
    val hoursGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L).map(_ * hourUs)))
    val cutsGen = Gen.listOf(Gen.chooseNum(1, 11))
    (1L to 300L).foreach { seed =>
      val hours = sample(hoursGen, seed)
      val cuts = sample(cutsGen, seed + 1000).filter(_ < hours.size)
      // split into batches at the cut points (keeps original order)
      val batches = {
        val idx = (0 +: cuts.distinct.sorted :+ hours.size).distinct.sorted
        idx.zip(idx.tail).map { case (a, b) => hours.slice(a, b).toArray }
          .filter(_.nonEmpty)
      }
      // seed each batch exactly like the stream does: state absent →
      // RetSt(batchMin, 0)
      val st = batches.foldLeft(Option.empty[graft.streaming.Events.RetSt]) {
        (s, b) => Some(graft.streaming.Events.retentionUpdate(
          s.getOrElse(graft.streaming.Events.RetSt(b.min, 0L)), b, maxOff))
      }.get
      // brute: cohort = min hour, mask = offsets present in the log
      val cohort = hours.min
      val present = hours.map(h => ((h - cohort) / hourUs).toInt).toSet
      val expMask = offs.zipWithIndex
        .collect { case (o, i) if present(o) => 1 << i }.sum
      assert(st.cohortUs == cohort, s"seed $seed cohort")
      assert(graft.streaming.Events.retentionMask(st.hours, offs) == expMask,
        s"seed $seed: hours=$hours batches=${batches.map(_.toSeq)}")
    }
  }

  test("turtle dump → load round-trips adversarial string literals") {
    // alphabet deliberately includes every character the dump must
    // escape (quote, backslash, newline, tab, CR), single quotes (the
    // round-11 quote form), unicode incl. an ASTRAL char (surrogate
    // pair — exercises the \U escape path end to end)
    val astral = new String(Character.toChars(0x1F600))
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("\"", "'", "\\", "\n", "\t", "\r", " ", "é", "→", astral))
    val strGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString)
    (1L to 4L).foreach { seed =>
      val vals = (0 until 6).map(i => sample(strGen, seed * 100 + i))
      val df = triples(vals.zipWithIndex.map { case (v, i) =>
        (s":s$i", "p", v: Any) }: _*)
      val again = graft.sources.Turtle.load(spark, graft.sources.Turtle.dump(df))
      val want = df.collect().map(r => (r.getString(1), r.getString(6))).toSet
      val got = again.collect().map(r => (r.getString(1), r.getString(6))).toSet
      assert(got == want, s"seed $seed: $vals")
    }
  }

  test("opt solutions are a superset of and solutions") {
    (1L to 5L).foreach { seed =>
      val ctx = graphCtx(seed)
      val base = TriplePat(V("X"), Node("e"), V("Y"))
      val ext = TriplePat(V("Y"), Node("e"), V("Z"))
      val andSols = solutions(And(Seq(base, ext)), ctx)
      val optSols = solutions(And(Seq(base, Opt(ext))), ctx)
      assert(andSols.subsetOf(optSols), s"seed $seed")
      assert(solutions(base, ctx).size <= optSols.size, s"seed $seed")
    }
  }

  test("self-contained opt equals brute-force optional extension") {
    // exercises the Opt rewrite (Compiler: independent compile +
    // left-outer on SHARED vars only) against the semantics computed
    // directly on the driver: each frame row either extends by every
    // matching sub-solution or survives once with nulls
    (30L to 35L).foreach { seed =>
      val edges = sample(graphGen, seed)
      val ctx = ctxOf(triples(edges.map { case (s, o) => (s, "e", o: Any) }: _*))
      val q = And(Seq(
        TriplePat(V("X"), Node("e"), V("Y")),
        Opt(And(Seq(
          TriplePat(V("Y"), Node("e"), V("Z")),
          TriplePat(V("Z"), Node("e"), V("W")))))))
      val got = Compiler.run(q)(ctx).collect().toSeq.map { r =>
        Seq("W", "X", "Y", "Z").map(f =>
          Option(r.getAs[Row](f)).map(_.getAs[String]("iri")).orNull)
      }.sortBy(_.mkString(","))
      val subSols = for { (y, z) <- edges; (z2, w) <- edges if z2 == z }
        yield (y, z, w)
      val want: Seq[Seq[String]] = edges.flatMap { case (x, y) =>
        val m = subSols.filter(_._1 == y)
        if (m.isEmpty) Seq(Seq(null, x, y, null))
        else m.map { case (_, z, w) => Seq(w, x, y, z) }
      }.sortBy(_.mkString(","))
      assert(got == want, s"seed $seed: $edges")
    }
  }

  test("double negation keeps exactly the base solutions with a match") {
    (10L to 14L).foreach { seed =>
      val ctx = graphCtx(seed)
      val base = TriplePat(V("X"), Node("e"), V("Y"))
      val ext = TriplePat(V("Y"), Node("e"), V("Z"))
      val notNot = solutions(And(Seq(base, Not(Not(ext)))), ctx)
      val withMatch = solutions(And(Seq(base, ext)), ctx).map(_.take(2))
      assert(notNot.map(_.take(2)) == withMatch, s"seed $seed")
    }
  }

  test("times(e,1,1) equals pred(e) as a pair relation") {
    (20L to 24L).foreach { seed =>
      val ctx = graphCtx(seed)
      val t11 = solutions(PathQ(V("X"), PTimes(PPred("e"), 1, 1), V("Y")), ctx)
      val pred = solutions(Distinct(Seq("X", "Y"),
        PathQ(V("X"), PPred("e"), V("Y"))), ctx)
      assert(t11 == pred, s"seed $seed")
    }
  }

  test("cast int→double→int round-trips") {
    Seq(0, 7, -3, 1000000, -999999).foreach { n =>
      val g = triples((":x", "v", n))
      val q = And(Seq(
        TriplePat(V("X"), Node("v"), V("A")),
        CastQ(V("A"), "xsd:double", "D"),
        CastQ(V("D"), "xsd:integer", "I")))
      val out = Compiler.run(q)(ctxOf(g)).collect()
        .map(_.getAs[Row]("I").getAs[Long]("lng"))
      assert(out.toSeq == Seq(n.toLong))
    }
  }

  test("decimal eval a+a-b matches BigDecimal reference on random inputs") {
    // random decimals with up to 18 fractional digits and |v| < 10^12:
    // the engine's (36,18) operating type must be EXACT here
    val decGen = for {
      unscaled <- Gen.chooseNum(-999999999999L, 999999999999L)
      scale <- Gen.chooseNum(0, 18)
    } yield BigDecimal(unscaled, scale).setScale(18)
    (1L to 8L).foreach { seed =>
      val a = sample(decGen, seed)
      val b = sample(decGen, seed + 100)
      val g = triples((":x", "va", a.bigDecimal), (":x", "vb", b.bigDecimal))
      val q = And(Seq(
        TriplePat(V("X"), Node("va"), V("A")),
        TriplePat(V("X"), Node("vb"), V("B")),
        Eval(ABin("-", ABin("+", ATerm(V("A")), ATerm(V("A"))), ATerm(V("B"))), "R")))
      val got = Compiler.run(q)(ctxOf(g)).collect()
        .map(_.getAs[Row]("R").getAs[java.math.BigDecimal]("dec")).head
      val want = (a + a - b).setScale(18)
      assert(BigDecimal(got) == want, s"seed $seed: $a, $b")
    }
  }

  test("overlap join equals nested-loop on random interval sets, random bin widths") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ivGen = for {
      s <- Gen.chooseNum(0L, 5000L)
      len <- Gen.chooseNum(0L, 800L)
    } yield (s, s + len)
    val setGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, ivGen))
    (1L to 5L).foreach { seed =>
      val ls = sample(setGen, seed).zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }
      val rs = sample(setGen, seed + 50).zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }
      val l = ls.toDF("a_id", "a_s", "a_e"); val r = rs.toDF("b_id", "b_s", "b_e")
      val brute = l.crossJoin(r)
        .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val bin = sample(Gen.chooseNum(1L, 2000L), seed + 99)
      val got = graft.operators.RangeJoin
        .overlapBinned(l, "a_s", "a_e", r, "b_s", "b_e", bin)
        .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"seed $seed bin $bin: duplicate pairs")
      assert(got.toSet == brute, s"seed $seed bin $bin")
    }
  }

  test("PageRank deep iteration stays exact through lineage truncation") {
    import spark.implicits._
    // a→c, b→c, c→a at 10 rounds crosses the every-4-rounds
    // localCheckpoint twice; values must equal the recurrence computed
    // on the driver with the same integer arithmetic
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = graft.operators.PageRank.fixedPoint(edges, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val S = 1000000000L; val base = 150000000L
    var (pa, pb, pc) = (S, S, S)
    for (_ <- 1 to 10) {
      val (na, nc) = (base + 85 * pc / 100, base + 85 * (pa + pb) / 100)
      pa = na; pb = base; pc = nc
    }
    assert(got == Map("a" -> pa, "b" -> pb, "c" -> pc))
  }
}
