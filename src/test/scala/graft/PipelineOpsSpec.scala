package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Sampling, Similarity}
import graft.operators.RangeJoin

/** Round-5 pipeline operators: binned range join, sq8 quantized
  * similarity, incremental dedup, shard manifest. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("binned range join equals the nested-loop join, any bin width") {
    import spark.implicits._
    val points = (1 to 300).map(i => (i.toLong, java.sql.Timestamp.valueOf(
      s"2024-01-01 ${"%02d".format(i % 24)}:${"%02d".format(i % 60)}:00")))
      .toDF("pid", "ts")
    val ivals = (1 to 40).map { i =>
      val s = java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(i % 20)}:00:00")
      val e = java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(i % 20)}:${"%02d".format((i * 7) % 60)}:59")
      (i.toLong, s, e)
    }.toDF("wid", "ws", "we")
    val brute = points.crossJoin(ivals)
      .where($"ts" >= $"ws" && $"ts" <= $"we")
      .select("pid", "wid").orderBy("pid", "wid").collect().toSeq
    for (binUs <- Seq(60L * 1000000, 17L * 60 * 1000000, 3600L * 1000000)) {
      val got = RangeJoin.binned(points, "ts", ivals, "ws", "we", binUs)
        .select("pid", "wid").orderBy("pid", "wid").collect().toSeq
      assert(got == brute, s"binMicros=$binUs")
    }
  }

  test("range join rejects colliding column names") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("ts", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.binned(a, "ts", a, "ts", "x", 1000)
    }
  }

  test("sq8 quantization codes are exact integers in [-128, 127]") {
    import spark.implicits._
    val df = Seq((1L, Seq(-0.9f, -0.004f, 0.0f, 0.003f, 0.49f, 0.9f)))
      .toDF("vec_id", "embedding")
    val codes = df.select(Similarity.sq8(col("embedding"))).head()
      .getSeq[Double](0)
    assert(codes == Seq(-128.0, -2.0, 0.0, 0.0, 125.0, 127.0))
  }

  test("sq8 top-k ranks nearly like exact cosine on the testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.sq8TopK(emb, col("vec_id") < 10, 5)
      .select("q", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization perturbs ranks only marginally: demand >= 80%
    // agreement on the top-5 sets (exactly 50 pairs each)
    assert(quant.size == 50)
    assert((exact intersect quant).size >= 40,
      s"recall too low: ${(exact intersect quant).size}/50")
  }

  test("incremental dedup: exact beats near, unmatched docs are new") {
    import spark.implicits._
    val corpusDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, corpusDoc),                       // corpus
      (1L, "totally different text about completely other things entirely"),
      (10L, corpusDoc),                      // new: exact dup of 0
      (11L, "Alpha beta GAMMA delta epsilon zeta eta theta!!"), // new: canonical-exact of 0
      (12L, "alpha beta gamma delta epsilon zeta eta iota"),    // new: near dup of 0
      (13L, "nothing like anything else in the corpus at all honestly")
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(docs, col("doc_id") >= 10, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "exact", 11L -> "exact", 12L -> "near", 13L -> "new"))
  }

  test("shard manifest covers every doc exactly once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Sampling.shardManifest(docs, 8).collect()
    assert(m.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(m.map(_.getLong(1)).sum == docs.count())
    val toks = docs.select(sum(size(split(trim(col("text")), "\\s+"))))
      .head().getLong(0)
    assert(m.map(_.getLong(2)).sum == toks)
  }

  test("overlap join equals the nested-loop overlap join, any bin width") {
    import spark.implicits._
    // micro-second intervals with varied spans, including span-0 and
    // exact-touch endpoints (a.e == b.s overlaps under <=)
    val left = (1 to 120).map { i =>
      val s = i.toLong * 1000; (i.toLong, s, s + (i % 7).toLong * 800)
    }.toDF("a_id", "a_s", "a_e")
    val right = (1 to 90).map { i =>
      val s = i.toLong * 1300 + 200; (i.toLong, s, s + (i % 5).toLong * 1100)
    }.toDF("b_id", "b_s", "b_e")
    val brute = left.crossJoin(right)
      .where($"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select("a_id", "b_id").orderBy("a_id", "b_id").collect().toSeq
    for (binUs <- Seq(500L, 1000L, 7919L, 100000L)) {
      val got = RangeJoin.overlapBinned(left, "a_s", "a_e", right, "b_s", "b_e", binUs)
        .select("a_id", "b_id").orderBy("a_id", "b_id").collect().toSeq
      assert(got == brute, s"binMicros=$binUs")
    }
  }

  test("sessionize splits on gap > threshold, (ts, id) tie order") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:20:00"), 2L), // same session (gap 20m)
      (1L, ts("2024-01-01 10:50:00"), 3L), // same session (gap exactly 30m stays)
      (1L, ts("2024-01-01 11:21:00"), 4L), // NEW session (gap 31m)
      (2L, ts("2024-01-01 10:00:00"), 5L)  // other key: own session
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.Sessionize
      .sessions(e, "user_id", "ts", "event_id", 30L * 60 * 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 1L) -> 3L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }

  test("train/val/test split is total, disjoint, and growth-stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s = Sampling.trainValTest(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s.size == docs.count())
    assert(s.values.toSet.subsetOf(Set("train", "val", "test")))
    // stability: the same doc gets the same split on a half corpus
    val half = Sampling.trainValTest(docs.where(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.forall { case (id, sp) => s(id) == sp })
  }

  test("mix-to-budget rates cap over-supplied sources and pass small ones") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val src = if (i < 150) "big" else "small"
      (i.toLong, src, ("tok " * 20).trim) // 20 tokens each
    }.toDF("doc_id", "source", "text")
    val got = Sampling.mixToBudget(docs, Map("big" -> 1000L), defaultCap = 100000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    // big: 3000 tokens supply, cap 1000 → rate 1/3, selection thinned
    val (bigSupply, bigRate, bigN, _) = got("big")
    assert(bigSupply == 3000L && math.abs(bigRate - 1.0 / 3) < 1e-9)
    assert(bigN > 20 && bigN < 80, s"expected ~50 of 150 kept, got $bigN")
    // small: 1000 tokens < default cap → rate 1, everything kept
    assert(got("small") == ((1000L, 1.0, 50L, 1000L)))
  }

  test("KMV sketch: exact below k, within 20% above k") {
    import spark.implicits._
    val docs = ((0 until 1000).map(i => ("big", s"value_$i")) ++
      (0 until 10).map(i => ("tiny", s"v$i")) ++
      (0 until 10).map(i => ("tiny", s"v$i"))) // dup rows, same distincts
      .toDF("lang", "text")
    val got = graft.llm.Sketches.kmvDistinct(docs, col("lang"), col("text"), 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("tiny") == 10.0) // < k → exact
    assert(math.abs(got("big") - 1000.0) / 1000.0 < 0.2,
      s"KMV estimate off: ${got("big")}")
  }

  test("pipeline v2 accounts every cleaned survivor exactly once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val survivors = graft.llm.Pipeline.cleanCorpus(docs).count()
    val stats = graft.llm.Pipeline.cleanSplitStats(docs).collect()
    assert(stats.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    assert(stats.map(_.getLong(1)).sum == survivors)
    assert(stats.forall(_.getLong(2) > 0))
  }

  test("KMV merge path equals the direct whole-table sketch") {
    import spark.implicits._
    val docs = (0 until 800).map(i => (s"lang${i % 5}", s"text_$i"))
      .toDF("lang", "text")
    val direct = graft.llm.Sketches
      .kmvDistinct(docs.withColumn("one", lit("all")), col("one"), col("text"), 32)
      .head().getDouble(1)
    val merged = graft.llm.Sketches
      .kmvUnionEstimate(docs, col("lang"), col("text"), 32)
      .head().getDouble(0)
    assert(merged == direct, s"merge path diverged: $merged != $direct")
  }

  test("vocab top-k counts document frequency, not term frequency") {
    import spark.implicits._
    val docs = Seq(
      ("en", "spam spam spam spam rare"),
      ("en", "common words common here"),
      ("en", "common rare")).toDF("lang", "text")
    val got = graft.llm.TextAnalysis.vocabTopK(docs, 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // common: df 2; rare: df 2; spam df 1 (once per doc despite 4 uses)
    assert(got.toSeq.sortBy(_._3).take(2).map(t => (t._1, t._2)).toSet ==
      Set(("common", 2L), ("rare", 2L)))
    assert(got.find(_._1 == "spam").map(_._2).contains(1L))
  }

  test("BPE pairs count adjacent occurrences, not documents") {
    import spark.implicits._
    val docs = Seq(("x", "a b a b c"), ("y", "a b")).toDF("lang", "text")
    val got = graft.llm.TextAnalysis.bpePairs(docs, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b" occurs twice in doc 1 + once in doc 2
    assert(got == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("BPE merge-loop training matches the hand-computed Sennrich example") {
    import spark.implicits._
    // 5×low 2×lower 6×newest 3×widest — the classic BPE walkthrough.
    // Reference merges (greedy, corpus-frequency, (lhs,rhs) tie-break):
    // es(9) est(9) est_(9) lo(7) low(7) ew(6)
    val docs = Seq(
      ("en", ("low " * 5 + "lower " * 2).trim),
      ("en", ("newest " * 6 + "widest " * 3).trim)).toDF("lang", "text")
    val got = graft.llm.TextAnalysis.bpeTrain(docs, 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "est", "_", 9L),
      (4L, "l", "o", 7L), (5L, "lo", "w", 7L), (6L, "e", "w", 6L)))
  }

  test("BPE merge application is greedy left-to-right (aaa + (a,a) -> [aa,a])") {
    import spark.implicits._
    // "aaaa" under merge (a,a): [a,a,a,a,_] -> [aa,aa,_] (the merged
    // symbol never re-pairs within its own round, so freq is 9 — three
    // overlapping (a,a) per word — but only two merges land per word).
    // Round 2 ties (aa,aa)=3 with (aa,_)=3; '_' < 'a' wins the
    // (lhs,rhs) tie-break.
    val docs = Seq(("en", "aaaa aaaa aaaa")).toDF("lang", "text")
    val got = graft.llm.TextAnalysis.bpeTrain(docs, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 9L), (2L, "aa", "_", 3L)))
  }

  test("BPE apply encodes docs with the trained merges (Sennrich example)") {
    import spark.implicits._
    // Same corpus as the training test; merges after 6 rounds:
    // es est est_ lo low ew. Encodes: low→[low,_]=2, lower→[low,e,r,_]=4,
    // newest→[n,ew,est_]=3, widest→[w,i,d,est_]=4.
    val docs = Seq(
      (1L, ("low " * 5 + "lower " * 2).trim),
      (2L, ("newest " * 6 + "widest " * 3).trim)).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bpeApply(docs, 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((7L, 5 * 2 + 2 * 4L)),
      2L -> ((9L, 6 * 3 + 3 * 4L))))
  }

  test("MMR re-rank trades relevance for diversity at the hand-computed step") {
    import spark.implicits._
    // q=[1,0]; cands: 1=[1,0] (sim 1), 2=[1,1] (sim 1/√2), 3=[0,1] (sim 0).
    // Step 1 picks 1 (mmr 7·1e6). Step 2: cand2 scores 7·707107−3·707107
    // (its redundancy to pick 1 is its own sim), cand3 scores 0 → cand2.
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(1f, 1f)), (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.mmrTopK(emb, col("vec_id") === 0, k = 2, pool = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 1L, 1L, 7000000L), (0L, 2L, 2L, 4L * 707107L)))
  }

  test("Naive Bayes scores match the hand-computed micro-log example") {
    import spark.implicits._
    // V=3; class a: x:3,y:1,z:1 (5 toks, 2 docs); class b: y:2,z:1 (3 toks).
    val docs = Seq((1L, "a", "x x y"), (2L, "a", "x z"), (3L, "b", "y y z"))
      .toDF("doc_id", "lang", "text")
    val got = graft.llm.Classifier.score(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._1).toMap == Map(1L -> "a", 2L -> "a", 3L -> "b"))
    // doc1 vs a: round(ln(2/3)e6) + 3·round(ln(1/8)e6)
    //   + 2·(round(ln(4/8)e6)−round(ln(1/8)e6)) + (round(ln(2/8)e6)−round(ln(1/8)e6))
    // = -405465 - 6238326 + 2·1386295 + 693148 = -3178053
    assert(got(1L)._2 == -3178053L)
  }

  test("fixed-point PageRank matches the hand-computed star graph") {
    import spark.implicits._
    // a→c, b→c, c→a; scale 1e9, base 0.15e9, two damped rounds
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = graft.operators.PageRank.fixedPoint(edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // p1: c = .15e9 + 85%·2e9 = 1.85e9 ; a = .15e9 + 85%·1e9 = 1e9 ; b = .15e9
    // p2: c = .15e9 + 85%·(1e9+.15e9) = 1_127_500_000
    //     a = .15e9 + 85%·1.85e9 = 1_722_500_000 ; b = .15e9
    assert(got == Map("a" -> 1722500000L, "b" -> 150000000L, "c" -> 1127500000L))
  }

  test("BM25 matches an independent driver-side computation") {
    import spark.implicits._
    val docs = Seq((1L, "spark spark join x"), (2L, "join y"), (3L, "data z w v"))
      .toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bm25(docs, Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference computation, independent of the Column-expression path
    val corpus = Map(1L -> Seq("spark", "spark", "join", "x"),
      2L -> Seq("join", "y"), 3L -> Seq("data", "z", "w", "v"))
    val n = corpus.size; val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def score(toks: Seq[String]): Double = Seq("spark", "join").map { t =>
      val tf = toks.count(_ == t).toDouble
      val df = corpus.values.count(_.contains(t)).toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl))
    }.reduceLeft(_ + _)
    val want = corpus.view.mapValues(score).toMap.filter(_._2 > 0)
      .map { case (k, v) => k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got == want)                       // doc 3 (no query term) excluded
    assert(!got.contains(3L))
  }

  test("tf-idf: everywhere-terms score zero, unique terms rank first") {
    import spark.implicits._
    // "c" appears in all docs → idf = ln(1) = 0; each doc's unique term wins
    val docs = Seq((1L, "u1 c c"), (2L, "u2 c"), (3L, "u3 c")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.tfidfTopK(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.filter(_._2 == "c").forall(_._3 == 0.0))
    val top1 = got.filter(_._4 == 1L).map(r => r._1 -> r._2).toMap
    assert(top1 == Map(1L -> "u1", 2L -> "u2", 3L -> "u3"))
    assert(got.groupBy(_._1).values.forall(_.map(_._4).sorted.toSeq == Seq(1L, 2L)))
  }

  test("DSIR weights: target==corpus is identically zero, target tokens rank up") {
    import spark.implicits._
    val allEn = Seq((1L, "en", "a b"), (2L, "en", "c d")).toDF("doc_id", "lang", "text")
    // target LM == raw LM bucket-for-bucket → every log-ratio is exactly 0
    assert(graft.llm.TextAnalysis.dsirWeights(allEn, "en")
      .collect().forall(_.getDouble(2) == 0.0))
    val mixed = Seq((1L, "en", "tgta tgtb tgta"), (2L, "zh", "rawa rawb rawc"))
      .toDF("doc_id", "lang", "text")
    val w = graft.llm.TextAnalysis.dsirWeights(mixed, "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > 0 && w(2L) < 0, s"target doc should out-weigh raw doc: $w")
  }

  test("temperature sampling: α=1 is proportional, α<1 lifts low-resource") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rates(alpha: Double, budget: Long) = graft.llm.Sampling
      .temperatureSample(docs, alpha, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    // α=1: every language gets rate budget/total — identical across langs
    val r1 = rates(1.0, 3000L)
    assert(r1.map(_._3).distinct.size == 1, s"α=1 rates must be uniform: $r1")
    // α=0.5: the highest-supply language gets the LOWEST rate
    val r5 = rates(0.5, 3000L)
    val bySupply = r5.sortBy(-_._2)
    assert(bySupply.head._3 == r5.map(_._3).min,
      s"α<1 must down-weight the high-resource language: $r5")
    assert(r5.map(_._3).min < r5.map(_._3).max)
  }

  test("bigram perplexity matches the hand-built add-one LM") {
    import spark.implicits._
    // corpus LM: c(a b)=3, c(b a)=1, c(a·)=3, c(b·)=1, V={a,b}=2
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bigramPerplexity(docs)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val (lab, lba) = (math.log(4.0 / 5), math.log(2.0 / 3))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r6(math.exp(-(((0.0 + lab) + lba) + lab) / 3)), 3L)))
    assert(got(2L) == ((r6(math.exp(-lab / 1)), 1L)))
  }

  test("DSIR resample: nested in k, over-represents the target slice") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = graft.llm.TextAnalysis.dsirWeights(docs, "en")
    def sample(k: Int) = graft.llm.Sampling
      .weightedTopK(w, round(exp(col("weight")), 9), k)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val (s20, s40) = (sample(20), sample(40))
    assert(s20.map(_._1).toSet.subsetOf(s40.map(_._1).toSet)) // A-ES top-k nests
    val corpusEn = docs.where(col("lang") === "en").count().toDouble / docs.count()
    val sampleEn = s20.count(_._2 == "en").toDouble / s20.length
    assert(sampleEn > corpusEn,
      s"importance resample should up-weight en: $sampleEn vs corpus $corpusEn")
  }
}
