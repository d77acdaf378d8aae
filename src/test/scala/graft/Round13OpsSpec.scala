package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 additions: the LSH hot-band guard, LPA communities, the
  * trained logistic classifier. */
class Round13OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("LPA splits two triangles at their bridge; deterministic ties") {
    import spark.implicits._
    // two triangles {a1,a2,a3} and {b1,b2,b3} joined by a3—b1: after
    // 3 synchronous min-tie rounds the a-side converges to "a1" and
    // the b-side to "a3" (hand-computed label trace) — communities
    // split AT the bridge, which WCC (one component) cannot see
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("a3", "b1")).toDF("src", "dst")
    val got = graft.operators.Lpa.communities(edges, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "a3", "b2" -> "a3", "b3" -> "a3"))
    // self-loops are dropped, not counted as neighbor votes
    val loop = Seq(("x", "x"), ("x", "y")).toDF("src", "dst")
    val got2 = graft.operators.Lpa.communities(loop, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got2 == Map("x" -> "y", "y" -> "x"))
  }

  test("landmark closeness on a path graph matches hand-computed values") {
    import spark.implicits._
    // path a–b–c–d, landmarks = 2 least ids {a, b}: dists from a =
    // 0,1,2,3 and from b = 1,0,1,2 → per node (reached, Σdist):
    // a(2,1) b(2,1) c(2,3) d(2,5)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = graft.operators.Centrality.landmarkCloseness(edges, k = 2)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "a" -> ((2L, 1L, 2000000L)), "b" -> ((2L, 1L, 2000000L)),
      "c" -> ((2L, 3L, 666667L)), "d" -> ((2L, 5L, 400000L))))
  }

  test("modularity of the two-triangle-bridge partition is exact") {
    import spark.implicits._
    // LPA splits the two triangles at the bridge (see the LPA test):
    // 2m=14, E_within·2=12 (the bridge crosses), D_c=7 per side →
    // Q·196 = 14·12 − 2·49 = 70 → q_micro = round(1e6·70/196) = 357143
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
      ("a3", "b1")).toDF("src", "dst")
    val r = graft.operators.Lpa.modularity(edges, rounds = 3).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 14L, 12L, 98L, 357143L)))
  }

  test("logistic classifier learns a separable fixture and stays integer-deterministic") {
    import spark.implicits._
    // perfectly separable: 'en' docs speak one vocabulary, 'de' docs
    // another — after 3 GD rounds the sigmoid scores must order every
    // en doc above every de doc (the boundary moved the right way)
    val docs = ((0 until 20).map(i =>
        (i.toLong, "good clean prose sentence words here", "en")) ++
      (20 until 40).map(i =>
        (i.toLong, "schlecht rausch text zeug unfug dort", "de")))
      .toDF("doc_id", "text", "lang")
    val out = graft.llm.Classifier.logistic(docs, "en",
      buckets = 8, rounds = 3, stepDiv = 4L).collect()
    val en = out.filter(_.getLong(2) == 1L).map(_.getLong(3))
    val de = out.filter(_.getLong(2) == 0L).map(_.getLong(3))
    assert(en.nonEmpty && de.nonEmpty)
    assert(en.min > de.max, s"en scores ${en.min} must exceed de ${de.max}")
    // deterministic: identical rerun → identical micro scores
    val again = graft.llm.Classifier.logistic(docs, "en",
      buckets = 8, rounds = 3, stepDiv = 4L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq)
  }

  test("PMI top-k surfaces a planted collocation with a hand-computed score") {
    import spark.implicits._
    // 6 docs of "new york <unique filler>": the only pair reaching
    // minCount=5 is (new, york); N=30, n_a(new)=12, n_b(york)=6 →
    // pmi = ln(6·30 / (12·6)) = ln(2.5)
    val docs = (0 until 6).map(i => (i.toLong, s"new york x$i y$i"))
      .toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.pmiTopK(docs, window = 2, topk = 5,
      minCount = 5).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "new" && r.getString(1) == "york")
    assert(r.getLong(2) == 6L)
    assert(r.getDouble(3) == math.rint(math.log(2.5) * 1e6) / 1e6 ||
      r.getDouble(3) == BigDecimal(math.log(2.5))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(4) == 1L)
  }

  test("unigram trainer converges to whole-word pieces on a planted corpus") {
    import spark.implicits._
    // words: abab (f=10), xyzq (f=5), cd (f=5). Under add-one micro-ln
    // costs, one 4-char piece always beats two 2-char pieces
    // (2·cost(ab) > cost(abab) at any smoothing here), so hard-EM
    // assigns every word its whole-word segmentation both rounds.
    val docs = (0 until 5).map(i => (i.toLong, "abab abab xyzq cd"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis.unigramTrain(docs,
        vocabSize = 64, pieceLen = 4, rounds = 2, maxWordLen = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("abab")._1 == 10L)
    assert(out("xyzq")._1 == 5L && out("cd")._1 == 5L)
    assert(out("ab")._1 == 0L && out("a")._1 == 0L)
    assert(out.values.map(_._1).sum == 20L)
    // all 20 candidate pieces retained (zero-count ones included),
    // and a used piece is strictly cheaper than an unused one
    assert(out.size == 20)
    assert(out("abab")._2 < out("ab")._2)
    // bit-replayable: a rerun is identical
    val again = graft.llm.TextAnalysis.unigramTrain(docs,
        vocabSize = 64, pieceLen = 4, rounds = 2, maxWordLen = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == again)
    // apply encodes with the trained pieces: every word one piece here
    // → n_uni_tokens == n_words == 4 per doc
    val app = graft.llm.TextAnalysis.unigramApply(docs,
        vocabSize = 64, pieceLen = 4, rounds = 2, maxWordLen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(app.length == 5 && app.forall(t => t._2 == 4L && t._3 == 4L))
  }

  test("exact substring dedup marks the later copy of a planted repeat") {
    import spark.implicits._
    val rep = (1 to 12).map(i => s"R$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $rep b1 b2"),     // repeat at pos 3..14 (global first)
      (2L, s"c1 $rep d1 d2 d3"),        // repeat at pos 1..12 → marked
      (3L, "unique words only here nothing repeated at all in sight"),
      (4L, "x y z"), (5L, "x y z")      // dup SHORTER than L → never marked
    ).toDF("doc_id", "text")
    val spans = graft.llm.Dedup.substringSpans(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only doc 2's occurrence is removable: one merged span covering
    // exactly the 12-token repeat (5 stride-1 windows)
    assert(spans.toSeq == Seq((2L, 1L, 12L, 5L)))
    val clean = graft.llm.Dedup.substringClean(docs, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(clean(1) == ((2L, "c1 d1 d2 d3", 12L)))
    assert(clean(0)._3 == 0L && clean(2)._3 == 0L && clean(4)._3 == 0L)
    assert(clean(0)._2 == s"a1 a2 a3 $rep b1 b2")
  }

  test("incremental substring dedup: corpus hits + batch-internal dups") {
    import spark.implicits._
    val rep = (1 to 12).map(i => s"R$i").mkString(" ")
    val docs = Seq(
      (10L, s"a1 a2 a3 $rep b1 b2", false), // corpus
      (1L, s"c1 $rep d1 d2 d3", true),      // new: repeat hits corpus
      (2L, s"c1 $rep d1 d2 d3", true),      // new: byte-copy of doc 1
      (3L, "totally fresh unseen words never in the corpus at all", true)
    ).toDF("doc_id", "text", "isnew")
    val got = graft.llm.Dedup.substringSpansIncremental(
        docs.select(col("doc_id"), col("text")),
        col("doc_id") =!= 10L, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: only the repeat's 5 fully-inside windows hit the corpus;
    // doc 2: every window dups doc 1 inside the batch → whole doc
    assert(got.toSeq == Seq((1L, 1L, 12L, 5L), (2L, 0L, 15L, 9L)))
  }

  test("substring index round-trip: batch probe sees only corpus hits") {
    import spark.implicits._
    val rep = (1 to 12).map(i => s"R$i").mkString(" ")
    val corpus = Seq((10L, s"a1 a2 a3 $rep b1 b2")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"c1 $rep d1 d2 d3"),
      (2L, s"c1 $rep d1 d2 d3"), // batch-internal dup: NOT a hit here
      (3L, "totally fresh unseen words never in the corpus at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("substridx").toString
    graft.llm.Dedup.buildSubstrIndex(corpus, dir, 8)
    val got = graft.llm.Dedup.substringSpansFromIndex(batch, dir, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // both copies hit the CORPUS repeat; their mutual duplication is
    // deliberately not checked (micro-batch-split independence)
    assert(got.toSeq == Seq((1L, 1L, 12L, 5L), (2L, 1L, 12L, 5L)))
  }

  test("LSH hot-band guard refuses a pathological bucket, passes normal corpora") {
    import spark.implicits._
    // adversarial fixture: 40 byte-identical documents — every band
    // bucket holds all 40, the k²/2 candidate blow-up the guard exists
    // for — plus distinct documents that band apart
    val boiler = (0 until 40).map(i =>
      (i.toLong, "the same boilerplate template text repeated verbatim across pages"))
    val distinct = (100 until 110).map(i =>
      (i.toLong, s"genuinely unique document number $i with its own words $i$i"))
    val docs = (boiler ++ distinct).toDF("doc_id", "text")
    sys.props("graft.lsh.maxBandDocs") = "10"
    try {
      // the guard raises from INSIDE the candidate-join plan (one
      // action — no separate probe), so it surfaces as the action's
      // failure with the raise_error message in the cause chain
      val ex = intercept[Exception] {
        graft.llm.Dedup.minhashNearDups(docs, 0.8).count()
      }
      def messages(t: Throwable): String =
        if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
      assert(messages(ex).contains("maxBandDocs"), messages(ex))
      assert(messages(ex).contains("exact/canonical dedup"), messages(ex))
      // the shipped pipeline ORDER fixes it: exact dedup first, then
      // near-dup over the survivors — same corpus now passes the guard
      val survivors = docs.join(
        graft.llm.Dedup.exactGroups(docs).select(col("keep").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val pairs = graft.llm.Dedup.minhashNearDups(survivors, 0.8).collect()
      assert(pairs.forall(r => r.getLong(0) != r.getLong(1)))
    } finally sys.props.remove("graft.lsh.maxBandDocs")
    // default cap: normal corpora (the shared documents table) pass
    // unchanged — the guard must not fire on real bucket sizes
    val real = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    assert(graft.llm.Dedup.minhashNearDups(real, 0.8).count() >= 0)
  }
}
