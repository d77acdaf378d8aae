package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 additions: WordPiece tokenizer (train + apply), GraphQL
  * _count (server-level cases live in ServerSpec), semi-naive
  * closeness early-exit. */
class Round14OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("wordpiece trainer picks the likelihood argmax and strips ## on merge") {
    import spark.implicits._
    // words: aaab×2, cab×1.
    // v0: aaab=[a,##a,##a,##b], cab=[c,##a,##b]
    // units: a=2, ##a=5, ##b=3, c=1
    // pairs: (a,##a)=2, (##a,##a)=2, (##a,##b)=3, (c,##a)=1
    // scores·1e12: 200e9 / 80e9 / 200e9 / 200e9 — three-way tie at
    // 0.2, lexicographic lhs tie-break: '#' < 'a' < 'c' → (##a,##b)
    // wins round 1 (freq 3), merged symbol ##ab (## stripped from rhs).
    // round 2: aaab=[a,##a,##ab], cab=[c,##ab]; units a=2,##a=2,
    // ##ab=3,c=1; scores: (a,##a)=0.5, (##a,##ab)=1/3, (c,##ab)=1/3
    // → (a,##a) wins (freq 2, score 500e9).
    val docs = Seq((1L, "aaab aaab cab")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.wordpieceTrain(docs, 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "##a", "##b", 3L, 200000000000L),
      (2L, "a", "##a", 2L, 500000000000L)))
    // apply: aaab → [aa,##ab] (2 pieces), cab → [c,##ab] (2 pieces);
    // doc 1 has 3 words → 2·2 + 1·2 = 6 pieces
    val app = graft.llm.TextAnalysis.wordpieceApply(docs, 2).collect()
    assert(app.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 6L)))
  }

  test("wordpiece handles single-char words (no pairs) and stops early") {
    import spark.implicits._
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    // every word is one bare symbol — no adjacent pairs, trainer stops
    assert(graft.llm.TextAnalysis.wordpieceTrain(docs, 3).count() == 0L)
    val app = graft.llm.TextAnalysis.wordpieceApply(docs, 3).collect()
    assert(app.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L)))
  }

  test("closeness early-exits when the frontier empties before maxHops") {
    import spark.implicits._
    // diameter-1 graph with maxHops 6: the hop-2 frontier is empty,
    // so the loop must stop (result identical either way)
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = graft.operators.Centrality.landmarkCloseness(edges, k = 2, maxHops = 6)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "a" -> ((2L, 1L, 2000000L)), "b" -> ((2L, 1L, 2000000L))))
  }
}
