package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Physical-plan shape guards: the properties that keep the EAV design
  * viable at 100 TB are INVISIBLE to row-level correctness tests —
  * partition pruning on the predicate column and filter pushdown to the
  * parquet scan. These specs pin them so a refactor that silently
  * reverts to full scans fails CI, not the cluster. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(q: Woql): String = {
    implicit val ctx: Ctx = Graft.ctx(spark, sfDir)
    val df = Compiler.run(q)
    df.queryExecution.executedPlan.toString
  }

  test("bound-predicate triple scan prunes parquet partitions on p") {
    val plan = planOf(TriplePat(V("C"), Node("tpch:c_name"), V("N")))
    // predicate-partitioned store: the scan must carry a PartitionFilters
    // entry binding p, not read every predicate's files
    assert(plan.contains("PartitionFilters"),
      s"no PartitionFilters in plan:\n$plan")
    assert(plan.contains("tpch:c_name"),
      s"bound predicate not pushed into partition pruning:\n$plan")
  }

  test("bound literal object pushes a data filter to the scan") {
    val plan = planOf(TriplePat(V("N"), Node("tpch:n_name"), Str("NATION_7")))
    assert(plan.contains("PushedFilters") && plan.contains("NATION_7"),
      s"literal filter did not reach the parquet scan:\n$plan")
  }

  test("katz / weighted-sssp rounds aggregate with map-side partials") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val kPlan = graft.operators.PageRank.katz(edges, hops = 2)
      .queryExecution.executedPlan.toString
    // the per-round inflow aggregate must be a partial+final
    // HashAggregate pair (map-side combine), not a single
    // shuffle-everything aggregate — the 100 TB property
    assert(kPlan.contains("partial_sum") || kPlan.contains("partial"),
      s"katz inflow aggregate lost its map-side partial:\n$kPlan")
    // sssp checkpoints per round (the final frame is a scanned RDD),
    // so the guard pins the relax STEP's aggregate directly
    val sEdges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val front = Seq(("a", 0L)).toDF("node", "dist")
    val sPlan = graft.operators.Sssp.relax(sEdges, front)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("partial_min") || sPlan.contains("partial"),
      s"sssp relax aggregate lost its map-side partial:\n$sPlan")
    assert(!kPlan.contains("CartesianProduct") &&
      !sPlan.contains("CartesianProduct"))
  }

  test("driver contract: every query has an oracle and vice versa") {
    // zero no-oracle entries is a round-3 invariant — a typo'd key on
    // either side silently weakens the correctness gate
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("graphql compiles to equi-joins only — no cartesian products") {
    // the GraphQL surface rides the WOQL compiler; combinators,
    // back-links and multi-hop links must all land as (broadcast/
    // shuffled) equi-joins on binding columns, never a product
    implicit val ctx: Ctx = Graft.ctx(spark, sfDir)
    val (_, df) = graft.server.GraphQL.run(
      """{ Nation(filter: {_or: [{n_name: {regex: "3$"}},
        |                        {n_name: {startsWith: "NATION_1"}}]}) {
        |    _id
        |    n_regionkey { r_name }
        |    _c_nationkey_of_Customer(filter: {c_acctbal: {ge: 9000.0}}) {
        |      c_name } } }""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"graphql plan degraded to a product join:\n$plan")
  }

  test("graphql per-link orderBy/limit rides the native GroupTopK plan") {
    implicit val ctx: Ctx = Graft.ctx(spark, sfDir)
    val (_, df) = graft.server.GraphQL.run(
      """{ Nation { n_name
        |    _c_nationkey_of_Customer(orderBy: {c_acctbal: DESC}, limit: 2) {
        |      c_name c_acctbal } } }""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"),
      s"per-link limit must be the partial-heap top-k, not a window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("small dimension joins broadcast in the flagship plan") {
    val plan = planOf(graft.queries.WoqlQueries.flagship)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("broadcast"),
      s"flagship conjunction lost its broadcast joins:\n$plan")
  }

  test("prefix-filter jaccard plan contains no nested-loop or cartesian join") {
    // the entire point of the prefix join is replacing the all-pairs
    // cross join with equi-joins — a planner regression to a
    // nested-loop product would still return correct rows, slowly
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = graft.llm.Dedup.ngramJaccardPrefix(docs, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"prefix join degraded to a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join degraded to a nested-loop join:\n$plan")
  }

  test("binned overlap join plans as an equi-join, not a nested loop") {
    // a raw interval-overlap predicate has no equi-key — Spark would
    // nested-loop it; the bin rewrite must surface a hash/merge join
    val plan = SparkEntry.queries("rel_interval_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join degraded to a product:\n$plan")
  }

  test("sessionize runs both windows and the rollup off ONE exchange") {
    // lag, the break cumsum, and the per-session groupBy all use the
    // user_id partitioning — a second Exchange means the shared-sort
    // optimization regressed
    val plan = SparkEntry.queries("rel_sessionize")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]*hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
  }

  test("BPE pair top-n plans as TakeOrderedAndProject, not a global window") {
    // per-partition heaps + k-row merge; a one-partition window over
    // all distinct pairs would be the silent scale regression
    val plan = SparkEntry.queries("text_bpe_pairs")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-n lost its TakeOrderedAndProject plan:\n$plan")
  }

  test("k-means assignment is a narrow projection (no exchange, no join)") {
    // kmeansSq8 returns the final-round assignment over the persisted
    // code frame: per-point work must stay map-only — the only jobs
    // Lloyd's needs are the k-row centroid aggregates during training
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = graft.llm.Clustering.kmeansSq8(emb, k = 4, iters = 1, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"assignment must be map-only:\n$plan")
  }

  test("BM25 never shuffles the corpus: broadcast stats + top-n heap") {
    // tf columns are array filters in the scan; corpus stats reduce to
    // ONE row that joins back as a broadcast — a sort-merge join or a
    // hash-partition exchange of the scan would be the scale regression
    val plan = SparkEntry.queries("text_bm25")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-n lost its TakeOrderedAndProject plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"BM25 must not shuffle the corpus:\n$plan")
  }

  test("tf-idf rank rides native GroupTopK: partial heaps before ONE doc_id exchange") {
    val plan = SparkEntry.queries("text_tfidf_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // per-partition bounded heaps must sit BELOW the doc_id exchange
    // (≤ k·partitions rows per doc cross it), final emit above — the
    // window plan this replaced full-sorted every scored term
    assert(plan.contains("GroupTopKPartial") && plan.contains("GroupTopKFinal"),
      s"expected native GroupTopK plan:\n$plan")
    assert("GroupTopKPartial \\[doc_id".r.findFirstIn(plan).isDefined,
      s"partial heap must group by doc_id:\n$plan")
    assert(!plan.contains("windowspecdefinition"),
      s"no window should remain in the tf-idf plan:\n$plan")
  }

  test("basket lift never self-joins the fact: pairs enumerate in-row") {
    val plan = SparkEntry.queries("rel_basket_lift")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // ONE basket-keyed exchange builds the per-basket sets, cached and
    // reused by every consumer (the printed tree repeats the cached
    // subplan per InMemoryTableScan — same physical exchange); pair
    // enumeration is an in-row array comprehension over that cache, so
    // no sort-merge self-join of the distinct (basket, item) set may
    // appear (the pre-round-11 plan shuffled it three times)
    assert(plan.contains("InMemoryTableScan"),
      s"per-basket sets must be cached and reused:\n$plan")
    assert("Generate explode\\(flatten\\(transform".r.findFirstIn(plan).isDefined,
      s"pairs must enumerate in-row via the array comprehension:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"pair enumeration must not self-join the fact:\n$plan")
    // and every bk exchange in the text is the SAME cached one — it
    // only ever appears directly under an InMemoryRelation print
    val uncached = plan.linesIterator.zipWithIndex.filter(_._1
      .contains("Exchange hashpartitioning(bk")).map(_._2)
      .filterNot { i =>
        plan.linesIterator.slice(math.max(0, i - 3), i)
          .exists(_.contains("InMemoryRelation"))
      }
    assert(uncached.isEmpty,
      s"found a basket exchange outside the cached build:\n$plan")
  }

  test("bucketed fact join shuffles nothing but the rollup") {
    // both sides bucketBy(8, custkey): the merge join reads aligned
    // buckets in place — the ONLY exchange in the whole plan is the
    // post-join aggregation on c_mktsegment. An unbucketed SMJ would
    // show three.
    val plan = SparkEntry.queries("rel_bucketed_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint lost:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"bucketed join must only shuffle the rollup, got $exchanges:\n$plan")
  }

  test("incremental-dedup index probes never shuffle the corpus side") {
    // the corpus index is written BUCKETED (hashes by h, bands by
    // (band,bh), shingles by doc_id): every per-batch probe join must
    // read the index partitioning in place — only the arriving batch
    // may exchange. Broadcasts + AQE off so the property is visible as
    // plan structure (at 100 TB nothing index-sized broadcasts anyway).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_cidx_plan").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.llm.Dedup.buildCorpusIndex(
      docs.where(col("doc_id") % 10 >= 2), dir, buckets = 8)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = graft.llm.Dedup.incrementalFromIndex(
        docs.where(col("doc_id") % 10 < 2), dir)
      val plan = probe.queryExecution.executedPlan
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_cidx_"))
        case _ => false
      }
      val indexScans = plan.collect { case p if isIndexScan(p) => p }
      assert(indexScans.size == 3,
        s"expected 3 bucketed index scans (hashes/bands/shingles), got ${indexScans.size}")
      // post-join shuffles of candidate-sized RESULTS are fine; what
      // must never appear is an exchange between an index scan and the
      // join that consumes it (that would mean the bucket partitioning
      // was lost and the corpus side re-shuffled)
      def scanWithoutJoinBelow(p: SparkPlan): Boolean = p match {
        case s if isIndexScan(s) => true
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case other => other.children.exists(scanWithoutJoinBelow)
      }
      val shuffledIndexScans = plan.collect {
        case e: ShuffleExchangeExec if scanWithoutJoinBelow(e.child) => e
      }
      assert(shuffledIndexScans.isEmpty,
        s"corpus index side must not exchange before its probe join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("triangle counting plans equi-joins only — no cartesian, no nested loop") {
    // the degree orientation exists precisely so the wedge self-join is
    // a bounded-fan-out equi-join; a cartesian anywhere means the
    // orientation was lost and the plan is Θ(V²) at scale
    val df = SparkEntry.queries("graph_triangles")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle plan must be equi-joins only:\n$plan")
  }

  test("bloom semi-join probes at the fact scan, before any exchange") {
    // the entire point of the operator: the probe predicate must sit
    // between the orders scan and the first exchange/join, so rows that
    // cannot join die during the scan
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("rel_bloom_semijoin")(spark, sfDir)
    // collect() does not descend into an AQE wrapper — unwrap it
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    def factScanBelow(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => f.toString.contains("orders.parquet")
      case other => other.children.exists(factScanBelow)
    }
    val probeFilters = plan.collect {
      case f: FilterExec if factScanBelow(f) &&
        f.condition.toString.contains("element_at") => f
    }
    assert(probeFilters.nonEmpty,
      s"bloom probe predicate not applied over the fact scan:\n$plan")
    // and no exchange between the fact scan and that filter
    val exchangesBelowProbe = probeFilters.head.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchangesBelowProbe.isEmpty,
      s"fact side exchanged before the bloom probe:\n$plan")
  }

  test("CMS build and RRF arms never hash-shuffle more than cell/pool rows") {
    // CMS: the only exchanges carry (group|row,bucket) cells — d·w·G
    // rows; RRF: both arms end in TakeOrdered heads, the corpus itself
    // is never exchanged
    val cms = SparkEntry.queries("sketch_cms_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!cms.contains("CartesianProduct") &&
      !cms.contains("BroadcastNestedLoopJoin"), s"CMS plan:\n$cms")
    val rrf = SparkEntry.queries("sim_rrf_hybrid")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(rrf.contains("TakeOrderedAndProject"),
      s"RRF arms must be TakeOrdered heads, not global sorts:\n$rrf")
  }

  test("funnel and attribution plan with NO joins — fold/window only") {
    // both operators exist to replace k-way self-joins; a join in
    // either plan means the one-pass formulation regressed
    for (q <- Seq("rel_funnel", "rel_attribution")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
    }
  }

  test("DSIR weight pass is scan + broadcast map, no corpus shuffle") {
    // the bucket-LM aggregation shuffles B·2 cells; the weighting pass
    // itself must stay a narrow fold under a broadcast single-row map
    val df = SparkEntry.queries("llm_dsir_weights")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"DSIR weighting must not sort-merge join the corpus:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast map:\n$plan")
  }

  test("rollup and cube expand grouping sets inside ONE aggregate pass") {
    // Spark's Expand feeds a single hash aggregate; a regression to a
    // union-of-scans (one per grouping set) would read the fact table
    // N times at 100 TB
    for (q <- Seq("rel_rollup", "rel_cube", "rel_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$q lost its Expand plan:\n$plan")
      assert(!plan.contains("Union"),
        s"$q degraded to a union of per-set scans:\n$plan")
    }
  }

  test("assortativity joins on endpoints — no pair enumeration") {
    // the moment sums must come from edge-keyed equi-joins; a
    // cartesian/BNLJ means someone enumerated vertex pairs
    val plan = SparkEntry.queries("graph_assortativity")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"assortativity enumerated pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"assortativity degraded to BNLJ:\n$plan")
  }

  test("ivf-adc broadcasts the probes over the encoded corpus") {
    // the CELL-keyed candidate join specifically must be a broadcast
    // hash join (other joins in this plan legitimately broadcast too,
    // so a bare contains("BroadcastExchange") would stay green even if
    // this one regressed to a corpus shuffle)
    val plan = SparkEntry.queries("sim_topk_ivfpq")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin \\[cell".r.findFirstIn(plan).isDefined,
      s"ivf-adc's cell-keyed candidate join lost the probe broadcast:\n$plan")
    assert(!("(SortMergeJoin|ShuffledHashJoin) \\[cell".r
        .findFirstIn(plan).isDefined),
      s"ivf-adc's cell join shuffles the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"ivf-adc degraded to a cartesian:\n$plan")
  }

  test("scd2 runs both window passes off ONE user_id exchange") {
    // lag-detect and lead/row_number close use the same (user_id) ×
    // (ts, event_id) sort — a second exchange means the shared-sort
    // reuse regressed
    val plan = SparkEntry.queries("rel_scd2")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]*hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
    val specs = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(plan).toSeq
    assert(specs.nonEmpty && specs.forall(_.group(1).startsWith("user_id")),
      s"scd2 windows must partition by user_id:\n$plan")
  }

  test("zscore outliers broadcasts the stats — no window, no sort-merge") {
    // a 5-value partition key must never become a window partition
    // (the whole table would funnel through 5 sort tasks)
    val plan = SparkEntry.queries("rel_zscore_outliers")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"stats must not be a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"group stats must join back as a broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"stats join must broadcast:\n$plan")
  }

  test("moving-sum and domain-cap windows are partitioned, never global") {
    for ((q, key) <- Seq("rel_moving_sum" -> "n_name",
        "llm_domain_cap" -> "source", "rel_next_event" -> "user_id",
        "rel_gap_islands" -> "user_id")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(plan).toSeq
      assert(specs.nonEmpty && specs.forall(_.group(1).startsWith(key)),
        s"$q window must partition by $key:\n$plan")
    }
  }

  test("window suite runs all seven analytics off ONE exchange") {
    val plan = SparkEntry.queries("rel_window_suite")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]*hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
  }

  test("native group top-k: the only exchange carries partial survivors") {
    val df = SparkEntry.queries("rel_topk_native")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopKPartial") && plan.contains("GroupTopKFinal"),
      s"native top-k plan lost its two phases:\n$plan")
  }

  test("latest-row compaction is ONE aggregate — no window, no join") {
    val plan = SparkEntry.queries("rel_dedup_latest")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"compaction must stay a plain aggregate:\n$plan")
  }

  test("scd2 point-in-time lookup plans as as-of windows, never a range join") {
    // the containment join would be a theta join (nested loop at
    // worst); the tiling argument lets it run as one as-of pass
    val plan = SparkEntry.queries("rel_scd2_lookup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lookup degraded to a product join:\n$plan")
  }

  test("distributed bloom probe also sits at the fact scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("rel_bloom_dist")(spark, sfDir)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    def factScanBelow(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => f.toString.contains("orders.parquet")
      case other => other.children.exists(factScanBelow)
    }
    val probeFilters = plan.collect {
      case f: FilterExec if factScanBelow(f) &&
        f.condition.toString.contains("element_at") => f
    }
    assert(probeFilters.nonEmpty,
      s"bloom probe predicate not applied over the fact scan:\n$plan")
    assert(probeFilters.head.collect {
      case e: ShuffleExchangeExec => e
    }.isEmpty, s"fact side exchanged before the bloom probe:\n$plan")
  }

  test("substring dedup: window expansion is narrow — no per-position sort") {
    import spark.implicits._
    // string checks, not collect: AQE nests the real operators inside
    // AdaptiveSparkPlanExec before execution
    val docs = Seq((1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val s = graft.llm.Dedup.substringSpans(docs, 8)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"substring marking must stay equi-join only:\n$s")
    // exactly the islands-merge pair (lag + running sum — two Window
    // nodes sharing ONE doc_id partitioning) — the stride-1 expansion
    // itself must be a transform over the token array, not a
    // per-position window/sort over exploded tokens
    val windows = "Window \\[".r.findAllIn(s).length
    assert(windows == 2,
      s"expected the lag+sum islands pair, got $windows:\n$s")
    val winExchanges = "hashpartitioning\\(doc_id".r.findAllIn(s).length
    assert(winExchanges <= 2, // islands partitioning + the final agg
      s"islands merge must reuse one doc_id exchange:\n$s")
    // no global sort anywhere in the marking path (a global Sort
    // prints its global flag as `], true, 0`)
    assert(!s.contains("], true, 0"),
      s"global sort in the marking path:\n$s")
  }

  test("LPA round: label argmax is one aggregate — no per-node sort window") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val s = graft.operators.Lpa.communities(edges, rounds = 2)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"LPA must stay equi-join only:\n$s")
    assert(!s.contains("Window ["),
      s"LPA argmax must be min(struct(-cnt,lbl)), not a window:\n$s")
  }

  test("landmark closeness: equi-joins only, no all-pairs product") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val s = graft.operators.Centrality.landmarkCloseness(edges, k = 2)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"closeness BFS must stay k·V equi-joins:\n$s")
  }

  test("PMI: pair expansion has no self-join; top-k is the native plan") {
    import spark.implicits._
    val docs = Seq((1L, "x y z x y z x y z x y z")).toDF("doc_id", "text")
    val plan = graft.llm.TextAnalysis.pmiTopK(docs, 2, 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"PMI pair expansion must be array transform, not a join:\n$plan")
    assert(plan.contains("GroupTopK"),
      s"PMI top-k must ride the native partial-survivor plan:\n$plan")
  }
}
