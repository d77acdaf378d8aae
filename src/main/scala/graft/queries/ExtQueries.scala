package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft
import graft.llm.{Dedup, Similarity, TextAnalysis}
import graft.streaming.Events

/** Relational, streaming, and LLM-pipeline extension operators, each
  * with a DuckDB oracle. These read the raw parquet directly (they are
  * the "modern pipeline" surface; the WOQL engine is the parity
  * surface). */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame
  private def t(spark: SparkSession, dir: String, name: String) =
    Graft.table(spark, dir, name)

  /** recall@5 of an ANN arm against exact search, per query vector —
    * the index-quality measurement a pipeline runs before trusting a
    * tier. Shared by every `sim_recall_*` entry (one harness, one
    * drift surface); each oracle wraps the two arms' SQLs as
    * subqueries. */
  private def recallAt5(emb: DataFrame,
                        ann: DataFrame => DataFrame): DataFrame = {
    val brute = graft.llm.Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select(col("q"), col("cand"))
    val arm = ann(emb).select(col("q"), col("cand"))
    val hits = brute.join(arm, Seq("q", "cand"), "left_semi")
      .groupBy(col("q")).agg(count(lit(1)).as("hits"))
    brute.select(col("q")).distinct()
      .join(hits, Seq("q"), "left")
      .select(col("q"), coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / 5.0, 6).as("recall"))
  }

  /** Fingerprint-keyed landed sink dir with write-then-ATOMIC-rename:
    * the key embeds the source file's (path, size, mtime) so
    * regenerated testdata invalidates, and two concurrent sessions on
    * the same fingerprint never expose a half-written dir — the
    * loser's rename fails onto the winner's completed copy and is
    * discarded. Shared by every sink round-trip entry and the
    * landed-resource `get` entries. */
  private[queries] def landedRoundTrip(prefix: String, srcFile: String)
                                      (write: String => Unit): String = {
    val dir = sys.env.getOrElse("GRAFT_EAV_CACHE", "/root/repo/target/eav") +
      "/" + prefix + "_" + graft.util.Fingerprint.of(srcFile)
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      val tmp = dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
      write(tmp)
      if (!new java.io.File(tmp).renameTo(new java.io.File(dir))) {
        // lost the race (or stale dir without _SUCCESS): keep the
        // winner's copy, drop ours
        if (!new java.io.File(dir + "/_SUCCESS").exists()) {
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
          val _ = new java.io.File(tmp).renameTo(new java.io.File(dir))
        }
        if (new java.io.File(tmp).exists())
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }
    dir
  }

  /** Typed EAV fixture over `nation` for the N-Triples/N-Quads
    * round-trips: one predicate per term kind, with an escape-stress
    * string (quote, newline, tab, backslash, non-ASCII). */
  private def ntFixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val n = t(s, d, "nation").select(
      col("n_nationkey").cast(LongType).as("k"),
      col("n_name").as("nm"), col("n_regionkey").cast(LongType).as("rk"))
    val subj = concat(lit("tpch:nation/"), col("k").cast(StringType))
    val sNull = lit(null).cast(StringType)
    val nl = lit(null)
    def eav(p: String, kind: String, iri: Column, typ: Column, str: Column,
            dbl: Column, lng: Column, bool: Column, lang: Column) =
      n.select(lit("instance").as("g"), subj.as("s"), lit(p).as("p"),
        lit(kind).as("o_kind"), iri.cast(StringType).as("o_iri"),
        typ.cast(StringType).as("o_typ"), str.cast(StringType).as("o_str"),
        dbl.cast(DoubleType).as("o_dbl"), lng.cast(LongType).as("o_lng"),
        lit(null).cast(TimestampType).as("o_ts"),
        bool.cast(BooleanType).as("o_bool"),
        lang.cast(StringType).as("o_lang"),
        lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
    eav("ex:name", "l", sNull, lit("xsd:string"),
        concat(col("nm"), lit("\"\n\t\\é")), nl, nl, nl, sNull)
      .unionByName(eav("ex:key", "l", sNull, lit("xsd:integer"), sNull,
        nl, col("k"), nl, sNull))
      .unionByName(eav("ex:even", "l", sNull, lit("xsd:boolean"), sNull,
        nl, nl, col("k") % 2 === 0, sNull))
      .unionByName(eav("ex:frac", "l", sNull, lit("xsd:double"), sNull,
        col("rk") + 0.25, nl, nl, sNull))
      .unionByName(eav("ex:region", "i",
        concat(lit("tpch:region/"), col("rk").cast(StringType)), sNull,
        sNull, nl, nl, nl, sNull))
      .unionByName(eav("ex:tag", "l", sNull, lit("xsd:string"), col("nm"),
        nl, nl, nl, lit("en")))
  }

  /** Row-level projection of re-read EAV rows: every typed column
    * rendered back to a comparable string. */
  private def ntReadBack(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    df.select(col("g"), col("s"), col("p"), col("o_kind"),
      coalesce(col("o_typ"), lit("iri")).as("o_typ"),
      when(col("o_kind") === "i", col("o_iri"))
        .when(col("o_typ") === "xsd:integer", col("o_lng").cast(StringType))
        .when(col("o_typ") === "xsd:double", col("o_dbl").cast(StringType))
        .when(col("o_typ") === "xsd:boolean", col("o_bool").cast(StringType))
        .otherwise(col("o_str")).as("v"),
      col("o_lang"))
  }

  val queries: Map[String, Q] = Map(

    // --- relational core: agg / window / broadcast join pushdown ---
    "rel_q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"))),

    "rel_topk_window" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= 3)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rk"))
    }),

    "rel_broadcast_join" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer"); val n = t(s, d, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .where(n("n_regionkey") === 1 && o("o_totalprice") > 4000.0)
        .select(col("o_orderkey"), col("c_name"), col("n_name"))
    }),

    // salted equi-join (operators.SkewJoin): exactly the plain join,
    // hot keys spread over saltFactor reducers
    "rel_skew_join" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val small = t(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus"))
      graft.operators.SkewJoin.salted(big, small, "k", saltFactor = 8)
        .groupBy(col("o_orderstatus").as("st"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    "rel_events_window" -> ((s, d) => t(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))),

    "rel_events_sliding" -> ((s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))),

    "ext_json" -> ((s, d) => t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // prefix-context expand/contract round-trip (reference /api/prefixes)
    // as pure codegen'd column rewrites over the whole table
    "ext_prefix_roundtrip" -> ((s, d) => {
      val ctx = graft.docs.Prefixes.Default
      t(s, d, "nation")
        .select(concat(lit("tpch:nation/"), col("n_nationkey")).as("compact"))
        .withColumn("full", graft.docs.Prefixes.expandCol(ctx, col("compact")))
        .withColumn("back", graft.docs.Prefixes.contractCol(ctx, col("full")))
    }),

    // --- streaming (real Structured Streaming execution) ---
    "stream_window_counts" -> ((s, d) => Events.streamingTumblingCounts(s, d)),
    "stream_append_counts" -> ((s, d) => Events.streamingAppendCounts(s, d)),
    "stream_session_counts" -> ((s, d) => Events.streamingSessionCounts(s, d)),
    "stream_dedup_counts" -> ((s, d) => Events.streamingDedup(s, d)),
    "stream_user_stats" -> ((s, d) => Events.streamingUserStats(s, d)),
    // CMS cells as a running streaming aggregate (bounded state: d·w
    // counters), probed batch-side after the replay — bit-equal to the
    // batch sketch by CMS linearity
    "stream_cms_counts" -> ((s, d) => Events.streamingCms(s, d)),
    // quantile histogram as a running streaming aggregate (state ∝
    // groups × grid, never rows) — batch-equal by linearity
    "stream_grid_quantiles" -> ((s, d) => Events.streamingGridQuantiles(s, d)),
    // stream-stream inner join, watermarks both sides + range condition
    // (bounded state on unbounded streams); oracle = the batch range join
    "stream_stream_join" -> ((s, d) => Events.streamStreamJoin(s, d)),

    // backward as-of join: each purchase picks the latest click at or
    // before it per user — one shuffle + one window sort (AsofJoin)
    "rel_asof_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("c_value"))
        .withColumnRenamed("ts", "c_ts")
      graft.operators.AsofJoin.backward(purchases, clicks, Seq("user_id"),
        "ts", "c_ts", Seq("c_ts", "c_value"))
    }),
    // as-of with a MATCH TOLERANCE (pandas merge_asof's `tolerance`):
    // the nearest backward match still wins, but is nulled out when
    // older than 1 hour — same single-exchange as-of plan plus a
    // codegen'd gap compare, no extra shuffle
    "rel_asof_tolerance" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("c_value"))
        .withColumnRenamed("ts", "c_ts")
      val j = graft.operators.AsofJoin.backward(purchases, clicks,
        Seq("user_id"), "ts", "c_ts", Seq("c_ts", "c_value"))
      val keep = col("c_ts").isNotNull &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
      j.select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(keep, col("c_ts")).as("c_ts"),
        when(keep, col("c_value")).as("c_value"))
    }),
    // identical query through the NATIVE as-of operator (custom
    // LogicalPlan/Strategy/SparkPlan, graft.plans.AsofJoinPlan) — same
    // oracle, different physical plan: per-side shuffles + streaming
    // merge instead of union + window
    "rel_asof_native" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("c_value"))
        .withColumnRenamed("ts", "c_ts")
      graft.plans.NativeAsof.backward(purchases, clicks, Seq("user_id"),
        "ts", "c_ts", Seq("c_ts", "c_value"))
    }),
    // forward as-of: the NEXT click at-or-after each purchase — the
    // mirrored union+window plan (first(ignoreNulls), following frame)
    "rel_asof_fwd" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("c_value"))
        .withColumnRenamed("ts", "c_ts")
      graft.operators.AsofJoin.forward(purchases, clicks, Seq("user_id"),
        "ts", "c_ts", Seq("c_ts", "c_value"))
    }),

    // keyless interval containment via the binned range join
    // (operators.RangeJoin): clicks counted into 30-minute windows
    // anchored at sampled purchases — a nested-loop plan rewritten as
    // one equi-join on 15-minute time bins
    "rel_range_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.where(col("event_type") === "click")
        .select(col("ts"), col("value"))
      val wins = e.where(col("event_type") === "purchase" &&
          pmod(col("event_id"), lit(13L)) === 0)
        .select(col("event_id").as("w_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("w_start"),
          col("ts").as("w_end"))
      graft.operators.RangeJoin
        .binned(clicks, "ts", wins, "w_start", "w_end", 15L * 60 * 1000000)
        .groupBy(col("w_id"))
        .agg(count(lit(1)).as("n_clicks"),
          // exact decimal sum, then one double render rounded to 6 —
          // DECIMAL(28,6) hashes differently across the driver's two
          // engines even when values match (red in r5+r6); a rounded
          // double is representation-stable on both sides.
          // Magnitude bound (r7 ADVICE): the two engines' round(x, 6)
          // provably agree while |sum|·10⁶ stays inside double's
          // exact-integer range, i.e. |sum| < 2⁵³/10⁶ ≈ 9·10⁹. Here
          // sum_value ≤ Σ|value| per ≤30-min window — O(10³) at sf1 and
          // O(10⁵) even at a 10⁴× scale-up, four orders inside the
          // bound; re-verified strict at sf0.1 this round (BASELINE
          // "events family re-verified"). The exact DECIMAL sum stays
          // the source of truth; only the final render is double.
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6)
            .as("sum_value"))
    }),
    "stream_enrich_counts" -> ((s, d) => Events.streamingEnrichedCounts(s, d)),

    // STREAMING SCD2 point-in-time lookup: stream-static containment
    // join against the versioned dim — append mode, zero state; same
    // oracle as the batch as-of lookup
    "stream_scd2_lookup" -> ((s, d) => Events.streamingScd2Lookup(s, d)),

    // --- dedup family ---
    "dedup_exact" -> ((s, d) => Dedup.exactGroups(t(s, d, "documents"))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashNearDups(t(s, d, "documents"), 0.5)),
    "dedup_clusters" -> ((s, d) => Dedup.nearDupClusters(t(s, d, "documents"), 0.5)),

    // asymmetric containment (|∩|/min) over the same banded candidates
    // — catches sub-document duplication Jaccard dilutes away
    "dedup_containment" -> ((s, d) =>
      Dedup.minhashContainment(t(s, d, "documents"), 0.7)),
    // EXACT-recall containment under the rare-shingle (df ≤ 24)
    // posting contract: inverted-index candidates + exact set verify,
    // integer micro-ratio — the dedup_ngram_prefix analogue for the
    // asymmetric measure (banded minhash variant above trades recall)
    "dedup_containment_exact" -> ((s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"),
        thresholdMicro = 600000L, maxDf = 24L)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(t(s, d, "documents"))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), 0.5)),
    // exact-recall prefix-filter join — same answer as the brute pair
    // scan (same oracle SQL), but candidates come from an equi-join on
    // rare-token prefixes: the 100 TB shape for EXACT jaccard dedup
    "dedup_ngram_prefix" -> ((s, d) => Dedup.ngramJaccardPrefix(t(s, d, "documents"), 0.5)),
    "dedup_embedding_nn" -> ((s, d) => Dedup.embeddingMutualNN(t(s, d, "embeddings"))),
    // substring-level exact dedup (Lee et al. shape): duplicated
    // fixed-window fraction per document; shuffle ∝ windows, not pairs
    "dedup_spans" -> ((s, d) => Dedup.dupSpans(t(s, d, "documents"))),
    // formatting-insensitive exact dedup: canonicalize then hash-group
    "dedup_canonical" -> ((s, d) => Dedup.canonicalGroups(t(s, d, "documents"))),
    // new-batch-vs-corpus dedup (nightly ingest shape): docs with
    // doc_id % 10 < 2 play the incoming batch, the rest the corpus
    "dedup_incremental" -> ((s, d) =>
      Dedup.incremental(t(s, d, "documents"), col("doc_id") % 10 < 2)),
    // same classification through the streaming ingest path: arrivals
    // replayed as 2 micro-batches, classified per batch vs the static
    // corpus in foreachBatch (batch-split independent by construction)
    "stream_incr_dedup" -> ((s, d) =>
      graft.streaming.DedupIngest.streamingIncrementalDedup(s, d)),
    // streaming substring-dedup probe: per micro-batch, arrival spans
    // already present in the corpus window-hash artifact (no
    // batch-internal pass → micro-batch-split independent)
    "stream_substring_spans" -> ((s, d) =>
      graft.streaming.DedupIngest.streamingSubstrSpans(s, d)),
    // dim passed explicitly (testdata embeddings are 64-dim): embDim's
    // first-row read is a hidden driver action — keep oracle/bench plans
    // pure (no job boundary inside what looks like an expression)
    "dedup_embedding_lsh" -> ((s, d) => Dedup.embeddingLshDups(t(s, d, "embeddings"), dim = 64)),
    // dedup-tier EVALUATION (same shape as sim_recall_ivf): pair
    // recall of the bucketed SRP-LSH mutual-NN detector against the
    // brute mutual-NN baseline — ONE summary row; the oracle wraps
    // the two existing SQLs so the eval can't drift from the arms
    "dedup_recall_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val brute = Dedup.embeddingMutualNN(emb).select(col("da"), col("db"))
      val lsh = Dedup.embeddingLshDups(emb, dim = 64)
        .select(col("da"), col("db"))
      brute.agg(count(lit(1)).as("n_brute"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(brute.join(lsh, Seq("da", "db"), "left_semi")
          .agg(count(lit(1)).as("n_hit")))
        .select(col("n_brute"), col("n_lsh"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_brute"), 6).as("recall"))
    }),

    // SemDeDup-style semantic dedup: k-means blocking, exact cosine
    // within clusters only, lower-id winner at tau=0.40 (the synthetic
    // embeddings are near-orthogonal — the threshold sits inside the
    // observed within-cluster similarity range so both branches of the
    // kept flag are exercised)
    "dedup_semantic" -> ((s, d) =>
      Dedup.semantic(t(s, d, "embeddings"), k = 8, iters = 3, dim = 64,
        tau = 0.40)),

    // --- similarity search ---
    "sim_topk_brute" -> ((s, d) =>
      Similarity.bruteTopK(t(s, d, "embeddings"), col("vec_id") < 10, 5)),
    "sim_topk_ivf" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), col("vec_id") < 10, 5, nprobe = 2)),
    "sim_topk_lsh" -> ((s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), col("vec_id") < 10, 5, dim = 64)),
    // RANGE search: every bucket-mate with cosine ≥ 0.25 — a pure
    // candidate-join + filter, no per-query window at all
    "sim_range_lsh" -> ((s, d) =>
      Similarity.lshRange(t(s, d, "embeddings"), col("vec_id") < 10, 0.25,
        dim = 64)),
    "sim_topk_sq8" -> ((s, d) =>
      Similarity.sq8TopK(t(s, d, "embeddings"), col("vec_id") < 10, 5)),
    // IVF over a TRAINED codebook (kmeansSq8 cells, no label crutch) —
    // the unlabeled-corpus ANN path; probes + rerank on sq8 codes
    "sim_topk_ivf_trained" -> ((s, d) =>
      Similarity.ivfTrainedTopK(t(s, d, "embeddings"), col("vec_id") < 10, 5,
        nprobe = 2, cells = 8, iters = 3, dim = 64)),

    // IVF artifact UPSERT: new vectors (every 10th id) assigned
    // against the codebook trained on the REST of the corpus — no
    // refit; per-cluster centroid drift (‖batch mean − centroid‖) +
    // refit_hint is the statistic that says when to retrain
    "sim_ivf_upsert" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Clustering.upsertAssign(
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0),
        k = 8, iters = 3, dim = 64)
    }),

    // drift-triggered PARTIAL refit: the consumer of upsert's
    // refit_hint — cells past the drift threshold get one restricted
    // Lloyd round (centroid ← exact-integer member mean, members
    // reassign among drifted cells only); frozen cells untouched.
    // Threshold 100 drifts a proper subset of the 8 cells at both
    // sf0.001 and sf0.01, so both arms of the split are exercised
    "sim_ivf_refit" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Clustering.refitDrifted(
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0),
        k = 8, iters = 3, dim = 64, driftThreshold = 100.0)
    }),

    // index-quality EVALUATION as a first-class query: recall@5 of the
    // IVF arm against exact search, per query vector — the measurement
    // a pipeline runs before trusting an ANN tier. Both arms are the
    // same operators the standalone entries run; the oracle wraps
    // their SQLs as subqueries (no second definition to drift).
    "sim_recall_ivf" -> ((s, d) =>
      recallAt5(t(s, d, "embeddings"),
        emb => Similarity.ivfTopK(emb, col("vec_id") < 10, 5, nprobe = 2))),

    // recall@5 of the IVF-ADC composite against exact search — the
    // quantization-loss measurement for the PQ-coded tier (same
    // derived-oracle scheme as sim_recall_ivf)
    "sim_recall_ivfpq" -> ((s, d) =>
      recallAt5(t(s, d, "embeddings"),
        emb => Similarity.ivfPqTopK(emb, col("vec_id") < 10, 5,
          nprobe = 2, cells = 8, ivfIters = 3, m = 8, kSub = 16,
          pqIters = 2, dim = 64))),

    // recall on the CLUSTERED fixture (Similarity.clusteredFixture):
    // the shared embeddings table is near-uniform — VQ's worst case —
    // so these entries measure the trained tiers where structure
    // exists; ClusteringSpec pins recall@5 ≥ 0.8 on both
    "sim_recall_ivft_clustered" -> ((s, d) =>
      recallAt5(Similarity.clusteredFixture(s),
        emb => Similarity.ivfTrainedTopK(emb, col("vec_id") < 10, 5,
          nprobe = 2, cells = 8, iters = 3, dim = 64))),
    "sim_recall_ivfpq_clustered" -> ((s, d) =>
      recallAt5(Similarity.clusteredFixture(s),
        emb => Similarity.ivfPqTopK(emb, col("vec_id") < 10, 5,
          nprobe = 2, cells = 8, ivfIters = 3, m = 8, kSub = 16,
          pqIters = 2, dim = 64))),

    // --- end-to-end corpus cleaning (quality gate → exact dedup →
    //     LSH near-dup removal), one composed plan ---
    "llm_pipeline_clean" -> ((s, d) =>
      graft.llm.Pipeline.cleanCorpus(t(s, d, "documents"))),

    // pipeline v2: clean → holdout split → per-split token accounting
    "llm_pipeline_v2" -> ((s, d) =>
      graft.llm.Pipeline.cleanSplitStats(t(s, d, "documents"))),

    // concat-and-chunk sequence packing, per-lang partition (Packing)
    "llm_pack_chunks" -> ((s, d) =>
      graft.llm.Packing.packChunks(t(s, d, "documents"), 512)),

    // --- multimodal plumbing: binary payloads + per-partition decode
    //     (stub codec is md5-derived → the oracle replays it exactly) ---
    "mm_decode_meta" -> ((s, d) =>
      graft.llm.Multimodal.decodeMeta(
        graft.llm.Multimodal.withPayload(t(s, d, "documents")))),
    // REAL codec path: executors encode one PNG per doc (dimensions
    // closed-form in doc_id), ImageIoCodec parses the actual byte
    // stream back — the oracle predicts width/height without ever
    // touching the bytes. n_bytes is compression-dependent, excluded.
    "mm_decode_png" -> ((s, d) =>
      graft.llm.Multimodal.decodeMeta(
          graft.llm.Multimodal.withPngPayload(t(s, d, "documents")))
        .select(col("doc_id"), col("width"), col("height"), col("format"))),
    // REAL decode → RESIZE path: ImageIO parses each PNG, an exact
    // integer nearest-neighbor resample builds an 8×6 thumbnail, and
    // the order-weighted pixel checksum verifies every resampled pixel
    // against the generator's closed-form raster — decode + transform
    // as one per-partition batch op over the binary column
    "mm_resize_thumb" -> ((s, d) =>
      graft.llm.Multimodal.resizeThumb(
        graft.llm.Multimodal.withPngPayload(t(s, d, "documents")), 8, 6)),

    // REAL audio codec path: executors hand-roll one PCM WAV per doc
    // (rate/channels/frames closed-form in doc_id), WavCodec parses
    // the actual RIFF stream back via javax.sound.sampled — width
    // carries frame count, height the sample rate; n_bytes is the
    // exact 44 + frames*channels*2 (PCM is uncompressed, so unlike
    // the PNG entry the byte size IS oracle-predictable)
    "mm_decode_wav" -> ((s, d) =>
      graft.llm.Multimodal.decodeMeta(
        graft.llm.Multimodal.withWavPayload(t(s, d, "documents")))),

    // REAL video-container path: executors write one minimal
    // ISO-BMFF/MP4 box structure per doc (every field closed-form in
    // doc_id, 272 bytes exactly), Mp4Codec walks the boxes back —
    // presentation clock from mvhd, track dims from tkhd (16.16
    // fixed), media clock from mdhd. Frame decode stays stubbed;
    // container metadata no longer is.
    "mm_decode_mp4" -> ((s, d) =>
      graft.llm.Multimodal.mp4Meta(
        graft.llm.Multimodal.withMp4Payload(t(s, d, "documents")))),

    // AVI/MJPEG: executors write one RIFF AVI container per doc with
    // REAL JPEG frames inside; the decode side walks the RIFF boxes
    // AND ImageIO-decodes every frame — frame_w/h come from the JPEG
    // SOF header, not the container, so a faked frame decode diverges
    "mm_decode_avi" -> ((s, d) =>
      graft.llm.Multimodal.aviMeta(
        graft.llm.Multimodal.withAviPayload(t(s, d, "documents")))),

    // ANIMATED GIF: executors HAND-ROLL one multi-frame GIF89a byte
    // stream per doc (frame count, dims, per-frame delay, solid frame
    // colors all closed-form in doc_id — every byte a pure function of
    // doc_id, no imageio WRITER discretion left after two rounds of
    // session-nondeterministic encodes on the driver); the decode side
    // is unchanged and real: javax.imageio's gif reader reads EVERY
    // frame back plus the GraphicControlExtension delay and folds
    // every pixel
    "mm_decode_gif_anim" -> ((s, d) =>
      graft.llm.Multimodal.gifAnimMeta(
        graft.llm.Multimodal.withGifAnimPayload(t(s, d, "documents")))),

    // MULTI-PAGE TIFF (the scanned-document container): executors
    // HAND-ROLL one baseline multi-page TIFF per doc (chained IFDs,
    // uncompressed chunky RGB strips — every byte a pure function of
    // doc_id, same no-writer-discretion contract as the GIF entry);
    // the decode side is unchanged and real: javax.imageio's tiff
    // reader (JDK 9+) reads every page back and folds every pixel
    "mm_decode_tiff" -> ((s, d) =>
      graft.llm.Multimodal.tiffMeta(
        graft.llm.Multimodal.withTiffPayload(t(s, d, "documents")))),

    // second video container: executors write one minimal EBML
    // (WebM/Matroska) structure per doc (61 bytes, closed-form),
    // MkvCodec walks the vint-framed elements back — Info clocks +
    // first video TrackEntry dims + DocType
    "mm_decode_mkv" -> ((s, d) =>
      graft.llm.Multimodal.mkvMeta(
        graft.llm.Multimodal.withMkvPayload(t(s, d, "documents")))),

    "mm_frames" -> ((s, d) =>
      graft.llm.Multimodal.sampleFrames(
        graft.llm.Multimodal.withPayload(t(s, d, "documents")), 64)),
    "mm_features" -> ((s, d) =>
      graft.llm.Multimodal.extractFeatures(
        graft.llm.Multimodal.withPayload(t(s, d, "documents")))),

    // --- decontamination / sampling / redaction ---
    // benchmark set = every 50th document; the benchmark shingle set is
    // broadcast, so corpus rows never shuffle (the 100 TB decontam shape)
    "llm_contamination" -> ((s, d) =>
      graft.llm.Contamination.ngramOverlap(
        t(s, d, "documents"), col("doc_id") % 50 === 0)),

    // detect → DROP: the decontamination pass completed — per-language
    // kept/dropped counts at the 0.2 overlap threshold (rounded ratio
    // compared, so both engines classify identical doubles)
    "llm_decontaminate" -> ((s, d) => {
      val ov = graft.llm.Contamination.ngramOverlap(
        t(s, d, "documents"), col("doc_id") % 50 === 0)
      t(s, d, "documents").join(ov, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(sum(when(col("ratio") < 0.2, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("ratio") >= 0.2, 1L).otherwise(0L)).as("n_dropped"))
    }),

    // STREAMING PCA projection: directions fitted once on the static
    // corpus, applied per micro-batch as a stateless two-dot-product
    // projection (serving-side whitening); row-identical to the batch
    // path, so it shares llm_pca_power's oracle
    "stream_pca_project" -> ((s, d) => Events.streamingPcaProject(s, d)),
    // streaming IVF drift monitor: frozen book trained on the static
    // 90%; arriving vectors assign per micro-batch and fold into a
    // k·(dim+1)-cell running aggregate; drift + refit_hint read from
    // the final state — the stream twin of sim_ivf_upsert's statistic
    "stream_ivf_drift" -> ((s, d) => Events.streamingIvfDrift(s, d)),

    // Zipf's-law fit over the top-1000 term types: OLS slope/intercept
    // of ln(freq) on ln(rank) — distribution-level corpus quality
    // (natural text ≈ −1; template-heavy corpora flatten the head)
    "text_zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfFit(t(s, d, "documents"), topN = 1000)),

    // deterministic nested stratified sample: pure hash-threshold
    // filter, zero exchanges; rates keyed by the lang stratum
    "llm_sample_stratified" -> ((s, d) =>
      graft.llm.Sampling.stratifiedHash(t(s, d, "documents"), col("lang"),
        Map("en" -> 0.1, "zh" -> 0.3), defaultRate = 0.5)
        .select(col("doc_id"), col("lang"))),

    // A-ES weighted sample (length-weighted): distributed top-k by
    // deterministic exponential keys — TakeOrderedAndProject, no shuffle
    "llm_sample_weighted" -> ((s, d) =>
      graft.llm.Sampling.weightedTopK(t(s, d, "documents"),
        col("n_chars"), 100)),

    // hash-sharded export manifest: narrow map + one aggregate
    "llm_shard_export" -> ((s, d) =>
      graft.llm.Sampling.shardManifest(t(s, d, "documents"), 8)),

    // PII planted deterministically from doc_id (the synthetic corpus
    // carries none), then scrubbed; oracle replays the same construction
    "text_pii_scrub" -> ((s, d) => {
      val planted = concat(
        lit("u"), col("doc_id").cast("string"), lit("@ex.io 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 "),
        col("text"))
      TextAnalysis.piiScrub(t(s, d, "documents"), planted)
    }),

    // --- text analysis ---
    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(t(s, d, "documents"))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(t(s, d, "documents"))),

    // Flesch reading-ease proxy (vowel-run syllables): the classic
    // readability quality signal — exact counts, one shared formula
    "text_readability" -> ((s, d) =>
      TextAnalysis.readability(t(s, d, "documents"))),
    // C4/Gopher rule bundle: keep decided from the ROUNDED statistics
    // so both engines agree on borderline docs
    "text_c4_filters" -> ((s, d) =>
      TextAnalysis.c4Filters(t(s, d, "documents"))),
    // the same rule bundle applied per streaming micro-batch
    // (stateless ingest-gate shape) — row-identical to the batch op
    "stream_c4_filters" -> ((s, d) => Events.streamingC4(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.langId(t(s, d, "documents"))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(t(s, d, "documents"))),
    "text_repetition" -> ((s, d) => TextAnalysis.repetition(t(s, d, "documents"))),

    "text_len_quantiles" -> ((s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        count(lit(1)).as("n"))),

    // --- batch sessionization: offline twin of stream_session_counts
    //     (same 30-min gap rule), one shuffle on the session key ---
    "rel_sessionize" -> ((s, d) =>
      graft.operators.Sessionize.sessions(
        t(s, d, "events").select(col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", "event_id", 30L * 60 * 1000000)),

    // interval×interval overlap join (RangeJoin.overlapBinned):
    // click-activity intervals [ts, ts+value·s] × error intervals,
    // matched once per pair via bin ownership — no nested loop, no
    // dedup shuffle
    "rel_interval_overlap" -> ((s, d) => {
      val e = t(s, d, "events")
      def iv(typ: String, p: String) = e.where(col("event_type") === typ)
        .select(col("event_id").as(p + "id"),
          unix_micros(col("ts")).as(p + "s"),
          (unix_micros(col("ts")) + floor(col("value") * 1000000)).as(p + "e"))
      graft.operators.RangeJoin.overlapBinned(
          iv("click", "a_"), "a_s", "a_e",
          iv("error", "b_"), "b_s", "b_e", 10L * 60 * 1000000)
        .groupBy(col("a_id").as("event_id"))
        .agg(count(lit(1)).as("n_overlap"))
    }),

    // deterministic holdout split: pure narrow map, stable under
    // corpus growth (Sampling.trainValTest)
    "llm_split" -> ((s, d) =>
      graft.llm.Sampling.trainValTest(t(s, d, "documents"))),

    // leakage-free split: whole near-dup CLUSTERS assigned to a split
    // (cluster-id hash), so no near-duplicate pair crosses train/test
    "llm_split_leakfree" -> ((s, d) =>
      graft.llm.Sampling.leakFreeSplit(t(s, d, "documents"), 0.5)),

    // domain mixing to per-source token caps: supply aggregate →
    // broadcast rates → salted hash-threshold (Sampling.mixToBudget)
    "llm_mix_budget" -> ((s, d) =>
      graft.llm.Sampling.mixToBudget(t(s, d, "documents"),
        Map("src0" -> 6000L, "src1" -> 1500L), defaultCap = 3000L)),

    // deterministic Lloyd's k-means over sq8 codes (IVF codebook
    // trainer): 3 rounds, k=8 — every step exact/order-independent,
    // replayed round-for-round by the oracle's unrolled CTEs
    "emb_kmeans" -> ((s, d) =>
      graft.llm.Clustering.kmeansSq8(t(s, d, "embeddings"), k = 8, iters = 3, dim = 64)
        .select(col("vec_id"), col("cluster"))),

    // cluster-diversity sample: 3 exemplars nearest each k-means
    // centroid — the curation pick over semantic regions
    "llm_sample_diverse" -> ((s, d) =>
      graft.llm.Clustering.diverseTopN(t(s, d, "embeddings"),
        k = 8, iters = 3, dim = 64, n = 3)),

    // URL canonicalization dedup: messy URL variants (host case,
    // default port, flipped query order, utm_* params, fragments —
    // every field closed-form in doc_id) normalize to one canonical
    // form per doc_id%40 bucket; the oracle restates the canonical
    // closed form, so any normalization miss splits a group
    "llm_url_canon" -> ((s, d) =>
      // the synthetic URL construction lives beside the canonicalizer
      // (TextAnalysis.syntheticUrl) so the streaming twin canonicalizes
      // the IDENTICAL input
      graft.llm.TextAnalysis.urlDedup(t(s, d, "documents"),
        graft.llm.TextAnalysis.syntheticUrl(col("doc_id")))),

    // STREAMING URL-canonicalization dedup twin: same canonicalization
    // per micro-batch, running (count, min) aggregate — final table
    // micro-batch-independent, shares llm_url_canon's oracle
    "stream_url_canon" -> ((s, d) =>
      graft.streaming.Events.streamingUrlCanon(s, d)),

    // greedy k-center coreset (Gonzalez farthest-point): the
    // diversity-maximal seed sample — exact integer squared-L2 over
    // sq8 codes, ties to lowest vec_id, k-bounded driver artifact
    "llm_coreset_kcenter" -> ((s, d) =>
      graft.llm.Sampling.kCenterCoreset(t(s, d, "embeddings"),
        k = 4, dim = 64)),

    // KMV distinct sketch: per-lang distinct-text estimate from the 32
    // smallest md5 hashes — mergeable, deterministic, one narrow scan
    "sketch_kmv_distinct" -> ((s, d) =>
      graft.llm.Sketches.kmvDistinct(t(s, d, "documents"),
        col("lang"), col("text"), 32)
        .withColumnRenamed("g", "lang")),

    // the distributed rollup shape: per-lang sketches merged +
    // re-truncated — bit-equal to sketching the table at once
    "sketch_kmv_union" -> ((s, d) =>
      graft.llm.Sketches.kmvUnionEstimate(t(s, d, "documents"),
        col("lang"), col("text"), 32)),

    // per-lang vocabulary by document frequency (tokenizer-training
    // input): array_distinct explode → count → top-20 window
    "text_vocab_topk" -> ((s, d) =>
      graft.llm.TextAnalysis.vocabTopK(t(s, d, "documents"), 20)),

    // BPE merge-pair statistic: adjacent-pair counts, global top-30 as
    // TakeOrderedAndProject (never a one-partition window)
    "text_bpe_pairs" -> ((s, d) =>
      graft.llm.TextAnalysis.bpePairs(t(s, d, "documents"), 30)),

    // full BPE merge-LOOP training: 12 rounds of pair-count -> argmax
    // -> merge over the (word, count) vocabulary table; corpus touched
    // once, per-round cost ∝ vocab types (oracle unrolls all 12 rounds
    // as CTE chains, replaying each greedy merge with an unnest+window
    // formulation — gaps-and-islands over candidate positions)
    "text_bpe_train" -> ((s, d) =>
      graft.llm.TextAnalysis.bpeTrain(t(s, d, "documents"), 12)),

    // divergence probe for text_bpe_train: top-3 argmax candidates of
    // every round, so an oracle mismatch localizes to the FIRST round
    // whose pair counts disagree instead of cascading silently
    "text_bpe_train_rounds" -> ((s, d) =>
      graft.llm.TextAnalysis.bpeTrainRounds(t(s, d, "documents"), 12)),

    // round-1 isolation probes (VERDICT r12 #1): one SQL construct per
    // entry — probe_pairs exercises ONLY pair counting, probe_merge
    // ONLY the greedy-merge replay; whichever goes red first names
    // the diverging construct
    "text_bpe_probe_pairs" -> ((s, d) =>
      graft.llm.TextAnalysis.bpeProbePairs(t(s, d, "documents"))),
    "text_bpe_probe_merge" -> ((s, d) =>
      graft.llm.TextAnalysis.bpeProbeVocab(t(s, d, "documents"))),

    // BPE ENCODE with the trained merges (train→apply, the complete
    // tokenizer loop): merges fold over the word-TYPE table (rows ∝
    // vocabulary), per-doc counts join the encoded types — the corpus
    // is tokenized by join, never re-folded
    "text_bpe_apply" -> ((s, d) =>
      graft.llm.TextAnalysis.bpeApply(t(s, d, "documents"), 12)),

    // byte-level BPE trainer (GPT-2 family): frequency-argmax merges
    // over the hex-pair UTF-8 byte alphabet, word-initial space byte
    // "20" as the Ġ marker — no OOV characters by construction, no
    // end-of-word symbol needed (10 rounds, CTE-unrolled oracle)
    "text_bytebpe_train" -> ((s, d) =>
      graft.llm.TextAnalysis.byteBpeTrain(t(s, d, "documents"), 10)),

    // byte-level ENCODE with the trained merges (train→apply): merges
    // fold over word TYPES, per-doc counts join the encoded types
    "text_bytebpe_apply" -> ((s, d) =>
      graft.llm.TextAnalysis.byteBpeApply(t(s, d, "documents"), 10)),

    // WordPiece trainer (Schuster & Nakajima 2012 — the BERT-family
    // tokenizer, completing the BPE/unigram/WordPiece trio): 8 rounds
    // of likelihood-argmax (exact integer floor(freq·1e12/(n_l·n_r)))
    // → merge with ##-continuation stripping; same word-TYPE
    // economics as BPE (corpus touched once)
    "text_wordpiece_train" -> ((s, d) =>
      graft.llm.TextAnalysis.wordpieceTrain(t(s, d, "documents"), 8)),

    // WordPiece ENCODE with the trained merges (train→apply): merges
    // fold over the word-TYPE table, per-doc counts join the encoded
    // types — the bpeApply twin under ## continuation symbols
    "text_wordpiece_apply" -> ((s, d) =>
      graft.llm.TextAnalysis.wordpieceApply(t(s, d, "documents"), 8)),

    // multinomial Naive Bayes (fastText-class router) TRAIN: add-one
    // smoothed per-(class,token) log-likelihoods in integer micro-log
    // units; top-20 evidence tokens per class
    "text_nb_train" -> ((s, d) =>
      graft.llm.Classifier.train(t(s, d, "documents"), 20)),

    // NB SCORE: every document against every class, absent-token mass
    // folded algebraically (model never expands per-doc), exact
    // integer argmax
    "text_nb_score" -> ((s, d) =>
      graft.llm.Classifier.score(t(s, d, "documents"))),

    // product quantization: 8 codeword ids per vector (8 subspaces ×
    // 16 codewords trained by per-slice Lloyd's) — m bytes/vector
    "emb_pq_encode" -> ((s, d) =>
      graft.llm.Clustering.pqEncode(t(s, d, "embeddings"),
        m = 8, kSub = 16, iters = 2, dim = 64)),

    // PQ asymmetric-distance top-k: full-precision query vs
    // codeword-reconstructed candidates, no exact rerank (by design)
    "sim_topk_pq" -> ((s, d) =>
      graft.llm.Similarity.pqTopK(t(s, d, "embeddings"),
        col("vec_id") < 10, 5, m = 8, kSub = 16, iters = 2, dim = 64)),

    // IVF-ADC composite (the FAISS IVF-PQ serving shape): trained
    // coarse cells prune candidates, PQ codes rank them — candidates
    // ∝ corpus/cells × nprobe, distances from m-byte codes
    "sim_topk_ivfpq" -> ((s, d) =>
      graft.llm.Similarity.ivfPqTopK(t(s, d, "embeddings"),
        col("vec_id") < 10, 5, nprobe = 2, cells = 8, ivfIters = 3,
        m = 8, kSub = 16, pqIters = 2, dim = 64)),

    // MMR diverse re-rank: greedy λ·sim − (1−λ)·max-redundancy pick of
    // 5 from the brute top-20 pool, exact integer micro-cosine argmax
    // at every step (λ=7/10 as integer arithmetic)
    "sim_topk_mmr" -> ((s, d) =>
      graft.llm.Similarity.mmrTopK(t(s, d, "embeddings"),
        col("vec_id") < 10, k = 5, pool = 20)),

    // hybrid retrieval: BM25 top-50 ∪ dense-cosine top-50 fused by
    // reciprocal rank (κ=60, integer 10⁹/(κ+r) contributions) — the
    // calibration-free sparse+dense first stage of a RAG retriever
    "sim_rrf_hybrid" -> ((s, d) =>
      graft.llm.Similarity.rrfHybrid(t(s, d, "documents"),
        t(s, d, "embeddings"), Seq("spark", "join", "vector"),
        queryId = 0L, pool = 50, k = 20)),

    // degree-ordered node-iterator triangle counting over the
    // parts-co-ordered-together graph: orientation bounds wedge
    // fan-out at O(√m) — no "last reducer" even on power-law degree
    "graph_triangles" -> ((s, d) =>
      graft.operators.Triangles.nodeTriangles(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"), 20)),

    // local clustering coefficient of the top triangle nodes: exact
    // (tri, deg) ints → one rounded micro-unit division. NOT in the
    // bench headline: it re-runs nodeTriangles (same double-count
    // rationale as emb_kmeans vs llm_sample_diverse).
    "graph_lcc" -> ((s, d) =>
      graft.operators.Triangles.localClustering(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"), 20)),

    // market-basket lift over parts-per-order (support ≥ 5): the
    // co-occurrence affinity statistic, integer micro-lift units
    "rel_basket_lift" -> ((s, d) =>
      graft.operators.Triangles.basketLift(t(s, d, "lineitem"),
        basket = "l_orderkey", item = "l_partkey", minSupport = 5L, k = 20)),

    // degree assortativity over the same co-occurrence graph: exact
    // integer moment sums → one IEEE division, identical both engines
    "graph_assortativity" -> ((s, d) =>
      graft.operators.Triangles.assortativity(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"))),

    // content-defined chunking (LBFS cut rule at word granularity):
    // boundary after words with hash ≡ 0 (mod 16) — insert-stable
    // chunk identities for storage dedup / span-level near-dup
    "text_cdc_chunks" -> ((s, d) =>
      graft.llm.TextAnalysis.cdcChunks(t(s, d, "documents"), 16)),

    // cross-document duplicate spans via CDC chunk hashes (≥3 tokens,
    // in >1 doc) — one extra groupBy on the chunk hash
    "dedup_cdc_spans" -> ((s, d) =>
      graft.llm.TextAnalysis.cdcDupSpans(t(s, d, "documents"), 16, 3)),

    // EXACT substring dedup (Lee et al. 2022): every ≥8-token span
    // occurring >1× in the corpus, all occurrences except the global
    // first — stride-1 rolling windows, overlaps merged, the
    // distributed form of the suffix-array method
    "dedup_substring_spans" -> ((s, d) =>
      Dedup.substringSpans(t(s, d, "documents"), 8)),

    // the spans applied: documents rebuilt with duplicated spans
    // removed (corpus keeps exactly one copy of each repeat)
    "dedup_substring_clean" -> ((s, d) =>
      Dedup.substringClean(t(s, d, "documents"), 8)),

    // the nightly-ingest shape: batch (doc_id%10<2) spans vs the
    // corpus window-hash set + batch-internal dups — the corpus is
    // touched once (a reusable one-shuffle hash artifact)
    "dedup_substring_incr" -> ((s, d) =>
      Dedup.substringSpansIncremental(t(s, d, "documents"),
        col("doc_id") % 10 < 2, 8)),

    // windowed funnel (click→view→purchase within 2h): one
    // groupBy(user) + linear greedy-DP fold per user — O(events·k),
    // no k-way self-join fan-out on hot users
    "rel_funnel" -> ((s, d) =>
      graft.operators.Funnel.windowFunnel(t(s, d, "events"),
        user = "user_id", ts = "ts", tieBreak = "event_id",
        typeCol = "event_type", steps = Seq("click", "view", "purchase"),
        windowMicros = 7200000000L)),

    // v3: quality → CDC span-strip rewrite → leak-free split →
    // accounting (the round-9 stages composed into one plan)
    "llm_pipeline_v3" -> ((s, d) =>
      graft.llm.Pipeline.cleanSpanSplitStats(t(s, d, "documents"))),

    // v4: DECONTAMINATION in front of the v1 chain, per-lang
    // accounting out the back (the round-14 stages composed)
    "llm_pipeline_v4" -> ((s, d) =>
      graft.llm.Pipeline.decontamCleanStats(t(s, d, "documents"),
        col("doc_id") % 50 === 0)),

    // v5: the web-crawl front door — canonical-URL dedup →
    // exact-containment dedup (posting contract) → quality gate →
    // per-lang accounting (the round-17 stages composed)
    "llm_pipeline_v5" -> ((s, d) =>
      graft.llm.Pipeline.urlContainCleanStats(t(s, d, "documents"),
        graft.llm.TextAnalysis.syntheticUrl(col("doc_id")))),

    // fixed-grid histogram quantiles per event_type: the histogram
    // cardinality is the GRID, not the rows — mergeable, rollup-ready
    "sketch_grid_quantiles" -> ((s, d) =>
      graft.llm.Sketches.gridQuantiles(t(s, d, "events"),
        col("event_type"), col("value"))),

    // media → embedding → ANN composition: feature vectors assembled
    // from the per-partition extractor feed exact cosine top-k
    "mm_embed_topk" -> ((s, d) =>
      graft.llm.Multimodal.embedTopK(t(s, d, "documents"),
        col("vec_id") < 5, k = 5)),

    // last-touch attribution (purchase ← latest click ≤ 2h before):
    // one running-max window per user, no self-join
    "rel_attribution" -> ((s, d) =>
      graft.operators.Funnel.lastTouchAttribution(t(s, d, "events"),
        user = "user_id", ts = "ts", tieBreak = "event_id",
        typeCol = "event_type", touch = "click", conv = "purchase",
        windowMicros = 7200000000L)),

    // hourly cohort retention at +1/+3/+6 hours: two bounded
    // aggregates + one user-keyed join — no windows, nothing quadratic
    "rel_retention" -> ((s, d) =>
      graft.operators.Retention.cohortRetention(t(s, d, "events"),
        user = "user_id", ts = "ts", unit = "hour", offsets = Seq(1, 3, 6))),

    // count-min sketch frequency estimates, built by the per-lang
    // rollup path (cell-wise addition) — est ≥ exact always; exact
    // column = the fixture's ground truth exposing the one-sided error
    "sketch_cms_topk" -> ((s, d) =>
      graft.llm.Sketches.cmsTopK(
        t(s, d, "documents").select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok")),
        col("lang"), col("tok"), d = 4, w = 32, k = 20)),

    // chunk-wise global dedup REWRITE: CDC chunks keep their first
    // (doc_id, chunk)-ordered occurrence, documents rebuilt from the
    // survivors — boilerplate/repeated-span strip (Lee et al. 2022)
    "llm_cdc_clean" -> ((s, d) =>
      graft.llm.TextAnalysis.cdcClean(t(s, d, "documents"), 16)),

    // Bloom-pruned semi-join: dim keys → 2¹⁶-bit driver-built filter →
    // codegen'd probe predicate AT THE FACT SCAN (rows that cannot
    // join never enter a shuffle) → exact broadcast semi-join kills
    // the false positives. Result = exact orders ⋉ BUILDING customers.
    "rel_bloom_semijoin" -> ((s, d) => {
      val bld = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      graft.operators.BloomJoin.semiJoin(t(s, d, "orders"), "o_custkey",
          bld, "c_custkey")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))
    }),

    // fixed-point PageRank over the orders→customer→nation→region FK
    // graph: scaled-integer power iteration (operators.PageRank) —
    // bit-exact across engines, no float accumulation order anywhere
    "graph_pagerank" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.PageRank.fixedPoint(o.union(c).union(n), iters = 3)
    }),

    // edge reciprocity (fraction of directed edges whose reverse also
    // exists — the standard digraph mutuality metric): every 3rd order
    // gets a back edge, so reciprocal pairs are closed-form; ONE
    // self-semi-join on the reversed pair + two 1-row stats (the
    // allowed 1-row crossJoin), exact integer micro-ratio
    "graph_reciprocity" -> ((s, d) => {
      val o = t(s, d, "orders")
      val fwd = o.select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"))
      val bwd = o.filter(col("o_orderkey") % 3 === 0)
        .select(concat(lit("o:"), col("o_orderkey")).as("src"),
          concat(lit("c:"), col("o_custkey")).as("dst"))
      val e = fwd.union(bwd).distinct()
      val rec = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(rec.agg(count(lit(1)).as("n_recip")))
        .select(col("n_edges"), col("n_recip"),
          expr("n_recip * 1000000 div n_edges").as("recip_micro"))
    }),

    // truncated Katz centrality over the same FK graph: scaled-integer
    // damped walk counts (t_h = inflow div 8 per hop, katz = Σ t_h) —
    // bit-exact like PageRank, the (I − αAᵀ)⁻¹ solve replaced by the
    // H-hop truncation that exists at 100 TB
    "graph_katz" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.PageRank.katz(o.union(c).union(n), hops = 3)
    }),

    // weighted single-source shortest paths (bounded Bellman-Ford
    // rounds, exact BIGINT min-plus) from region 1 down the reversed
    // FK graph; the lineitem o→p layer gives parts MANY in-paths, so
    // the min-plus relaxation is genuinely exercised (each part's
    // distance = min over its order lineage). Unreached regions NULL.
    "graph_sssp_weighted" -> ((s, d) => {
      val n = t(s, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"),
        (col("n_nationkey") % 5 + 1).cast("long").as("w"))
      val c = t(s, d, "customer").select(
        concat(lit("n:"), col("c_nationkey")).as("src"),
        concat(lit("c:"), col("c_custkey")).as("dst"),
        (col("c_custkey") % 50 + 1).cast("long").as("w"))
      val o = t(s, d, "orders").select(
        concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"),
        (col("o_orderkey") % 100 + 1).cast("long").as("w"))
      val l = t(s, d, "lineitem").select(
        concat(lit("o:"), col("l_orderkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst"),
        col("l_quantity").cast("long").as("w"))
      import s.implicits._
      graft.operators.Sssp.weighted(n.union(c).union(o).union(l),
        Seq("r:1").toDF("node"), maxHops = 5)
    }),

    // truncated HITS hubs/authorities over the same FK graph as katz:
    // integer damping (div 4 per half-step) replaces L2 normalization
    // — exact BIGINT scores, ranking preserved, unrolled-rounds oracle
    "graph_hits" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Hits.truncated(o.union(c).union(n), rounds = 2)
    }),

    // resource-allocation link prediction (Zhou 2009) over the
    // co-order parts graph: common-neighbor evidence weighted by
    // ⌊1e6/deg(center)⌋ — exact integer micro-units, hub centers
    // (deg > 40) excluded like graph_common_neighbors
    "graph_resource_alloc" -> ((s, d) =>
      graft.operators.Triangles.resourceAllocation(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"),
        minCommon = 3L, maxCenterDeg = 40L, k = 20)),

    // DAG longest path (critical path) down the weighted FK DAG —
    // max-plus twin of graph_sssp_weighted: dist(v) = max over paths
    // into v, every node a 0-source; still-improving after maxHops
    // raises (cycle guard)
    "graph_dag_longest" -> ((s, d) => {
      val n = t(s, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"),
        (col("n_nationkey") % 5 + 1).cast("long").as("w"))
      val c = t(s, d, "customer").select(
        concat(lit("n:"), col("c_nationkey")).as("src"),
        concat(lit("c:"), col("c_custkey")).as("dst"),
        (col("c_custkey") % 50 + 1).cast("long").as("w"))
      val o = t(s, d, "orders").select(
        concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"),
        (col("o_orderkey") % 100 + 1).cast("long").as("w"))
      val l = t(s, d, "lineitem").select(
        concat(lit("o:"), col("l_orderkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst"),
        col("l_quantity").cast("long").as("w"))
      graft.operators.Sssp.dagLongest(n.union(c).union(o).union(l),
        maxHops = 6)
    }),

    // personalized PageRank on the REVERSED FK graph seeded at region
    // 1: proximity-to-seed ranks over the region's nations → customers
    // → orders; unreachable nodes stay exactly 0
    "graph_ppr" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("n:"), col("c_nationkey")).as("src"),
        concat(lit("c:"), col("c_custkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"))
      val seeds = s.range(1).select(lit("r:1").as("node"))
      graft.operators.PageRank.personalized(o.union(c).union(n), seeds, iters = 3)
    }),

    // 60-core of the co-order parts graph: iterative peel to fixpoint
    // (asserted ≤ 6 rounds; oracle unrolls exactly 6 — idempotent past
    // the fixpoint)
    "graph_kcore" -> ((s, d) =>
      graft.operators.KCore.kCore(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"), k = 60)),

    // weakly-connected components over the FK entity graph
    // (customer/supplier→nation→region): min-label propagation
    // (Dedup.clustersFromPairs — the same engine that labels near-dup
    // clusters), components labeled by their least member IRI. The FK
    // shape gives a closed-form oracle: one component per region.
    "graph_wcc" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val fks = Seq("tpch:c_nationkey", "tpch:n_regionkey", "tpch:s_nationkey")
      val e = ctx.triples.filter(col("g") === "instance" &&
          col("p").isin(fks: _*) && col("o_kind") === "i")
        .select(col("s").as("da"), col("o_iri").as("db"))
      val nodes = e.select(col("da").as("doc_id"))
        .unionByName(e.select(col("db").as("doc_id"))).distinct()
      graft.llm.Dedup.clustersFromPairs(nodes, e)
        .select(col("doc_id").as("node"), col("cluster").as("component"))
    }),

    // label-propagation communities over the FK entity graph
    // (undirected o↔c↔n↔r): 3 synchronous rounds, most-frequent
    // neighbor label with least-label ties — integer counts + string
    // compares only, bit-reproducible (async LPA is run-order
    // dependent and can't be oracle-checked)
    "graph_lpa" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Lpa.communities(o.union(c).union(n), rounds = 3)
    }),

    // landmark closeness (Eppstein–Wang with deterministic least-id
    // landmarks): k·V distance table, never all-pairs
    "graph_closeness" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Centrality.landmarkCloseness(
        o.union(c).union(n), k = 4, maxHops = 6)
    }),

    // harmonic centrality over the same landmark BFS: Σ 1/d in exact
    // integer micro-units (Boldi & Vigna's disconnected-graph-safe
    // form) — shares the semi-naive frontier discipline
    "graph_harmonic" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Centrality.landmarkHarmonic(
        o.union(c).union(n), k = 4, maxHops = 6)
    }),

    // double-sweep diameter estimate: BFS from the least-id node, BFS
    // again from its farthest node — lower/upper diameter bounds from
    // two frontier passes, never all-pairs
    "graph_diameter" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Centrality.doubleSweepDiameter(
        o.union(c).union(n), maxHops = 6)
    }),

    // strongly connected components (FW-BW + trim, labels = least
    // member): the FK DAG (o→c→n→r) is closed into one cycle family
    // per region by back edges r→o on every 20th order — so the
    // non-trivial SCCs are exactly "region r + its selected orders +
    // their customers + their nations" and everything else is a
    // trim-detected singleton. Closed-form oracle: per-region member
    // sets, label = min member string.
    "graph_scc" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_regionkey"))
      val oc = o.select(concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val cn = c.select(concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val nr = n.select(concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      // cycle-closing back edges: region → each selected order of that
      // region (selected = orderkey ≡ 0 mod 20) — dims broadcast
      val ro = o.filter(col("o_orderkey") % 20 === 0)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(concat(lit("r:"), col("n_regionkey")).as("src"),
          concat(lit("o:"), col("o_orderkey")).as("dst"))
      graft.operators.Scc.components(oc.union(cn).union(nr).union(ro))
    }),

    // Newman modularity of the LPA partition — community quality,
    // exact in integers (Q·(2m)² = 2m·2E_within − Σ_c D_c²); only the
    // final micro-rounded division is float
    "graph_modularity" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst"))
      val n = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.operators.Lpa.modularity(o.union(c).union(n), rounds = 3)
    }),

    // BM25 relevance against a fixed query-term list: per-term tf via
    // array filters (no explode), ONE-row corpus stats broadcast back
    // over the scan, top-n as TakeOrderedAndProject — the corpus
    // itself never shuffles
    "text_bm25" -> ((s, d) =>
      TextAnalysis.bm25(t(s, d, "documents"), Seq("spark", "join", "vector"))),

    // tf·idf top-3 terms per document: ln(N/df) idf, rank window on
    // the ROUNDED score partitioned by doc_id (never global)
    // unigram-LM tokenizer training (SentencePiece, Kudo 2018) by
    // Viterbi hard-EM over word types: packed-integer DP, micro-ln
    // costs — the whole descent replays bit-for-bit
    "text_unigram_train" -> ((s, d) =>
      TextAnalysis.unigramTrain(t(s, d, "documents"),
        vocabSize = 64, pieceLen = 4, rounds = 2, maxWordLen = 16)),

    // the trained vocabulary applied (bpeApply twin): per-doc word +
    // unigram-token counts under each word type's final Viterbi
    // segmentation — the vocab is the memoized artifact, so this
    // measures ENCODE, not refit
    "text_unigram_apply" -> ((s, d) =>
      TextAnalysis.unigramApply(t(s, d, "documents"),
        vocabSize = 64, pieceLen = 4, rounds = 2, maxWordLen = 16)),

    // forward-window PMI collocations (Church & Hanks 1990): the
    // classic distributional-association score; narrow pair expansion,
    // three count shuffles, top-k on the aggregated pair table
    "text_pmi_topk" -> ((s, d) =>
      TextAnalysis.pmiTopK(t(s, d, "documents"),
        window = 2, topk = 5, minCount = 5)),

    "text_tfidf_topk" -> ((s, d) =>
      TextAnalysis.tfidfTopK(t(s, d, "documents"), 3)),

    // DSIR importance weights (Xie 2023): hashed-unigram bucket LMs
    // target-vs-raw, per-doc ordered fold of log-ratios — feeds the
    // A-ES weighted sampler for the resampling step
    "llm_dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(t(s, d, "documents"), "en", 64)),

    // the DSIR resampling step end-to-end: importance weights →
    // A-ES weighted sample without replacement over w = exp(weight)
    // (rounded pre-key so both engines fold identical doubles)
    "llm_dsir_sample" -> ((s, d) =>
      graft.llm.Sampling.weightedTopK(
        TextAnalysis.dsirWeights(t(s, d, "documents"), "en", 64),
        round(exp(col("weight")), 9), 100)),

    // trained logistic-regression quality/routing classifier
    // (fastText-style linear filter): hashed-unigram features + bias,
    // 3 full-batch GD rounds in integer micro-units — the descent
    // replays bit-for-bit in the oracle
    "llm_quality_lr" -> ((s, d) =>
      graft.llm.Classifier.logistic(t(s, d, "documents"),
        targetLang = "en", buckets = 8, rounds = 3, stepDiv = 16L)),

    // calibration table of the trained logistic (reliability-diagram
    // input): decile bins over score_micro, exact integer counts /
    // mean score / positive-rate micro-ratio per bin — the
    // threshold-tuning artifact a production quality filter ships with
    "llm_calibration" -> ((s, d) =>
      graft.llm.Classifier.calibration(t(s, d, "documents"),
        targetLang = "en", buckets = 8, rounds = 3, stepDiv = 16L)),

    // STREAMING calibration twin: weights trained once on the static
    // corpus (memoized artifact), arrivals score as a narrow
    // aggregate-HOF projection, bins fold as linear running sums —
    // batch-split independent, shares llm_calibration's oracle
    "stream_calibration" -> ((s, d) =>
      graft.streaming.Events.streamingCalibration(s, d)),

    // k-truss of the quarter-sampled co-order parts graph (every edge
    // in ≥ k−2 triangles within the subgraph — the triangle-strength
    // community core one level above k-core); peel to fixpoint with
    // the oriented √m wedge bound per round
    "graph_ktruss" -> ((s, d) =>
      graft.operators.KTruss.kTruss(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem").where(col("l_orderkey") % 4 === 0),
          "l_orderkey", "l_partkey"),
        k = 10, rounds = 6)),

    // covariance-free PCA by distributed power iteration: the top
    // principal direction of the embedding corpus, fit in 3 one-pass
    // matvec aggregates (never materializing d²), projections
    // row-exact via the per-round 6-decimal quantization barrier —
    // the descent replays verbatim in the oracle's unrolled CTEs
    "llm_pca_power" -> ((s, d) =>
      graft.llm.Pca.powerProjection(t(s, d, "embeddings"))),

    // CCNet-style perplexity under a corpus-trained add-one bigram LM:
    // the canonical LM quality filter (Wenzek 2020)
    "text_bigram_ppl" -> ((s, d) =>
      TextAnalysis.bigramPerplexity(t(s, d, "documents"))),

    // CCNet head/middle/tail perplexity terciles per language — the
    // standard corpus-quality partition, replayed exactly via NTILE
    // over the (rounded ppl, doc_id) total order
    "llm_ccnet_buckets" -> ((s, d) =>
      TextAnalysis.ccnetBuckets(t(s, d, "documents"))),

    // sequence-length cap at 256 tokens with content-proved kept
    // prefix (md5 of the re-joined tokens, not just counts)
    "llm_truncate_cap" -> ((s, d) =>
      TextAnalysis.truncateCap(t(s, d, "documents"), 256)),

    // α-power temperature rebalancing (XLM-R multilingual mix):
    // supply^0.5 shares of a 30k-token budget, salted hash-threshold
    "llm_sample_temp" -> ((s, d) =>
      graft.llm.Sampling.temperatureSample(t(s, d, "documents"), 0.5, 30000L)),

    // co-located fact⋈fact join off bucketed tables: both sides
    // bucketBy(8, custkey) → the merge join plans ZERO exchanges on
    // its inputs (PlanShapeSpec counts exactly one in the whole plan —
    // the post-join rollup). The .hint("merge") pins SMJ so the demo
    // isn't broadcast away at test scale.
    "rel_bucketed_join" -> ((s, d) => {
      def tbl(n: String) = "graft_bkt_" + n + "_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val o = graft.operators.Bucketing.ensureBucketed(s, tbl("orders"),
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", 8, d + "/orders.parquet")
      val c = graft.operators.Bucketing.ensureBucketed(s, tbl("customer"),
        t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "c_custkey", 8, d + "/customer.parquet")
      o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_orderkey")).as("sum_okey"))
    }),

    // Z-order layout: lineitem written ONCE sorted by the Morton
    // interleave of (l_orderkey, l_suppkey) cells — a 2-d box
    // predicate then prunes parquet row groups on BOTH keys via
    // ordinary column stats (ZorderSpec measures the file-count win
    // vs a single-key layout). The answer is layout-independent; the
    // oracle replays it over the original table.
    "rel_zorder_scan" -> ((s, d) => {
      val zt = graft.operators.Zorder.ensureZordered(s,
        "graft_z_lineitem_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.operators.Zorder.fingerprint(d + "/lineitem.parquet"),
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
          col("l_quantity")),
        "l_orderkey", "l_suppkey", 16)
      zt.where(col("l_orderkey").between(100, 700) &&
          col("l_suppkey").between(1, 3))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_suppkey")).as("sum_skey"))
    }),

    // --- round-10 warehouse analytics (operators.Warehouse + native
    // rollup/cube/pivot): partitioned windows and small-dim broadcast
    // joins only — each op is one shuffle plus narrow maps at scale ---

    // exact weighted median (lower-median law, integer 2·cum ≥ total):
    // price cents weighted by quantity per return flag — value-folded
    // first so the window runs keys-sized
    "rel_weighted_median" -> ((s, d) =>
      graft.operators.Warehouse.weightedMedian(t(s, d, "lineitem"),
        col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        col("l_quantity").cast("long"))),

    // deterministic walk corpus (DeepWalk input, RNG replaced by a
    // position-keyed md5 hash): 3-step walks from every region/nation
    // node down the reversed FK graph — branching 5 at regions, ~hundreds
    // at nations, so the hash-ranked edge pick is genuinely exercised
    "graph_walks" -> ((s, d) => {
      val n = t(s, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"))
      val c = t(s, d, "customer").select(
        concat(lit("n:"), col("c_nationkey")).as("src"),
        concat(lit("c:"), col("c_custkey")).as("dst"))
      val o = t(s, d, "orders").select(
        concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"))
      val starts = t(s, d, "region")
        .select(concat(lit("r:"), col("r_regionkey")).as("node"))
        .union(t(s, d, "nation")
          .select(concat(lit("n:"), col("n_nationkey")).as("node")))
      graft.operators.GraphWalks.deterministic(
        n.union(c).union(o), starts, steps = 3)
    }),

    // ROLLUP revenue hierarchy: (flag, status) → (flag) → () in ONE
    // pass — Spark expands the grouping sets inside a single hash
    // aggregate, no union of three scans
    "rel_rollup" -> ((s, d) => t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev_cents"))),

    // full CUBE over (status, priority): all 4 grouping sets in one
    // aggregate; exact integer cents
    "rel_cube" -> ((s, d) => t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))),

    // UNPIVOT (wide → long melt): the pivot's inverse, proved by
    // round-tripping the hour × type pivot back into the direct
    // long-form aggregate. Spark's Dataset.unpivot is one Expand —
    // the same shape class as pivot's aggregate, no join anywhere.
    "rel_unpivot" -> ((s, d) => {
      val types = Seq("click", "view", "signup", "purchase", "error")
      val wide = t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .pivot("event_type", types).agg(count(lit(1)))
      val dense = wide.select(col("h") +:
        types.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)
      dense.unpivot(Array(col("h")), types.map(col).toArray,
          "event_type", "n")
        .where(col("n") > 0)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"))
    }),

    // ARBITRARY grouping sets — the general form rollup/cube are
    // special cases of: (status, priority), (status), (priority) but
    // NOT the grand total. Still ONE expand + ONE hash aggregate.
    "rel_grouping_sets" -> ((s, d) => t(s, d, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))),

    // hour × event_type pivot with an EXPLICIT value list (no
    // driver-side distinct scan to discover columns); absent cells
    // coalesced to 0 so the wide table is dense
    "rel_pivot" -> ((s, d) => {
      val types = Seq("click", "view", "signup", "purchase", "error")
      val p = t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .pivot("event_type", types).agg(count(lit(1)))
      p.select(col("h") +: types.map(ty =>
        coalesce(col(ty), lit(0L)).as("n_" + ty)): _*)
    }),

    // SCD type-2 build: per-user event_type state-change log with
    // [valid_from, valid_to) intervals and version numbers
    "rel_scd2" -> ((s, d) =>
      graft.operators.Warehouse.scd2(t(s, d, "events"),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        state = "event_type")),

    // gaps-and-islands: per-user maximal consecutive-hour activity
    // runs (rank-difference trick) rolled up to streak stats
    "rel_gap_islands" -> ((s, d) =>
      graft.operators.Warehouse.gapIslands(t(s, d, "events"),
        key = "user_id", ts = "ts")),

    // first-order Markov transition counts of the per-user event flow
    "rel_next_event" -> ((s, d) =>
      graft.operators.Warehouse.transitions(t(s, d, "events"),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        state = "event_type")),

    // per-type z-score anomaly summary: tiny stats aggregate
    // broadcast back over the scan (never a window on a 5-value key)
    "rel_zscore_outliers" -> ((s, d) =>
      graft.operators.Warehouse.zscoreOutliers(t(s, d, "events"),
        group = "event_type", value = "value", threshold = 2.0)),

    // key-skew profile of a prospective shuffle key: top-10 heavy keys
    // + distribution stats (straggler ratio, entropy vs uniform) — the
    // pre-flight diagnostic for salting decisions; one groupBy + one
    // keys-sized aggregate + a top-k heap
    "rel_skew_profile" -> ((s, d) =>
      graft.operators.Warehouse.skewProfile(t(s, d, "events"),
        col("user_id"), topK = 10)),

    // exact join-cardinality pre-flight: Σ c_A(k)·c_B(k) from the two
    // key-count tables (keys-sized work, the join never materializes) +
    // the top contributing keys — what skewProfile's heavy keys
    // MULTIPLY into before the shuffle is paid for
    "rel_join_cardinality" -> ((s, d) =>
      graft.operators.Warehouse.joinCardinality(
        t(s, d, "orders"), col("o_custkey"),
        t(s, d, "customer"), col("c_custkey"), topK = 10)),

    // 7-day moving revenue per nation: daily grain via two broadcast
    // dim hops, then a NATION-partitioned rows-frame window (the
    // moving sum stays exact-integer cents; avg = cents/n on demand)
    "rel_moving_sum" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      daily.select(col("n_name"), col("day"), col("rev_cents"),
        sum(col("rev_cents")).over(w).as("mov7_cents"),
        count(lit(1)).over(w).as("mov7_n"))
    }),

    // VALUE-range window frame (the rows-frame sibling above counts 7
    // ROWS; this one covers 7 calendar DAYS, so gaps in the series
    // shrink the window instead of silently stretching it): Spark
    // range frame over epoch seconds ≡ DuckDB RANGE INTERVAL — the
    // day-truncated timestamps make the bounds exact integers. Same
    // one-exchange window shape.
    "rel_range_window" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("day").cast("long"))
        .rangeBetween(-6L * 86400, 0)
      daily.select(col("n_name"), col("day"), col("rev_cents"),
        sum(col("rev_cents")).over(w).as("r7_cents"),
        count(lit(1)).over(w).as("r7_n"))
    }),

    // DISTRIBUTED Bloom build (tree-merged per-partition bit arrays —
    // the shape past the driver-literal cap: build side never leaves
    // the executors) + the same codegen'd probe + exact semi-join
    "rel_bloom_dist" -> ((s, d) => {
      val bld = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      graft.operators.BloomJoin.semiJoinDistributed(t(s, d, "orders"),
          "o_custkey", bld, "c_custkey", bits = 1L << 20)
        .groupBy(col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_cents"))
    }),

    // per-source frequency cap (RefinedWeb-style "no domain
    // dominates"): keep ≤30 longest docs per source, audit the rest
    "llm_domain_cap" -> ((s, d) =>
      graft.llm.Sampling.domainCap(t(s, d, "documents"), cap = 30)),

    // sequence-length bucket histogram for padded-batch planning
    // (width 16, last bucket open) — exact token/waste mass per bucket
    "llm_length_buckets" -> ((s, d) =>
      graft.llm.Sampling.lengthBuckets(t(s, d, "documents"),
        width = 16, maxBucket = 15)),

    // STREAMING transition counts: last-event-per-user custom state,
    // per-batch adjacent pairs summed at the sink — equals the batch
    // transition matrix (rel_next_event's oracle)
    "stream_transitions" -> ((s, d) =>
      Events.streamingTransitions(s, d)),

    // theta-style KMV intersection: en∩es vocabulary overlap from two
    // 64-min sketches — the big table is scanned once; everything
    // after runs on ≤128 sketch rows
    "sketch_kmv_intersect" -> ((s, d) =>
      graft.llm.Sketches.kmvIntersect(
        t(s, d, "documents").select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok")),
        col("lang"), col("tok"), 64, "en", "es")),

    // theta-sketch a-not-b over the same retained sample — completes
    // the sketch set algebra (union / intersect / difference)
    "sketch_kmv_diff" -> ((s, d) =>
      graft.llm.Sketches.kmvDifference(
        t(s, d, "documents").select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok")),
        col("lang"), col("tok"), 64, "en", "es")),

    // exact interpolated quartiles per return flag (the small-group
    // exact complement to sketch_grid_quantiles): group cardinality
    // is 3 flags, values collected per group into percentile_approx's
    // exact sibling — rounded to 6 so both engines render one double
    "rel_percentiles" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(l_quantity, 0.25)"), 6).as("q25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("q50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("q75"))),

    // STREAMING windowed funnel: the greedy DP's k+1-long state vector
    // carried per user across micro-batches — state ∝ users; equals
    // the batch funnel (shares its k-way self-join oracle)
    "stream_funnel" -> ((s, d) =>
      Events.streamingFunnel(s, d)),

    // NATIVE per-group top-k (custom LogicalPlan/Strategy/SparkPlan,
    // plans/GroupTopKPlan): partial bounded heaps per partition →
    // one clustered exchange of ≤ k·partitions rows per group →
    // rank emit — same result as rel_topk_window's full-shuffle
    // window plan, different physical shape
    "rel_topk_native" -> ((s, d) =>
      graft.plans.GroupTopK.topK(
        t(s, d, "lineitem").select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice")),
        Seq("l_returnflag"),
        Seq(("l_extendedprice", true), ("l_orderkey", false),
          ("l_linenumber", false)), 3)),

    // common-neighbor link prediction over the co-order parts graph:
    // hub centers (deg > 40) excluded from the evidence count — the
    // power-law mitigation baked into the definition, oracle-replayed
    "graph_common_neighbors" -> ((s, d) =>
      graft.operators.Triangles.commonNeighbors(
        graft.operators.Triangles.coOccurrenceEdges(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey"),
        minCommon = 3L, maxCenterDeg = 40L, k = 20)),

    // STREAMING cohort retention: (cohort hour, offset bitmask) per
    // user — two numbers of state regardless of event count; rollup
    // at the sink equals the batch operator (rel_retention's oracle)
    "stream_retention" -> ((s, d) =>
      Events.streamingRetention(s, d)),

    // deterministic per-stratum k-sample THROUGH the native top-k
    // operator: order = salted content hash → the sample is stable
    // across runs/engines and the shuffle carries ≤ k·partitions rows
    // per language (GroupTopKPlan), not the corpus
    "llm_sample_per_group" -> ((s, d) =>
      graft.plans.GroupTopK.topK(
        t(s, d, "documents").select(col("doc_id"), col("lang"))
          .withColumn("h", graft.llm.Dedup.hash32(
            concat(lit("psamp:"), col("doc_id").cast("string")))),
        Seq("lang"), Seq(("h", false), ("doc_id", false)), 20)),

    // STREAMING last-touch attribution: latest-touch (ts, id) per
    // user as custom state; conversions decided at arrival, per-hour
    // increments summed at the sink (rel_attribution's oracle)
    "stream_attribution" -> ((s, d) =>
      Events.streamingAttribution(s, d)),

    // STREAMING gaps-and-islands: five numbers of streak state per
    // user; field-wise-monotone emissions → max at the sink equals
    // the batch operator (rel_gap_islands' oracle)
    "stream_gap_islands" -> ((s, d) =>
      Events.streamingGapIslands(s, d)),

    // NEAREST as-of: each purchase takes the click closest in time in
    // EITHER direction (tie → the backward match) — composed from the
    // backward and forward as-of joins (each one shuffle + window),
    // then a codegen'd gap compare; no self-join
    "rel_asof_nearest" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      def clicks(tsName: String, vName: String) =
        e.where(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as(vName))
          .withColumnRenamed("ts", tsName)
      val b = graft.operators.AsofJoin.backward(purchases,
        clicks("b_ts", "b_v"), Seq("user_id"), "ts", "b_ts",
        Seq("b_ts", "b_v"))
      val bf = graft.operators.AsofJoin.forward(b,
        clicks("f_ts", "f_v"), Seq("user_id"), "ts", "f_ts",
        Seq("f_ts", "f_v"))
      val t0 = unix_micros(col("ts"))
      val gb = t0 - unix_micros(col("b_ts"))
      val gf = unix_micros(col("f_ts")) - t0
      val takeB = col("f_ts").isNull || (col("b_ts").isNotNull && gb <= gf)
      bf.select(col("event_id"), col("user_id"), col("ts"),
        when(takeB, col("b_ts")).otherwise(col("f_ts")).as("near_ts"),
        when(takeB, col("b_v")).otherwise(col("f_v")).as("near_v"),
        when(takeB, gb).otherwise(gf).as("gap_us"))
    }),

    // STREAMING Bloom build: per-word bit_or running aggregate (state
    // = m/64 words, constant; streamed filter ≡ batch filter by OR
    // associativity), batch probe + exact semi-join
    "stream_bloom_semijoin" -> ((s, d) =>
      Events.streamingBloomSemiJoin(s, d)),

    // MAD robust outliers: median + median-absolute-deviation per
    // type (5 small groups — exact percentile), flag |v−med| > 3·MAD
    // on the rounded statistic — the robust complement to z-score
    "rel_mad_outliers" -> ((s, d) => {
      val e = t(s, d, "events")
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = e.join(broadcast(med), "event_type")
      val mad = withMed.groupBy(col("event_type"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
          first(col("med")).as("med"))
      e.join(broadcast(mad), "event_type")
        // MAD=0 guard (constant group): dev=0, engine-independent
        .withColumn("__dev", when(col("mad") === 0, lit(0.0))
          .otherwise(round(abs(col("value") - col("med")) / col("mad"), 6)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("__dev") > 3.0, 1L).otherwise(0L)).as("n_outliers"),
          round(first(col("med")), 6).as("med"),
          round(first(col("mad")), 6).as("mad"))
    }),

    // 2-D skyline over parts: cheapest-for-the-size Pareto frontier
    // (minimize price, maximize size) — local-then-global sweep, the
    // global window sees only local-skyline survivors
    "rel_skyline" -> ((s, d) =>
      graft.operators.Warehouse.skyline2d(t(s, d, "part"),
        x = "p_retailprice", y = "p_size")),

    // hapax-legomena ratio (vocabulary richness quality signal):
    // exact type/hapax counts + one rounded division per doc
    "text_hapax" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tok"), count(lit(1)).as("n_types"),
          sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("hapax_ratio",
          round(col("n_hapax").cast("double") / col("n_types"), 6))
    }),

    // deterministic-register HyperLogLog (md5 buckets/ranks, exact
    // binary-fraction sums) — completes the sketch family beside KMV:
    // m fixed bytes, max-mergeable registers
    "sketch_hll_distinct" -> ((s, d) =>
      graft.llm.Sketches.hllDistinct(t(s, d, "documents"),
        col("lang"), col("text"))
        .withColumnRenamed("g", "lang")),

    // the HLL rollup shape: per-lang registers merged cell-wise-max →
    // one global estimate ≡ sketching the table at once
    "sketch_hll_union" -> ((s, d) =>
      graft.llm.Sketches.hllUnionEstimate(t(s, d, "documents"),
        col("lang"), col("text"))),

    // STREAMING HLL register maintenance: running (type, bucket) max
    // over an unbounded stream — state = groups × 64 cells, constant;
    // batch read-out ≡ the batch sketch by max-mergeability
    "stream_hll_users" -> ((s, d) =>
      Events.streamingHll(s, d)
        .withColumnRenamed("g", "event_type")),

    // blocked fuzzy dimension repair: misspelled probes → canonical
    // nation names via bigram blocking + Dice ≥ 0.5, best per probe —
    // candidates ∝ bigram collisions, never |probes|×|dim|
    "rel_fuzzy_join" -> ((s, d) => {
      import s.implicits._
      val probes = Seq("NATON_1", "NATIN_12", "NATIOM_22", "XYZZY")
        .toDF("probe")
      graft.operators.FuzzyJoin.bestMatch(probes, "probe",
        t(s, d, "nation"), "n_name", minSim = 0.5)
    }),

    // equi-width histogram: global min/max as a 1-row broadcast, then
    // one narrow bucket map + a 16-row aggregate — the two-pass
    // histogram shape (vs sketch_grid_quantiles' FIXED grid, this one
    // adapts its range to the data)
    "rel_histogram" -> ((s, d) => {
      val o = t(s, d, "orders")
      val mm = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(mm))
        // hi=lo guard (constant column): everything in bucket 0 —
        // x/0 differs across engines (NULL vs inf/nan)
        .select(when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(15L), floor(
            (col("o_totalprice") - col("lo")) * 16.0 / (col("hi") - col("lo")))
            .cast("long"))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    }),

    // per-doc token-distribution entropy (quality signal): counts
    // folded in TOKEN-SORTED order on both engines so the double
    // accumulation is association-identical (the DSIR fold rule)
    // per-user EWMA of event values (α=0.3) — the time-series
    // smoothing fold: values folded in (ts, event_id) order
    // left-to-right, so the float op sequence is exactly the oracle's
    // ordered list_reduce; final smoothed level rounded once. The
    // collect_list per user is bounded by per-user event counts (the
    // same per-key sequential-state bound the streaming twins carry).
    "rel_ewma" -> ((s, d) => {
      val e = t(s, d, "events")
      e.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("value")))).as("vs"))
        .select(col("user_id"), size(col("vs")).as("n"),
          round(aggregate(
            expr("slice(vs, 2, size(vs) - 1)"),
            element_at(col("vs"), 1).getField("value"),
            (acc, x) => lit(0.3) * x.getField("value") + lit(0.7) * acc), 6)
            .as("ewma"))
    }),

    "text_token_entropy" -> ((s, d) => {
      val toks = t(s, d, "documents").select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n"),
          array_sort(collect_list(struct(col("tok"), col("tf")))).as("ts"))
        .select(col("doc_id"), col("n"),
          round(-aggregate(col("ts"), lit(0.0),
            (a, x) => {
              val p = x.getField("tf").cast("double") / col("n")
              a + p * log(p)
            }), 6).as("entropy"))
    }),

    // SCD-2 POINT-IN-TIME lookup: facts joined to the versioned
    // dimension AT fact time — backward as-of on valid_from with
    // version as the tie-break ≡ interval containment (intervals
    // tile, ends exclusive), so no range join is needed: one as-of
    // (one shuffle + window) instead of an interval probe
    "rel_scd2_lookup" -> ((s, d) => {
      val e = t(s, d, "events")
      val dim = graft.operators.Warehouse.scd2(e, key = "user_id",
          ts = "ts", tieBreak = "event_id", state = "event_type")
        .withColumnRenamed("valid_from", "vf")
      val facts = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.backward(facts, dim, Seq("user_id"),
        "ts", "vf", Seq("state", "version"), rightTie = Some("version"))
    }),

    // CDC latest-row compaction: one max_by aggregate per key — the
    // upsert-log → current-table collapse, no window, one shuffle
    "rel_dedup_latest" -> ((s, d) => t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("l"))
      .select(col("user_id"), col("l.ts").as("last_ts"),
        col("l.event_id").as("last_id"), col("l.event_type").as("last_type"),
        col("l.value").as("last_value"))),

    // JSON-lines sink → source round-trip (SURVEY §2.1 sinks: CSV via
    // put, turtle, parquet — this covers the JSON wire): values must
    // survive the text round-trip exactly, which the aggregate equals
    // the direct-parquet oracle proves. Landed file is
    // fingerprint-keyed like every derived artifact.
    "ext_json_roundtrip" -> ((s, d) => {
      val src = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = landedRoundTrip("json_rt", d + "/events.parquet")(
        tmp => src.write.mode("overwrite").json(tmp))
      s.read.schema(src.schema).json(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_uid"),
          round(sum(col("value")), 6).as("sum_value"))
    }),

    // ORC sink → source round-trip: the columnar sibling of the JSON
    // one (completes §2.1 sinks: CSV put, turtle, parquet, JSON, ORC).
    // Values survive the typed columnar round-trip exactly — proven by
    // the aggregate equalling the direct-parquet oracle.
    "ext_orc_roundtrip" -> ((s, d) => {
      val src = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = landedRoundTrip("orc_rt", d + "/events.parquet")(
        tmp => src.write.mode("overwrite").orc(tmp))
      s.read.schema(src.schema).orc(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_uid"),
          round(sum(col("value")), 6).as("sum_value"))
    }),

    // CSV sink → source round-trip: same aggregate-exactness proof as
    // the JSON/ORC/XML siblings for the RFC-4180 text format (header +
    // schema'd re-read — the `put`/`get` ops cover the stringly WOQL
    // path; this one proves typed values survive)
    "ext_csv_roundtrip" -> ((s, d) => {
      val src = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = landedRoundTrip("csv_rt", d + "/events.parquet")(
        tmp => src.write.mode("overwrite").option("header", "true").csv(tmp))
      s.read.schema(src.schema).option("header", "true").csv(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_uid"),
          round(sum(col("value")), 6).as("sum_value"))
    }),

    // XML sink → source round-trip: the markup sibling (completes
    // §2.1 sinks: CSV put, turtle, parquet, JSON, ORC, XML — Spark 4
    // ships the XML source built-in). Values must survive the text
    // round-trip exactly, proven by the aggregate equalling the
    // direct-parquet oracle.
    "ext_xml_roundtrip" -> ((s, d) => {
      val src = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val dir = landedRoundTrip("xml_rt", d + "/events.parquet")(
        tmp => src.write.mode("overwrite").format("xml")
          .option("rowTag", "event").save(tmp))
      s.read.schema(src.schema).format("xml").option("rowTag", "event")
        .load(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_uid"),
          round(sum(col("value")), 6).as("sum_value"))
    }),

    // N-Triples sink → DISTRIBUTED source round-trip: the line formats
    // are the only SPLITTABLE bulk-RDF path (turtle carries prefix
    // state across the document, so its reader is driver-side;
    // sources/NTriples.scala parses per line with codegen'd column
    // expressions, so 100 TB of dump re-ingests at file-split
    // parallelism). The fixture stresses every term kind — escaped
    // strings (quote/backslash/newline/tab + non-ASCII), integers,
    // booleans, doubles, IRIs, a language-tagged literal — and the
    // ROW-LEVEL compare proves values and types survive the text
    // round-trip exactly.
    "ext_ntriples_roundtrip" -> ((s, d) => {
      val dir = landedRoundTrip("nt_rt", d + "/nation.parquet")(tmp =>
        graft.sources.NTriples.dumpTo(ntFixture(s, d), tmp))
      ntReadBack(graft.sources.NTriples.read(s, dir))
    }),

    // DISTRIBUTED Turtle ingest (r14 verdict #3): a prefixed,
    // `;`-grouped multi-line Turtle dump of the customer slice —
    // @prefix directives + pname subjects/predicates/objects + the `a`
    // keyword + bare integer literals — re-ingested by the SPLITTABLE
    // two-pass reader (TurtleDist: directive preamble collect, then
    // statement assembly by prefix-summed statement ids and full-
    // grammar parse per statement on executors). The multi-line
    // statement shape forces the grouping path, not the per-line fast
    // path. Closed-form oracle: the EAV restatement of the dumped
    // predicates.
    "ext_turtle_dist" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val preds = Seq("tpch:c_custkey", "tpch:c_name", "tpch:c_mktsegment",
        "tpch:c_nationkey", "rdf:type")
      val cust = ctx.triples.filter(col("g") === "instance" &&
        col("s").startsWith("tpch:customer/") && col("p").isin(preds: _*))
      val dir = landedRoundTrip("ttl_dist", d + "/customer.parquet")(tmp =>
        graft.sources.TurtleDist.dumpPrefixedTo(cust, Map(
          "c" -> "tpch:customer/", "n" -> "tpch:nation/", "t" -> "tpch:"),
          tmp))
      graft.sources.TurtleDist.read(s, dir)
        .select(col("g"), col("s"), col("p"), col("o_kind"), col("o_iri"),
          col("o_typ"), col("o_str"), col("o_lng"))
    }),

    // N-Quads sibling: the graph term rides each line, so a quad store
    // (instance/schema/commit graphs) dumps and re-ingests without a
    // per-graph pass; a second graph label proves g survives.
    "ext_nquads_roundtrip" -> ((s, d) => {
      val quads = ntFixture(s, d).withColumn("g",
        when(col("p").isin("ex:key", "ex:even"), lit("g:audit"))
          .otherwise(col("g")))
      val dir = landedRoundTrip("nq_rt", d + "/nation.parquet")(tmp =>
        graft.sources.NTriples.dumpQuadsTo(quads, tmp))
      ntReadBack(graft.sources.NTriples.readQuads(s, dir))
    }),

    // STREAMING multimodal ingest: per-micro-batch real PNG decode —
    // same per-doc closed-form oracle as the batch mm_decode_png
    "stream_mm_meta" -> ((s, d) => Events.streamingMmMeta(s, d)),

    // STREAMING WordPiece encode: the batch-trained merge artifact
    // applied per micro-batch as a STATELESS projection (the merges
    // fold as pure column expressions — the serving-side tokenizer
    // shape); same oracle as text_wordpiece_apply by construction
    "stream_wordpiece_apply" -> ((s, d) =>
      Events.streamingWordpieceApply(s, d)),

    // STREAMING triple ingestion end-to-end (§2.10): an EAV triple
    // stream lands as ONE COMMIT LAYER PER MICRO-BATCH
    // (Ingest.streamIntoStore foreachBatch), then the materialized
    // branch must equal the batch encode — per-predicate counts
    // against the raw table. The ingested store is fingerprint-keyed
    // and built once via atomic rename (concurrent sessions see either
    // nothing or the finished store, never a partial commit chain).
    "stream_ingest_commits" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val preds = Seq("tpch:o_custkey", "tpch:o_totalprice")
      val cacheRoot = sys.env.getOrElse("GRAFT_EAV_CACHE",
        "/root/repo/target/eav")
      val fp = graft.util.Fingerprint.of(d + "/orders.parquet")
      val storeDir = new java.io.File(s"$cacheRoot/ingest_store_$fp")
      if (!storeDir.exists()) {
        val stageDir = new java.io.File(s"$cacheRoot/ingest_stage_$fp")
        ctx.triples.filter(col("p").isin(preds: _*))
          .repartition(3) // three files → three micro-batches/commits
          .write.mode("overwrite").parquet(stageDir.getAbsolutePath)
        val tmp = new java.io.File(storeDir.getPath + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8))
        val st = graft.storage.LayerStore.open(s, tmp.getPath)
        val stream = s.readStream.schema(graft.storage.Eav.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stageDir.getAbsolutePath)
        graft.streaming.Ingest.streamIntoStore(stream, st, "main")
          .awaitTermination()
        require(st.chain(st.refs("main")).size >= 2,
          "streamed ingest must land multiple commit layers")
        if (!tmp.renameTo(storeDir)) {
          // lost the build race: keep the winner's store
          org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        }
      }
      graft.storage.LayerStore.open(s, storeDir.getPath)
        .materializeBranch("main")
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
    }),

    // STREAMING N-Quads ingestion: raw RDF text lines parse PER
    // MICRO-BATCH with the distributed line reader (stateless codegen'd
    // projection — the parse rides inside each batch, no state store),
    // land as one commit layer per batch, and the materialized branch
    // restates the typed fixture per graph. The 100 TB shape: a quad
    // firehose ingests at text-split parallelism with layered-commit
    // durability per trigger.
    "stream_nquads_ingest" -> ((s, d) => {
      val cacheRoot = sys.env.getOrElse("GRAFT_EAV_CACHE",
        "/root/repo/target/eav")
      val fp = graft.util.Fingerprint.of(d + "/nation.parquet")
      val storeDir = new java.io.File(s"$cacheRoot/nq_ingest_store_$fp")
      if (!storeDir.exists()) {
        val stageDir = new java.io.File(s"$cacheRoot/nq_ingest_stage_$fp")
        val quads = ntFixture(s, d).withColumn("g",
          when(col("p").isin("ex:key", "ex:even"), lit("g:audit"))
            .otherwise(col("g")))
        graft.sources.NTriples.dumpQuadLines(quads)
          .repartition(3) // three files → three micro-batches/commits
          .write.mode("overwrite").text(stageDir.getAbsolutePath)
        val tmp = new java.io.File(storeDir.getPath + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8))
        // any failure (stream error, layer-count require) must not
        // leak the .tmp-* staging store — retried runs would accumulate
        var ok = false
        try {
          val st = graft.storage.LayerStore.open(s, tmp.getPath)
          val stream = s.readStream.option("maxFilesPerTrigger", "1")
            .text(stageDir.getAbsolutePath)
          val parsed = graft.sources.NTriples.fromLines(stream, quads = true)
          graft.streaming.Ingest.streamIntoStore(parsed, st, "main")
            .awaitTermination()
          require(st.chain(st.refs("main")).size >= 2,
            "streamed N-Quads ingest must land multiple commit layers")
          ok = true
        } finally {
          if (!ok || !tmp.renameTo(storeDir)) {
            // failed build, or lost the build race: drop the staging dir
            org.apache.commons.io.FileUtils.deleteDirectory(tmp)
          }
        }
      }
      graft.storage.LayerStore.open(s, storeDir.getPath)
        .materializeBranch("main")
        .groupBy(col("g"), col("p"))
        .agg(count(lit(1)).as("n"), sum(col("o_lng")).as("sum_lng"))
    }),

    // the analytic-window suite in one entry: rank / dense_rank /
    // ntile / percent_rank / cume_dist / first / last over one
    // nation-partitioned order — one exchange serves all seven.
    // cume_dist is emitted as its EXACT integer numerator (cd·n — an
    // integer by construction): at group sizes like 640, ranks/640
    // terminate at 7 decimals and a round-6 lands on exact halves,
    // which Spark and DuckDB round apart; percent_rank stays rounded
    // (its (n−1) denominators here never produce decimal halves)
    "rel_window_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w) * count(lit(1)).over(wf), 0)
          .cast("long").as("cd_num"),
        count(lit(1)).over(wf).as("n"),
        first(col("c_custkey")).over(wf).as("richest"),
        last(col("c_custkey")).over(wf).as("poorest"))
    }),

    // calendar gap-fill: nation × day grid (sequence/explode over the
    // GLOBAL date span — grid cardinality is nations × days, a time
    // dimension, never row count), zero-filled daily revenue + running
    // cumulative per nation. The missing-period repair every
    // time-series rollup needs before charting/forecasting.
    "rel_gapfill_daily" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
      val span = o.agg(date_trunc("day", min(col("o_orderdate"))).as("d0"),
        date_trunc("day", max(col("o_orderdate"))).as("d1"))
      val grid = n.select(col("n_name")).crossJoin(broadcast(span))
        .select(col("n_name"), explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val filled = grid.join(daily, Seq("n_name", "day"), "left_outer")
        .select(col("n_name"), col("day"),
          coalesce(col("rev"), lit(0L)).as("rev_cents"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      filled.withColumn("cum_cents", sum(col("rev_cents")).over(w))
    })
  )

  // DuckDB-side shared fragments
  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private val shSql = // distinct word 3-gram shingles, matching Dedup.shingleSets
    s"""CASE WHEN len($toksSql) < 3 THEN [array_to_string($toksSql, ' ')]
       | ELSE list_distinct(list_transform(range(1, len($toksSql) - 1),
       |   i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2])) END""".stripMargin
  private val hash32Sql = // value of first 8 md5 hex chars (= Dedup.hash32)
    """CAST(list_sum(list_transform(range(1, 9),
      |  i -> (strpos('0123456789abcdef', substr(md5(s), CAST(i AS INT), 1)) - 1)
      |       * power(16, 8 - i))) AS BIGINT)""".stripMargin
  /** hash32Sql applied to an arbitrary string expression. */
  private def hash32On(e: String): String = hash32Sql.replace("md5(s)", s"md5($e)")
  private val cosSql =
    "list_dot_product(ea, eb) / (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb)))"

  /** BPE merge-loop CTE chain (shared by text_bpe_train and its
    * divergence probe): `v0` = (word, symbol-list, count) vocabulary;
    * per round i: `p_i` pair counts, `b_i` argmax, and the greedy
    * left-to-right merge replayed with unnest + window functions only
    * — `u_i` explodes (position, symbol) rows, `c_i` marks candidate
    * positions where (sym, next-sym) = the merge pair, `s_i` does
    * gaps-and-islands over consecutive candidates (odd candidates
    * within a run merge — greedy semantics, since runs > 1 only occur
    * when lhs = rhs), `v_i` re-lists with merged pairs substituted and
    * their consumed right neighbors dropped. No list_reduce / string
    * state machine anywhere, so the chain is robust across DuckDB
    * versions. Everything MATERIALIZED to stop exponential CTE
    * inlining. The last round emits only p/b (no fold — training
    * needs only the decision). */
  private def bpeWindowChain(k: Int): String = bpeChainSql(k,
    """w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents),
      | wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM w GROUP BY w),
      | v0 AS MATERIALIZED (SELECT w,
      |   list_append(regexp_extract_all(w, '[a-z]'), '_') AS syms, cnt
      |  FROM wc)""".stripMargin)

  /** Byte-level BPE chain: same rounds, but v0 is the hex-pair UTF-8
    * byte decomposition of ' '||w (the 0x20 space byte is GPT-2's Ġ
    * word marker) and the word alphabet includes digits. */
  private def byteBpeWindowChain(k: Int): String = bpeChainSql(k,
    """w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      | wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM w GROUP BY w),
      | v0 AS MATERIALIZED (SELECT w, list_transform(range(1, strlen(w)+2),
      |   j -> substr(hex(' '||w), (j-1)*2+1, 2)) AS syms, cnt
      |  FROM wc)""".stripMargin)

  private def bpeChainSql(k: Int, header: String): String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      val pairsBest =
        s""", p$i AS MATERIALIZED (SELECT t.pair, sum(t.cnt) AS freq FROM (
           |   SELECT unnest(list_transform(range(1, len(syms)),
           |     j -> syms[j] || ' ' || syms[j+1])) AS pair, cnt
           |   FROM $prev WHERE len(syms) >= 2) t GROUP BY t.pair),
           | b$i AS MATERIALIZED (SELECT split_part(pair,' ',1) AS lhs,
           |   split_part(pair,' ',2) AS rhs, freq
           |  FROM p$i ORDER BY freq DESC, pair LIMIT 1)""".stripMargin
      val fold =
        s""", u$i AS MATERIALIZED (SELECT w, cnt,
           |   unnest(range(1, len(syms)+1)) AS i, unnest(syms) AS sym FROM $prev),
           | c$i AS MATERIALIZED (SELECT u.w, u.cnt, u.i, u.sym,
           |   (u.sym = b.lhs AND
           |    lead(u.sym) OVER (PARTITION BY u.w ORDER BY u.i) = b.rhs) AS cand
           |  FROM u$i u CROSS JOIN b$i b),
           | s$i AS MATERIALIZED (SELECT w, i,
           |   (row_number() OVER (PARTITION BY w, i - rn ORDER BY i) % 2 = 1) AS merged
           |  FROM (SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) AS rn
           |        FROM c$i WHERE cand)),
           | v$i AS MATERIALIZED (SELECT w, list(sym2 ORDER BY i) AS syms, min(cnt) AS cnt
           |  FROM (SELECT c.w, c.cnt, c.i,
           |     CASE WHEN coalesce(s.merged, false) THEN b.lhs || b.rhs ELSE c.sym END AS sym2,
           |     coalesce(lag(coalesce(s.merged, false))
           |       OVER (PARTITION BY c.w ORDER BY c.i), false) AS pm
           |    FROM c$i c LEFT JOIN s$i s ON s.w = c.w AND s.i = c.i
           |    CROSS JOIN b$i b) q
           |  WHERE NOT pm GROUP BY w)""".stripMargin
      if (i < k) pairsBest + fold else pairsBest
    }
    s"""$header
       | ${(1 to k).map(round).mkString("\n")}""".stripMargin
  }

  /** WordPiece merge-loop CTE chain — the [[bpeWindowChain]] structure
    * with two deltas: the argmax is the LIKELIHOOD score
    * floor(freq·10¹²/(n_l·n_r)) in exact HUGEINT math (un$i unit
    * counts join in as denominators; ties score DESC, lhs, rhs), and
    * the merged symbol strips the `##` continuation marker from the
    * right piece. v0 is bare-first-char + ##-continuations, no
    * end-of-word marker. Same unnest + gaps-and-islands greedy-merge
    * replay, everything MATERIALIZED. */
  private def wpWindowChain(k: Int): String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      val pairsBest =
        s""", p$i AS MATERIALIZED (SELECT t.pair, sum(t.cnt) AS freq FROM (
           |   SELECT unnest(list_transform(range(1, len(syms)),
           |     j -> syms[j] || ' ' || syms[j+1])) AS pair, cnt
           |   FROM $prev WHERE len(syms) >= 2) t GROUP BY t.pair),
           | un$i AS MATERIALIZED (SELECT sym, sum(cnt) AS n FROM (
           |   SELECT unnest(syms) AS sym, cnt FROM $prev) GROUP BY sym),
           | b$i AS MATERIALIZED (SELECT p.lhs, p.rhs, p.freq,
           |   CAST(CAST(p.freq AS HUGEINT) * 1000000000000 //
           |     (CAST(ul.n AS HUGEINT) * ur.n) AS BIGINT) AS score_e12
           |  FROM (SELECT split_part(pair,' ',1) AS lhs,
           |          split_part(pair,' ',2) AS rhs, freq FROM p$i) p
           |  JOIN un$i ul ON ul.sym = p.lhs
           |  JOIN un$i ur ON ur.sym = p.rhs
           |  ORDER BY score_e12 DESC, p.lhs, p.rhs LIMIT 1)""".stripMargin
      val fold =
        s""", u$i AS MATERIALIZED (SELECT w, cnt,
           |   unnest(range(1, len(syms)+1)) AS i, unnest(syms) AS sym FROM $prev),
           | c$i AS MATERIALIZED (SELECT u.w, u.cnt, u.i, u.sym,
           |   (u.sym = b.lhs AND
           |    lead(u.sym) OVER (PARTITION BY u.w ORDER BY u.i) = b.rhs) AS cand
           |  FROM u$i u CROSS JOIN b$i b),
           | s$i AS MATERIALIZED (SELECT w, i,
           |   (row_number() OVER (PARTITION BY w, i - rn ORDER BY i) % 2 = 1) AS merged
           |  FROM (SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) AS rn
           |        FROM c$i WHERE cand)),
           | v$i AS MATERIALIZED (SELECT w, list(sym2 ORDER BY i) AS syms, min(cnt) AS cnt
           |  FROM (SELECT c.w, c.cnt, c.i,
           |     CASE WHEN coalesce(s.merged, false)
           |      THEN b.lhs || regexp_replace(b.rhs, '^##', '') ELSE c.sym END AS sym2,
           |     coalesce(lag(coalesce(s.merged, false))
           |       OVER (PARTITION BY c.w ORDER BY c.i), false) AS pm
           |    FROM c$i c LEFT JOIN s$i s ON s.w = c.w AND s.i = c.i
           |    CROSS JOIN b$i b) q
           |  WHERE NOT pm GROUP BY w)""".stripMargin
      if (i < k) pairsBest + fold else pairsBest
    }
    s"""w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       | wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM w GROUP BY w),
       | v0 AS MATERIALIZED (SELECT w,
       |   list_prepend(substr(w, 1, 1),
       |     list_transform(regexp_extract_all(w, '[a-z]')[2:],
       |       c -> '##' || c)) AS syms, cnt
       |  FROM wc)
       | ${(1 to k).map(round).mkString("\n")}""".stripMargin
  }

  /** WordPiece APPLY oracle (shared by `text_wordpiece_apply` and its
    * streaming twin `stream_wordpiece_apply`, which encodes the same
    * corpus per micro-batch with the same trained merges): the 8-round
    * likelihood-argmax chain with vocab rows carrying their source
    * word through a list_reduce fold (the text_bpe_apply replay
    * formulation, ##-stripped merged symbols); per-doc word counts
    * join the final word→symbols map. */
  private def wpApplySql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      s""", p$i AS MATERIALIZED (SELECT t.pair, sum(t.cnt) AS freq FROM (
         |   SELECT unnest(list_transform(range(1, len(syms)),
         |     j -> syms[j] || ' ' || syms[j+1])) AS pair, cnt
         |   FROM $prev WHERE len(syms) >= 2) t GROUP BY t.pair),
         | un$i AS MATERIALIZED (SELECT sym, sum(cnt) AS n FROM (
         |   SELECT unnest(syms) AS sym, cnt FROM $prev) GROUP BY sym),
         | b$i AS MATERIALIZED (SELECT p.lhs, p.rhs,
         |   p.lhs || regexp_replace(p.rhs, '^##', '') AS msym
         |  FROM (SELECT split_part(pair,' ',1) AS lhs,
         |          split_part(pair,' ',2) AS rhs, freq FROM p$i) p
         |  JOIN un$i ul ON ul.sym = p.lhs
         |  JOIN un$i ur ON ur.sym = p.rhs
         |  ORDER BY CAST(p.freq AS HUGEINT) * 1000000000000 //
         |    (CAST(ul.n AS HUGEINT) * ur.n) DESC, p.lhs, p.rhs LIMIT 1),
         | v$i AS MATERIALIZED (SELECT w, string_split(
         |   CASE WHEN split_part(st,'|',2)='' THEN split_part(st,'|',1)
         |        WHEN split_part(st,'|',1)='' THEN split_part(st,'|',2)
         |        ELSE split_part(st,'|',1) || ',' || split_part(st,'|',2) END,
         |   ',') AS syms, cnt
         |  FROM (SELECT w, list_reduce(list_prepend('|', syms), (acc, x) ->
         |   CASE WHEN split_part(acc,'|',2) = b$i.lhs AND x = b$i.rhs
         |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
         |          ELSE split_part(acc,'|',1)||',' END) || b$i.msym || '|'
         |    WHEN split_part(acc,'|',2) <> ''
         |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
         |          ELSE split_part(acc,'|',1)||',' END) || split_part(acc,'|',2) || '|' || x
         |    ELSE split_part(acc,'|',1) || '|' || x END) AS st, cnt
         |   FROM $prev, b$i) q)""".stripMargin
    }
    s"""WITH dw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       | dwc AS MATERIALIZED (SELECT doc_id, w, count(*) AS c
       |  FROM dw GROUP BY doc_id, w),
       | wc AS MATERIALIZED (SELECT w, sum(c) AS cnt FROM dwc GROUP BY w),
       | v0 AS MATERIALIZED (SELECT w,
       |   list_prepend(substr(w, 1, 1),
       |     list_transform(regexp_extract_all(w, '[a-z]')[2:],
       |       c -> '##' || c)) AS syms, cnt
       |  FROM wc)
       | ${(1 to 8).map(round).mkString("\n")}
       | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       |   CAST(sum(c * len(syms)) AS BIGINT) AS n_wp_tokens
       | FROM dwc JOIN v8 USING (w) GROUP BY doc_id""".stripMargin
  }

  /** BM25 CTE chain ending in `sc(doc_id, score)` (terms spark/join/
    * vector, k1=1.2, b=0.75, Lucene idf) — shared by text_bm25 and
    * sim_rrf_hybrid. Every fractional literal ::DOUBLE so DuckDB runs
    * the chain in IEEE doubles like the engine. */
  private lazy val bm25ScCtes: String = {
    def term(t: String) = {
      val (tf, df) = (s"tf_$t", s"df_$t")
      s"""ln(1.0::DOUBLE + (n - $df + 0.5::DOUBLE) / ($df + 0.5::DOUBLE))
         | * ($tf * 2.2::DOUBLE) / ($tf + 1.2::DOUBLE * (0.25::DOUBLE
         |   + 0.75::DOUBLE * dl / (CAST(sumdl AS DOUBLE) / n)))""".stripMargin
    }
    s"""tf AS (SELECT doc_id, len($toksSql) AS dl,
      |   len(list_filter($toksSql, x -> x = 'spark')) AS tf_spark,
      |   len(list_filter($toksSql, x -> x = 'join')) AS tf_join,
      |   len(list_filter($toksSql, x -> x = 'vector')) AS tf_vector
      |  FROM documents),
      | st AS (SELECT count(*) AS n, sum(dl) AS sumdl,
      |   count_if(tf_spark > 0) AS df_spark, count_if(tf_join > 0) AS df_join,
      |   count_if(tf_vector > 0) AS df_vector FROM tf),
      | sc AS (SELECT doc_id, round(${term("spark")}
      |    + ${term("join")}
      |    + ${term("vector")}, 6) AS score FROM tf, st)""".stripMargin
  }

  /** Exact-substring-dedup CTE chain ending in `mk(doc_id, pos)` (all
    * duplicated stride-1 L-windows except each hash's global first
    * occurrence) plus `d0(doc_id, toks)` — matches
    * Dedup.substringSpans' marking stage. */
  private def substrMarkCtes(L: Int): String =
    // NB: the subscript is `gi`, NOT `i` — hash32Sql's digit lambda
    // binds `i` and would capture an outer `i` after substitution
    s"""d0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
      | p0 AS (SELECT doc_id, toks, generate_subscripts(toks, 1) AS gi FROM d0),
      | o0 AS (SELECT doc_id, CAST(gi - 1 AS BIGINT) AS pos,
      |   ${hash32On(s"array_to_string(toks[gi : gi + ${L - 1}], ' ')")} AS h
      |  FROM p0 WHERE gi <= len(toks) - ${L - 1}),
      | st AS (SELECT h FROM o0 GROUP BY h HAVING count(*) >= 2),
      | k0 AS (SELECT h, doc_id, pos, row_number() OVER (
      |     PARTITION BY h ORDER BY doc_id, pos) AS rn FROM o0),
      | mk AS (SELECT o0.doc_id, o0.pos FROM o0 JOIN st USING (h)
      |   JOIN (SELECT h, doc_id AS kd, pos AS kp FROM k0 WHERE rn = 1) k
      |     USING (h)
      |   WHERE NOT (o0.doc_id = k.kd AND o0.pos = k.kp))""".stripMargin

  /** Unigram-LM trainer oracle (= TextAnalysis.unigramTrain): the
    * Viterbi DP is unrolled to `maxWordLen` accumulated-union CTEs per
    * round (forward) plus `maxWordLen` chained backtrace CTEs; the
    * argmin and tie-break replay as ONE integer min over the packed
    * `score·32 + j` value, unpacked with the same bit ops. */
  private def unigramSql(vocabSize: Int, pieceLen: Int, rounds: Int,
                         maxWordLen: Int, mode: String = "train"): String = {
    // u/pr/c/pc CTEs are referenced more than once — DuckDB INLINES
    // non-materialized CTEs per reference, so without MATERIALIZED the
    // u-chain expands the base scan 2^maxWordLen times (first cut
    // died on fd exhaustion before it died on time)
    val lastR = if (mode == "apply") rounds + 1 else rounds
    def pieceUnion(r: Int) = (1 to maxWordLen)
      .map(s => s"SELECT w, f, piece FROM b${s}_$r").mkString(" UNION ALL ")
    val roundCtes = (1 to lastR).map { r =>
      val fwd = (1 to maxWordLen).map { k =>
        s"""u${k}_$r AS MATERIALIZED (
           |  SELECT * FROM u${k - 1}_$r
           |  UNION ALL
           |  SELECT w, $k AS pos, best >> 5 AS score,
           |    CAST(best & 31 AS INT) AS bp FROM (
           |    SELECT p.w, min((u.score + p.cost) * 32 + p.j) AS best
           |    FROM pr_$r p JOIN u${k - 1}_$r u ON u.w = p.w AND u.pos = p.j
           |    WHERE p.k = $k AND p.len >= $k
           |    GROUP BY p.w))""".stripMargin
      }.mkString(",\n ")
      val back = (1 to maxWordLen).map { s =>
        s"""b${s}_$r AS (SELECT b.w, b.f, u.bp AS pos,
           |    substr(b.w, u.bp + 1, b.pos - u.bp) AS piece
           |  FROM b${s - 1}_$r b JOIN u${maxWordLen}_$r u
           |    ON u.w = b.w AND u.pos = b.pos
           |  WHERE b.pos > 0)""".stripMargin
      }.mkString(",\n ")
      // the apply mode's extra final round segments only — no recount
      val recount = if (r > rounds) "" else
        s""",
           | sg_$r AS (SELECT piece, sum(f) AS cnt FROM (${pieceUnion(r)}) GROUP BY 1),
           | c$r AS MATERIALIZED (SELECT vp.piece, CAST(coalesce(sg.cnt, 0) AS BIGINT) AS cnt
           |   FROM vp LEFT JOIN sg_$r sg USING (piece))""".stripMargin
      s"""st_$r AS (SELECT sum(cnt) AS tot, count(*) AS v FROM c${r - 1}),
         | cm_$r AS (SELECT piece, CAST(-round(ln((cnt + 1)::DOUBLE
         |     / (tot + v)) * 1000000, 0) AS BIGINT) AS cost
         |   FROM c${r - 1}, st_$r),
         | pr_$r AS MATERIALIZED (SELECT pc.w, pc.f, pc.len, pc.j, pc.k, cm.cost
         |   FROM pc JOIN cm_$r cm ON pc.piece = cm.piece),
         | u0_$r AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS score,
         |   0 AS bp FROM wd),
         | $fwd,
         | b0_$r AS MATERIALIZED (SELECT w, f, len AS pos FROM wd),
         | $back$recount""".stripMargin
    }.mkString(",\n ")
    val tail =
      if (mode == "apply")
        s"""nt AS (SELECT w, CAST(count(*) AS BIGINT) AS ntok
           |   FROM (${pieceUnion(lastR)}) GROUP BY 1),
           | dw AS (SELECT doc_id, w, count(*) AS c
           |   FROM (SELECT doc_id,
           |       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
           |     FROM documents)
           |   WHERE length(w) <= $maxWordLen GROUP BY 1, 2)
           | SELECT dw.doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           |   CAST(sum(c * ntok) AS BIGINT) AS n_uni_tokens
           | FROM dw JOIN nt USING (w) GROUP BY 1""".stripMargin
      else
        s"""fs AS (SELECT sum(cnt) AS tot, count(*) AS v FROM c$rounds)
           | SELECT piece, cnt, CAST(-round(ln((cnt + 1)::DOUBLE / (tot + v))
           |     * 1000000, 0) AS BIGINT) AS cost_micro
           | FROM c$rounds, fs""".stripMargin
    s"""WITH wd AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f, length(w) AS len
       |   FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |         FROM documents)
       |   WHERE length(w) <= $maxWordLen GROUP BY 1, length(w)),
       | s1 AS (SELECT w, f, len, unnest(range(0, len)) AS i FROM wd),
       | s2 AS (SELECT w, f, len, i,
       |     unnest(range(1, least($pieceLen, len - i) + 1)) AS l FROM s1),
       | pc AS MATERIALIZED (SELECT w, f, len, i AS j, i + l AS k,
       |     substr(w, i + 1, l) AS piece FROM s2),
       | sd AS (SELECT piece, sum(f) AS cnt FROM pc GROUP BY 1),
       | tv AS (SELECT piece, cnt FROM sd ORDER BY cnt DESC, piece
       |   LIMIT $vocabSize),
       | c0 AS MATERIALIZED (SELECT DISTINCT piece, cnt FROM (SELECT * FROM tv UNION ALL
       |     SELECT piece, cnt FROM sd WHERE length(piece) = 1)),
       | vp AS MATERIALIZED (SELECT piece FROM c0),
       | $roundCtes,
       | $tail""".stripMargin
  }

  /** The islands-merge + span projection over a `mk(doc_id, pos)` CTE
    * (shared by the full and incremental substring-dedup oracles). */
  private def substrSpanSelect(L: Int): String =
    s"""g0 AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (
      |     PARTITION BY doc_id ORDER BY pos) > $L THEN 1 ELSE 0 END AS gap
      |   FROM mk),
      | i0 AS (SELECT doc_id, pos, sum(gap) OVER (PARTITION BY doc_id
      |     ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS isl FROM g0)
      | SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |   CAST(max(pos) + ${L - 1} AS BIGINT) AS span_end,
      |   CAST(count(*) AS BIGINT) AS n_windows
      | FROM i0 GROUP BY doc_id, isl""".stripMargin

  /** CDC chunk CTE chain ending in `cc(doc_id, chunk, n_tok, ch)` —
    * boundary after words with hash32 ≡ 0 (mod 16), chunk id = count
    * of boundaries strictly before the word (matches
    * TextAnalysis.cdcChunks). */
  private lazy val cdcChunkCtes: String = cdcChunkCtesFrom("documents")
  private def cdcChunkCtesFrom(src: String): String =
    s"""d0 AS (SELECT doc_id, $toksSql AS toks FROM $src),
      | t0 AS (SELECT doc_id, unnest(toks) AS s,
      |   generate_subscripts(toks, 1) AS pos FROM d0),
      | b0 AS (SELECT doc_id, pos, s,
      |   CASE WHEN ($hash32Sql) % 16 = 0 THEN 1 ELSE 0 END AS bnd FROM t0),
      | c0 AS (SELECT doc_id, pos, s, CAST(coalesce(sum(bnd) OVER (
      |     PARTITION BY doc_id ORDER BY pos
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk
      |   FROM b0),
      | cc AS (SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS n_tok,
      |   string_agg(s, ' ' ORDER BY pos) AS ctext,
      |   md5(string_agg(s, ' ' ORDER BY pos)) AS ch
      |  FROM c0 GROUP BY 1, 2)""".stripMargin

  /** MinHash-LSH verified near-dup pairs as CTEs ending in `pr(da, db,
    * jaccard)` — shared by the pair query and the cluster query. */
  private val minhashPairCtes: String = minhashPairCtesFrom("documents")
  /** Same chain over an arbitrary source CTE/table (needs doc_id, text). */
  private def minhashPairCtesFrom(src: String): String =
    s"""sh AS (SELECT doc_id, $shSql AS shs FROM $src),
       | h AS (SELECT doc_id, $hash32Sql AS hv FROM
       |        (SELECT doc_id, unnest(shs) AS s FROM sh)),
       | sig AS (SELECT doc_id,
       |   min((1000003*hv+12345) % 4294967311) AS m0,
       |   min((2000029*hv+54321) % 4294967311) AS m1,
       |   min((3000073*hv+11111) % 4294967311) AS m2,
       |   min((4000037*hv+22222) % 4294967311) AS m3,
       |   min((5000011*hv+33333) % 4294967311) AS m4,
       |   min((6000011*hv+44444) % 4294967311) AS m5,
       |   min((7000003*hv+55555) % 4294967311) AS m6,
       |   min((8000009*hv+66666) % 4294967311) AS m7
       |  FROM h GROUP BY doc_id),
       | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       |    md5(a.m0||'_'||a.m1) = md5(b.m0||'_'||b.m1) OR
       |    md5(a.m2||'_'||a.m3) = md5(b.m2||'_'||b.m3) OR
       |    md5(a.m4||'_'||a.m5) = md5(b.m4||'_'||b.m5) OR
       |    md5(a.m6||'_'||a.m7) = md5(b.m6||'_'||b.m7))),
       | pr AS (SELECT da, db, round(len(list_intersect(x.shs, y.shs)) * 1.0 /
       |   len(list_distinct(list_concat(x.shs, y.shs))), 6) AS jaccard
       | FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
       | WHERE len(list_intersect(x.shs, y.shs)) * 1.0 /
       |   len(list_distinct(list_concat(x.shs, y.shs))) >= 0.5)""".stripMargin

  /** SRP-LSH bucket CTEs (= Similarity.srpBucket): md5-derived
    * hyperplanes, per-vector bucket id over `nbits` sign bits. The
    * hamming-≤1 join below is the SQL mirror of the engine's
    * multi-probe (bucket XOR one-bit masks). */
  private def srpBuckSql(nbits: Int): String =
    s"""planes AS (SELECT j, k,
       |   CAST(list_sum(list_transform(range(1, 9),
       |     i -> (strpos('0123456789abcdef', substr(md5('plane_'||j||':'||k), CAST(i AS INT), 1)) - 1)
       |          * power(16, 8 - i))) AS BIGINT) / 2147483647.0 - 1.0 AS w
       |  FROM (SELECT p.j, d.k FROM (SELECT unnest(range(0, $nbits)) AS j) p
       |        CROSS JOIN (SELECT unnest(range(0, 64)) AS k) d)),
       | pw AS (SELECT j, list(w ORDER BY k) AS pl FROM planes GROUP BY j),
       | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       | dots AS (SELECT e.vec_id, pw.j,
       |    list_sum(list_transform(range(1, 65), i -> e.emb[i] * pw.pl[i])) AS dp
       |  FROM e CROSS JOIN pw),
       | buck AS (SELECT d0.vec_id, e.emb,
       |    CAST(sum(CASE WHEN d0.dp >= 0 THEN (CAST(1 AS BIGINT) << d0.j) ELSE 0 END) AS BIGINT) AS b
       |  FROM dots d0 JOIN e ON e.vec_id = d0.vec_id GROUP BY d0.vec_id, e.emb)""".stripMargin

  private val baseOracleSql: Map[String, String] = Map(

    "rel_q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS count_order FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' GROUP BY 1, 2""".stripMargin,

    "rel_topk_window" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem) WHERE rk <= 3""".stripMargin,

    "rel_broadcast_join" ->
      """SELECT o_orderkey, c_name, n_name FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE n_regionkey = 1 AND o_totalprice > 4000.0""".stripMargin,

    "rel_skew_join" ->
      """SELECT o_orderstatus AS st, sum(l_quantity) AS sum_qty, count(*) AS n
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1""".stripMargin,

    "rel_events_window" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
        | min(value) AS vmin, max(value) AS vmax FROM events GROUP BY 1, 2""".stripMargin,

    "rel_events_sliding" ->
      """SELECT ws, event_type, count(*) AS n FROM (
        | SELECT unnest([date_trunc('hour', ts),
        |                date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
        |        event_type FROM events) GROUP BY 1, 2""".stripMargin,

    "ext_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        | FROM events""".stripMargin,

    "ext_prefix_roundtrip" ->
      """SELECT 'tpch:nation/' || n_nationkey AS compact,
        | 'http://example.org/tpch#nation/' || n_nationkey AS full,
        | 'tpch:nation/' || n_nationkey AS back
        | FROM nation""".stripMargin,

    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
        | FROM events GROUP BY 1, 2""".stripMargin,

    // streamed histogram ≡ batch histogram (linearity), so the oracle
    // is the batch grid-quantile query
    "stream_grid_quantiles" ->
      """WITH h AS (SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS cell,
        |   count(*) AS c FROM events GROUP BY 1, 2),
        | cm AS (SELECT g, cell, c,
        |   sum(c) OVER (PARTITION BY g ORDER BY cell
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(c) OVER (PARTITION BY g) AS n FROM h)
        | SELECT g, CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN cell END) AS BIGINT) AS p50_c,
        |   CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN cell END) AS BIGINT) AS p95_c,
        |   CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cell END) AS BIGINT) AS p99_c
        | FROM cm GROUP BY 1""".stripMargin,

    // streamed CMS cells ≡ batch cells (linearity + exhaustive
    // replay), so the oracle builds the sketch directly
    "stream_cms_counts" -> {
      val b = s"""${hash32On("sv")} % 32"""
      s"""WITH tok AS (SELECT event_type AS s FROM events),
        | ri AS (SELECT CAST(range AS VARCHAR) AS salt FROM range(4)),
        | tc AS (SELECT salt, salt || ':' || s AS sv FROM tok, ri),
        | cells AS (SELECT salt, $b AS bucket, count(*) AS cnt FROM tc GROUP BY 1, 2),
        | ex AS (SELECT DISTINCT event_type AS term FROM events),
        | pr AS (SELECT term, salt, $b AS bucket
        |   FROM (SELECT term, salt, salt || ':' || term AS sv FROM ex, ri))
        | SELECT term, CAST(min(cnt) AS BIGINT) AS est
        | FROM pr JOIN cells USING (salt, bucket) GROUP BY 1""".stripMargin
    },

    // append mode emits a window only once the watermark (max event
    // time − 1h) passes its END; the final still-open windows are
    // deterministically withheld — the oracle applies the same cutoff
    "stream_append_counts" ->
      """SELECT ws, event_type, n FROM (
        |  SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        | WHERE ws + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)""".stripMargin,

    "stream_session_counts" ->
      """WITH g AS (SELECT user_id, ts,
        |   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        > INTERVAL 30 MINUTE OR
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |   THEN 1 ELSE 0 END AS brk FROM events),
        | s AS (SELECT user_id, ts,
        |   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |     ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        | SELECT min(ts) AS ws, max(ts) + INTERVAL 30 MINUTE AS we,
        |   user_id, count(*) AS n FROM s GROUP BY user_id, sid""".stripMargin,

    "stream_dedup_counts" ->
      """SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY 1""".stripMargin,

    // custom state (flatMapGroupsWithState): one AvailableNow replay =
    // one data batch, so each user emits its final running aggregate
    // exactly once; ms-floor on both sides (Timestamp.getTime / epoch_ms)
    "stream_user_stats" ->
      """SELECT user_id, count(*) AS n,
        | epoch_ms(CAST(min(ts) AS TIMESTAMP)) AS first_ms,
        | epoch_ms(CAST(max(ts) AS TIMESTAMP)) AS last_ms
        | FROM events GROUP BY 1""".stripMargin,

    "stream_enrich_counts" ->
      """SELECT date_trunc('hour', ts) AS ws, c_mktsegment AS seg, count(*) AS n
        | FROM events JOIN customer ON user_id = c_custkey GROUP BY 1, 2""".stripMargin,

    "stream_stream_join" ->
      """SELECT p.event_id, p.ts AS p_ts, c.ts AS c_ts, c.value AS c_value
        | FROM events p JOIN events c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle — an independent
    // implementation of the same backward pick-latest semantics
    "rel_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts AS c_ts, arg_max(value, event_id) AS c_value
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        | SELECT p.event_id, p.user_id, p.ts, p.value, c.c_ts, c.c_value
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.ts""".stripMargin,

    // nearest-backward still wins; the CASE nulls it past tolerance
    "rel_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts AS c_ts, arg_max(value, event_id) AS c_value
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        | SELECT p.event_id, p.user_id, p.ts, p.value,
        |  CASE WHEN c.c_ts >= p.ts - INTERVAL 1 HOUR THEN c.c_ts END AS c_ts,
        |  CASE WHEN c.c_ts >= p.ts - INTERVAL 1 HOUR THEN c.c_value END
        |    AS c_value
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.ts""".stripMargin,

    "rel_asof_fwd" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts AS c_ts, arg_max(value, event_id) AS c_value
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        | SELECT p.event_id, p.user_id, p.ts, p.value, c.c_ts, c.c_value
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts >= p.ts""".stripMargin,

    "rel_range_join" ->
      """WITH c AS (SELECT ts, value FROM events WHERE event_type = 'click'),
        | w AS (SELECT event_id AS w_id, ts - INTERVAL 30 MINUTE AS w_start,
        |    ts AS w_end
        |  FROM events WHERE event_type = 'purchase' AND event_id % 13 = 0)
        | SELECT w_id, count(*) AS n_clicks,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
        | FROM c JOIN w ON c.ts >= w.w_start AND c.ts <= w.w_end
        | GROUP BY w_id""".stripMargin,

    "rel_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts AS c_ts, arg_max(value, event_id) AS c_value
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        | SELECT p.event_id, p.user_id, p.ts, p.value, c.c_ts, c.c_value
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_ts <= p.ts""".stripMargin,

    "dedup_canonical" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h,
        | count(*) AS n, min(doc_id) AS keep FROM documents GROUP BY 1""".stripMargin,

    "dedup_incremental" -> incrDedupSql,

    // identical content through the STREAMING ingest path (foreachBatch
    // per micro-batch vs the static corpus) - classification is
    // per-document against the corpus, so any batch split appends the
    // same total set and the batch oracle applies verbatim
    "stream_incr_dedup" -> incrDedupSql,



    "llm_pack_chunks" ->
      """WITH tk AS (SELECT doc_id, lang,
        |   len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
        | c AS (SELECT doc_id, lang, n_tokens,
        |   CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end FROM tk)
        | SELECT doc_id, lang, n_tokens,
        |  CAST(tok_end - n_tokens AS BIGINT) AS tok_start, tok_end,
        |  CAST((tok_end - n_tokens) // 512 AS BIGINT) AS chunk_first,
        |  CAST(greatest(tok_end - 1, tok_end - n_tokens) // 512 AS BIGINT)
        |    AS chunk_last,
        |  CAST(greatest(tok_end - 1, tok_end - n_tokens) // 512
        |    - (tok_end - n_tokens) // 512 + 1 AS BIGINT) AS n_chunks
        | FROM c""".stripMargin,

    "dedup_exact" ->
      "SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep FROM documents GROUP BY 1",

    "dedup_minhash_lsh" ->
      s"""WITH $minhashPairCtes
        | SELECT da, db, jaccard FROM pr""".stripMargin,

    // connected components over the verified pair graph: cluster id =
    // min doc_id reachable through near-dup edges (recursive closure on
    // the DuckDB side mirrors the engine's min-label propagation)
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairCtes,
        | edges AS (SELECT da, db FROM pr UNION SELECT db AS da, da AS db FROM pr),
        | reach(a, b) AS (
        |   SELECT da, db FROM edges
        |   UNION
        |   SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da)
        | SELECT d.doc_id,
        |   least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
        | FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        | GROUP BY d.doc_id""".stripMargin,

    // containment over the same banded candidates (the pr CTE's
    // jaccard filter is simply unused here)
    "dedup_containment" ->
      s"""WITH $minhashPairCtes
        | SELECT da, db, round(inter / uni, 6) AS jaccard,
        |   round(cont, 6) AS containment FROM (
        |  SELECT da, db,
        |   len(list_intersect(x.shs, y.shs)) * 1.0 AS inter,
        |   len(list_distinct(list_concat(x.shs, y.shs))) * 1.0 AS uni,
        |   len(list_intersect(x.shs, y.shs)) * 1.0
        |     / least(len(x.shs), len(y.shs)) AS cont
        |  FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db)
        | WHERE cont >= 0.7""".stripMargin,

    // EXACT-recall containment under the df ≤ 24 posting contract:
    // inverted-index candidates (a pair must share a rare shingle),
    // exact set verify, integer micro-ratio — replays
    // Dedup.containmentPairs stage for stage
    "dedup_containment_exact" ->
      s"""WITH sh AS (SELECT doc_id, $shSql AS shs FROM documents),
        | posts AS (SELECT doc_id, unnest(shs) AS g FROM sh),
        | df AS (SELECT g, count(*) AS df FROM posts GROUP BY 1),
        | rare AS (SELECT p.doc_id, p.g FROM posts p
        |   JOIN df USING (g) WHERE df.df <= 24),
        | cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        |   FROM rare x JOIN rare y ON x.g = y.g AND x.doc_id < y.doc_id),
        | sc AS (SELECT c.da, c.db,
        |   CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
        |   CAST(least(len(a.shs), len(b.shs)) AS BIGINT) AS n_small
        |  FROM cand c JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db)
        | SELECT da, db, inter, n_small,
        |   inter * 1000000 // n_small AS cont_micro
        | FROM sc WHERE inter * 1000000 // n_small >= 600000""".stripMargin,

    // cluster-granular split: the dedup_clusters recursive closure +
    // the salted cluster-id bucket hash (= Sampling.leakFreeSplit)
    "llm_split_leakfree" ->
      s"""WITH RECURSIVE $minhashPairCtes,
        | edges AS (SELECT da, db FROM pr UNION SELECT db AS da, da AS db FROM pr),
        | reach(a, b) AS (
        |   SELECT da, db FROM edges
        |   UNION
        |   SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
        | cl AS (SELECT d.doc_id,
        |   least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id),
        | bk AS (SELECT doc_id, cluster,
        |   ${hash32On("'csplit:' || CAST(cluster AS VARCHAR)")} % 100 AS bucket
        |  FROM cl)
        | SELECT doc_id, cluster, bucket, CASE WHEN bucket < 80 THEN 'train'
        |  WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM bk""".stripMargin,

    "dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS s FROM documents),
        | h AS (SELECT doc_id, $hash32Sql AS hv FROM tok),
        | bits AS (SELECT doc_id, b, ((hv >> b) % 2) * 2 - 1 AS sign
        |   FROM h, (SELECT unnest(range(0, 32)) AS b)),
        | sums AS (SELECT doc_id, b, sum(sign) AS sm FROM bits GROUP BY 1, 2)
        | SELECT doc_id, CAST(sum(CASE WHEN sm > 0 THEN (CAST(1 AS BIGINT) << b)
        |   ELSE 0 END) AS BIGINT) AS simhash FROM sums GROUP BY 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, $shSql AS shs FROM documents)
        | SELECT a.doc_id AS da, b.doc_id AS db,
        |  round(len(list_intersect(a.shs, b.shs)) * 1.0 /
        |    len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.shs, b.shs)) * 1.0 /
        |   len(list_distinct(list_concat(a.shs, b.shs))) >= 0.5""".stripMargin,

    // the prefix-filter join is EXACT (100% recall at the threshold), so
    // its oracle is the same brute all-pairs jaccard — identical answer,
    // different (scalable) plan on the Spark side
    "dedup_ngram_prefix" ->
      s"""WITH sh AS (SELECT doc_id, $shSql AS shs FROM documents)
        | SELECT a.doc_id AS da, b.doc_id AS db,
        |  round(len(list_intersect(a.shs, b.shs)) * 1.0 /
        |    len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.shs, b.shs)) * 1.0 /
        |   len(list_distinct(list_concat(a.shs, b.shs))) >= 0.5""".stripMargin,

    // duplicate 32-char windows at stride 16: a window is "dup" when its
    // hash occurs in ≥2 distinct documents (exact replay of Dedup.dupSpans)
    "dedup_spans" ->
      """WITH w AS (SELECT doc_id,
        |   unnest(range(1, length(text) - 31 + 1, 16)) AS pos, text
        |  FROM documents WHERE length(text) >= 32),
        | h AS (SELECT doc_id, md5(substr(text, CAST(pos AS INT), 32)) AS h FROM w),
        | dup AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |   FROM h GROUP BY 1) WHERE nd >= 2),
        | agg AS (SELECT doc_id, count(*) AS n_windows,
        |   CAST(sum(CASE WHEN h IN (SELECT h FROM dup) THEN 1 ELSE 0 END) AS BIGINT)
        |     AS n_dup_windows
        |  FROM h GROUP BY 1)
        | SELECT doc_id, n_windows, n_dup_windows,
        |  round(n_dup_windows * 1.0 / n_windows, 6) AS dup_ratio FROM agg""".stripMargin,

    "llm_contamination" ->
      s"""WITH sh AS (SELECT doc_id, $shSql AS shs FROM documents),
        | bench AS (SELECT DISTINCT unnest(shs) AS g FROM sh WHERE doc_id % 50 = 0),
        | ex AS (SELECT doc_id, unnest(shs) AS g FROM sh WHERE doc_id % 50 != 0),
        | hits AS (SELECT doc_id, count(*) AS n FROM ex JOIN bench USING (g) GROUP BY 1)
        | SELECT s.doc_id, len(s.shs) AS n_grams,
        |  coalesce(h.n, 0) AS n_contaminated,
        |  round(coalesce(h.n, 0) * 1.0 / len(s.shs), 6) AS ratio
        | FROM sh s LEFT JOIN hits h USING (doc_id)
        | WHERE s.doc_id % 50 != 0""".stripMargin,

    // detect → drop at the rounded-ratio threshold, rolled up per lang
    "llm_decontaminate" ->
      s"""WITH sh AS (SELECT doc_id, $shSql AS shs FROM documents),
        | bench AS (SELECT DISTINCT unnest(shs) AS g FROM sh WHERE doc_id % 50 = 0),
        | ex AS (SELECT doc_id, unnest(shs) AS g FROM sh WHERE doc_id % 50 != 0),
        | hits AS (SELECT doc_id, count(*) AS n FROM ex JOIN bench USING (g) GROUP BY 1),
        | rt AS (SELECT s.doc_id,
        |   round(coalesce(h.n, 0) * 1.0 / len(s.shs), 6) AS ratio
        |  FROM sh s LEFT JOIN hits h USING (doc_id)
        |  WHERE s.doc_id % 50 != 0)
        | SELECT d.lang,
        |  CAST(count_if(rt.ratio < 0.2) AS BIGINT) AS n_kept,
        |  CAST(count_if(rt.ratio >= 0.2) AS BIGINT) AS n_dropped
        | FROM rt JOIN documents d USING (doc_id) GROUP BY 1""".stripMargin,

    // OLS of ln(freq) on ln(rank) over the lexicographically
    // tie-broken top-1000 — both engines fit the same N points
    "text_zipf_fit" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |   FROM documents),
        | c AS (SELECT term, count(*) AS cnt FROM tok WHERE term <> ''
        |   GROUP BY 1),
        | top AS (SELECT term, cnt,
        |   row_number() OVER (ORDER BY cnt DESC, term) AS rank
        |  FROM c ORDER BY cnt DESC, term LIMIT 1000),
        | xy AS (SELECT ln(rank) AS x, ln(cnt) AS y FROM top),
        | s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |   sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        | SELECT CAST(n AS BIGINT) AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
        |    AS intercept
        | FROM s""".stripMargin,

    // u = value of first 8 md5 hex chars of doc_id / 2^32 (= Sampling.hashU)
    "llm_sample_stratified" ->
      """WITH u AS (SELECT doc_id, lang,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 AS u
        | FROM documents)
        | SELECT doc_id, lang FROM u
        | WHERE u < CASE lang WHEN 'en' THEN 0.1 WHEN 'zh' THEN 0.3 ELSE 0.5 END""".stripMargin,

    "llm_shard_export" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) % 8 AS shard,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens
        | FROM documents)
        | SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        | FROM t GROUP BY shard""".stripMargin,

    // A-ES: key = ln(u)/w rounded to 9 dp so both engines order the
    // same doubles; doc_id total-order tie-break
    "llm_sample_weighted" ->
      """WITH u AS (SELECT doc_id, lang, n_chars,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 AS u
        | FROM documents)
        | SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS w,
        |  round(ln(u) / n_chars, 9) AS skey
        | FROM u ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin,

    "text_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |  'u' || doc_id || '@ex.io 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |  || ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 ' || text AS t
        | FROM documents),
        | s1 AS (SELECT doc_id, t, regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM p),
        | s2 AS (SELECT doc_id, t, t1, regexp_replace(t1,
        |   '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS t2
        |  FROM s1)
        | SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS n_emails,
        |  len(regexp_extract_all(t1, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS n_phones,
        |  len(regexp_extract_all(t2, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |  md5(regexp_replace(t2,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS scrubbed_md5
        | FROM s2""".stripMargin,

    "dedup_embedding_nn" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
        |  FROM e a JOIN e b ON a.vec_id != b.vec_id),
        | nn AS (SELECT ia, ib, sim FROM (SELECT ia, ib, sim,
        |   row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn FROM sims)
        |  WHERE rn = 1)
        | SELECT x.ia AS da, x.ib AS db, round(x.sim, 6) AS sim
        | FROM nn x JOIN nn y ON x.ia = y.ib AND x.ib = y.ia
        | WHERE x.ia < x.ib""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH ${srpBuckSql(4)},
        | sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
        |  FROM buck a JOIN buck b
        |    ON bit_count(xor(a.b, b.b)) <= 1 AND a.vec_id != b.vec_id),
        | nn AS (SELECT ia, ib, sim FROM (SELECT ia, ib, sim,
        |   row_number() OVER (PARTITION BY ia ORDER BY sim DESC, ib) AS rn FROM sims)
        |  WHERE rn = 1)
        | SELECT x.ia AS da, x.ib AS db, round(x.sim, 6) AS sim
        | FROM nn x JOIN nn y ON x.ia = y.ib AND x.ib = y.ia
        | WHERE x.ia < x.ib""".stripMargin,

    // same a3 assignment CTEs as emb_kmeans, then within-cluster exact
    // cosine on the sq8 codes and the lower-id-wins drop rule
    "dedup_semantic" -> kmeansSql(
      """, cs AS (SELECT a.vec_id AS va, b.vec_id AS vb,
        |   CASE WHEN list_dot_product(a.qv, a.qv) = 0
        |          OR list_dot_product(b.qv, b.qv) = 0 THEN 0.0
        |     ELSE list_dot_product(a.qv, b.qv) /
        |       (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv)))
        |   END AS cos
        |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        | dup AS (SELECT DISTINCT vb FROM cs WHERE cos >= 0.40)
        | SELECT a3.vec_id, a3.cid AS cluster, (dup.vb IS NULL) AS kept
        | FROM a3 LEFT JOIN dup ON a3.vec_id = dup.vb""".stripMargin),

    // range search: identical candidate generation, sim filter
    // instead of the row_number cut
    "sim_range_lsh" ->
      s"""WITH ${srpBuckSql(6)}
        | SELECT q, cand, round(sim, 6) AS sim FROM (
        |  SELECT a.vec_id AS q, b.vec_id AS cand,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim
        |  FROM buck a JOIN buck b
        |    ON bit_count(xor(a.b, b.b)) <= 1 AND a.vec_id < 10 AND a.vec_id != b.vec_id)
        | WHERE sim >= 0.25""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH ${srpBuckSql(6)}
        | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
        |  SELECT a.vec_id AS q, b.vec_id AS cand,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim,
        |   row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |     list_dot_product(a.emb, b.emb) /
        |       (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) DESC,
        |     b.vec_id) AS rank
        |  FROM buck a JOIN buck b
        |    ON bit_count(xor(a.b, b.b)) <= 1 AND a.vec_id < 10 AND a.vec_id != b.vec_id)
        | WHERE rank <= 5""".stripMargin,

    "sim_topk_brute" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
        |  SELECT a.vec_id AS q, b.vec_id AS cand,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim,
        |   row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |     list_dot_product(a.emb, b.emb) /
        |       (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) DESC,
        |     b.vec_id) AS rank
        |  FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id)
        | WHERE rank <= 5""".stripMargin,

    // MMR: pool + pairwise sims in integer micro-cosine, then the 5
    // greedy steps unrolled as CTEs (sel_i accumulates the picks;
    // every argmax is an exact integer comparison — same units as the
    // engine). Cosine is unguarded like sim_topk_brute (matches
    // GraftFunctions.cosine).
    "sim_topk_mmr" -> {
      def cosU(a: String, b: String) =
        s"""CAST(round(list_dot_product($a, $b) /
           |  (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
           |  * 1000000.0::DOUBLE, 0) AS BIGINT)""".stripMargin
      def step(i: Int): String =
        s""", s$i AS MATERIALIZED (
           |  SELECT q, cand, CAST($i AS BIGINT) AS step,
           |    7 * sim_u - 3 * mp AS mmr_u
           |  FROM (SELECT r.q, r.cand, r.sim_u, max(p.psim_u) AS mp
           |   FROM cand r
           |   JOIN pr p ON p.q = r.q AND p.ca = r.cand
           |   JOIN sel${i - 1} s ON s.q = p.q AND s.cand = p.cb
           |   WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
           |     WHERE x.q = r.q AND x.cand = r.cand)
           |   GROUP BY r.q, r.cand, r.sim_u) t
           |  QUALIFY row_number() OVER (PARTITION BY q
           |    ORDER BY 7 * sim_u - 3 * mp DESC, cand) = 1),
           | sel$i AS (SELECT q, cand FROM sel${i - 1}
           |  UNION ALL SELECT q, cand FROM s$i)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | c0 AS (SELECT a.vec_id AS q, b.vec_id AS cand, b.emb AS ce,
        |    ${cosU("a.emb", "b.emb")} AS sim_u
        |   FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id),
        | cand AS MATERIALIZED (SELECT q, cand, ce, sim_u FROM c0
        |   QUALIFY row_number() OVER (PARTITION BY q ORDER BY sim_u DESC, cand) <= 20),
        | pr AS MATERIALIZED (SELECT a.q, a.cand AS ca, b.cand AS cb,
        |    ${cosU("a.ce", "b.ce")} AS psim_u
        |   FROM cand a JOIN cand b ON a.q = b.q AND a.cand != b.cand),
        | s1 AS MATERIALIZED (SELECT q, cand, CAST(1 AS BIGINT) AS step,
        |    7 * sim_u AS mmr_u FROM cand
        |   QUALIFY row_number() OVER (PARTITION BY q ORDER BY sim_u DESC, cand) = 1),
        | sel1 AS (SELECT q, cand FROM s1)
        | ${(2 to 5).map(step).mkString("\n")}
        | ${(1 to 5).map(i => s"SELECT q, cand, step, mmr_u FROM s$i")
            .mkString(" UNION ALL ")}""".stripMargin
    },

    "sim_topk_sq8" ->
      s"""WITH e AS (SELECT vec_id,
        |   list_transform(CAST(embedding AS DOUBLE[]),
        |     x -> greatest(-128, least(127, floor(x * 256)))) AS emb
        |  FROM embeddings)
        | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
        |  SELECT a.vec_id AS q, b.vec_id AS cand,
        |   CASE WHEN list_dot_product(a.emb, a.emb) = 0
        |          OR list_dot_product(b.emb, b.emb) = 0 THEN 0.0
        |    ELSE list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
        |   END AS sim,
        |   row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |     CASE WHEN list_dot_product(a.emb, a.emb) = 0
        |            OR list_dot_product(b.emb, b.emb) = 0 THEN 0.0
        |      ELSE list_dot_product(a.emb, b.emb) /
        |       (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
        |     END DESC,
        |     b.vec_id) AS rank
        |  FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id)
        | WHERE rank <= 5""".stripMargin,

    "sim_topk_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | cents AS (SELECT label AS cell, arg_min(emb, vec_id) AS cemb FROM e GROUP BY label),
        | assign AS (SELECT vec_id, emb, cell FROM (
        |   SELECT e.vec_id, e.emb, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.emb, c.cemb) /
        |        (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
        |      c.cell) AS rn
        |   FROM e CROSS JOIN cents c) WHERE rn = 1),
        | probed AS (SELECT q, qe, cell FROM (
        |   SELECT e.vec_id AS q, e.emb AS qe, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.emb, c.cemb) /
        |        (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
        |      c.cell) AS rn
        |   FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE rn <= 2)
        | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
        |  SELECT p.q, a.vec_id AS cand,
        |   list_dot_product(p.qe, a.emb) /
        |     (sqrt(list_dot_product(p.qe, p.qe)) * sqrt(list_dot_product(a.emb, a.emb))) AS sim,
        |   row_number() OVER (PARTITION BY p.q ORDER BY
        |     list_dot_product(p.qe, a.emb) /
        |       (sqrt(list_dot_product(p.qe, p.qe)) * sqrt(list_dot_product(a.emb, a.emb))) DESC,
        |     a.vec_id) AS rank
        |  FROM probed p JOIN assign a ON p.cell = a.cell AND p.q != a.vec_id)
        | WHERE rank <= 5""".stripMargin,

    "mm_decode_meta" ->
      s"""WITH h AS (SELECT doc_id, CAST(strlen(s) AS BIGINT) AS n_bytes,
        |   $hash32Sql AS hv
        |  FROM (SELECT doc_id, text AS s FROM documents))
        | SELECT doc_id, n_bytes, 640 + hv % 1280 AS width,
        |  480 + (hv // 1280) % 720 AS height, 'fake/rgb8' AS format
        | FROM h""".stripMargin,

    // real-codec check: decoded dims must equal the generator's
    // closed form — if ImageIO mis-parsed (or the stub leaked in via
    // the fallback) width/height/format all diverge
    "mm_decode_png" ->
      """SELECT doc_id, 1 + doc_id % 64 AS width, 1 + doc_id % 48 AS height,
        | 'image/png' AS format FROM documents""".stripMargin,

    // every thumbnail pixel replayed: source pixel (⌊X·w/8⌋,⌊Y·h/6⌋),
    // rgb = (id·2654435761 + sx·31 + sy) mod 2²⁴ (the generator's
    // raster), order-weighted sum — one wrong pixel anywhere diverges
    "mm_resize_thumb" ->
      """WITH px AS (SELECT doc_id, rx.x AS x, ry.y AS y,
        |   (rx.x * (1 + doc_id % 64)) // 8 AS sx,
        |   (ry.y * (1 + doc_id % 48)) // 6 AS sy
        |  FROM documents CROSS JOIN range(8) rx(x) CROSS JOIN range(6) ry(y))
        | SELECT doc_id, 1 + doc_id % 64 AS src_w, 1 + doc_id % 48 AS src_h,
        |  CAST(8 AS BIGINT) AS thumb_w, CAST(6 AS BIGINT) AS thumb_h,
        |  CAST(sum(((doc_id * 2654435761 + sx * 31 + sy) % 16777216)
        |    * (x + 8 * y + 1)) AS BIGINT) AS checksum
        | FROM px GROUP BY 1""".stripMargin,

    // real-audio check: decoded frame count / sample rate / byte size
    // must equal the PCM generator's closed form
    "mm_decode_wav" ->
      """SELECT doc_id,
        | 44 + (100 + doc_id % 400) * (1 + doc_id % 2) * 2 AS n_bytes,
        | 100 + doc_id % 400 AS width, 8000 AS height,
        | 'audio/wav' AS format FROM documents""".stripMargin,

    // real-container check: every parsed box field must equal the
    // generator's closed form — a mis-walked box (wrong offset, fixed-
    // point slip, wrong clock) diverges some column for some doc_id
    "mm_decode_mp4" ->
      """SELECT doc_id, 272 AS n_bytes, 1000 AS timescale,
        | 1000 + doc_id % 9000 AS duration,
        | 320 + doc_id % 1280 AS width, 240 + doc_id % 720 AS height,
        | 48000 AS media_timescale,
        | (1000 + doc_id % 9000) * 48 AS media_duration,
        | 'video/mp4' AS format FROM documents""".stripMargin,

    // RIFF walk + real frame decode: header fields, movi chunk count,
    // ImageIO decode-success count, and the frames' own SOF dims must
    // all equal the generator's closed form
    "mm_decode_avi" ->
      """SELECT doc_id, 1 + doc_id % 3 AS n_frames, 25 AS fps,
        | 16 + doc_id % 16 AS width, 16 + doc_id % 8 AS height,
        | 1 + doc_id % 3 AS frames_found, 1 + doc_id % 3 AS frames_decoded,
        | 16 + doc_id % 16 AS frame_w, 16 + doc_id % 8 AS frame_h,
        | 'video/avi' AS format FROM documents""".stripMargin,

    // animated-GIF check: frame count, dims, frame-0 delay and the
    // full per-pixel fold (solid frames × closed-form colors) must
    // equal the generator's closed form — a palette-lossy or faked
    // frame decode diverges in px_sum
    "mm_decode_gif_anim" ->
      """WITH fr AS (SELECT doc_id, f FROM documents,
        |   (SELECT unnest(range(0, 4)) AS f) WHERE f < 1 + doc_id % 4),
        | px AS (SELECT doc_id, sum(((doc_id*37 + f*11) % 256)
        |     + ((doc_id*59 + f*17) % 256)
        |     + ((doc_id*83 + f*23) % 256)) AS csum
        |   FROM fr GROUP BY doc_id)
        | SELECT d.doc_id, 1 + d.doc_id % 4 AS n_frames,
        |  8 + d.doc_id % 8 AS width, 8 + d.doc_id % 4 AS height,
        |  4 + d.doc_id % 6 AS delay_cs, 1 + d.doc_id % 4 AS frames_decoded,
        |  (8 + d.doc_id % 8) * (8 + d.doc_id % 4) * px.csum AS px_sum,
        |  'image/gif-anim' AS format
        | FROM documents d JOIN px ON d.doc_id = px.doc_id""".stripMargin,

    // multi-page TIFF check: page count, dims and the full per-pixel
    // fold (solid RGB pages × closed-form colors) must equal the
    // generator's closed form — direct sample storage, lossless
    "mm_decode_tiff" ->
      """WITH pg AS (SELECT doc_id, p FROM documents,
        |   (SELECT unnest(range(0, 3)) AS p) WHERE p < 1 + doc_id % 3),
        | px AS (SELECT doc_id, sum(((doc_id*29 + p*13) % 256)
        |     + ((doc_id*47 + p*19) % 256)
        |     + ((doc_id*71 + p*31) % 256)) AS csum
        |   FROM pg GROUP BY doc_id)
        | SELECT d.doc_id, 1 + d.doc_id % 3 AS n_pages,
        |  6 + d.doc_id % 6 AS width, 6 + d.doc_id % 3 AS height,
        |  1 + d.doc_id % 3 AS pages_decoded,
        |  (6 + d.doc_id % 6) * (6 + d.doc_id % 3) * px.csum AS px_sum,
        |  'image/tiff' AS format
        | FROM documents d JOIN px ON d.doc_id = px.doc_id""".stripMargin,

    // EBML walk check: every parsed element must equal the generator's
    // closed form (duration is a float64 written with an integral
    // value, so the rounded read-back is exact)
    "mm_decode_mkv" ->
      """SELECT doc_id, 61 AS n_bytes, 1000000 AS timescale_ns,
        | 1000 + doc_id % 9000 AS duration_units,
        | 320 + doc_id % 1280 AS width, 240 + doc_id % 720 AS height,
        | 'video/webm' AS format FROM documents""".stripMargin,

    "mm_frames" ->
      """SELECT doc_id, unnest(range(0, CAST(strlen(text) AS BIGINT), 64))
        | AS frame_offset FROM documents""".stripMargin,

    // feature-extraction stub replay: feature j = first-8-hex value of
    // md5(payload || ':' || j), scaled to [0,1)
    "mm_features" ->
      s"""WITH f AS (SELECT doc_id, j, text || ':' || CAST(j AS VARCHAR) AS s
        |  FROM documents, (SELECT unnest(range(0, 8)) AS j))
        | SELECT doc_id, j, round($hash32Sql / 4294967296.0, 6) AS v
        | FROM f""".stripMargin,

    // grid quantiles: integer ⌈q·n⌉ thresholds over the cumulative
    // centi-unit histogram
    "sketch_grid_quantiles" ->
      """WITH h AS (SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS cell,
        |   count(*) AS c FROM events GROUP BY 1, 2),
        | cm AS (SELECT g, cell, c,
        |   sum(c) OVER (PARTITION BY g ORDER BY cell
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(c) OVER (PARTITION BY g) AS n FROM h)
        | SELECT g, CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN cell END) AS BIGINT) AS p50_c,
        |   CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN cell END) AS BIGINT) AS p95_c,
        |   CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cell END) AS BIGINT) AS p99_c
        | FROM cm GROUP BY 1""".stripMargin,

    // media-embedding ANN: the mm_features vectors (rounded 6dp before
    // assembly) under the sim_topk_brute cosine/rank protocol
    "mm_embed_topk" ->
      s"""WITH f AS (SELECT doc_id, j, text || ':' || CAST(j AS VARCHAR) AS s
        |  FROM documents, (SELECT unnest(range(0, 8)) AS j)),
        | fv AS (SELECT doc_id, j, round($hash32Sql / 4294967296.0, 6) AS v FROM f),
        | e AS (SELECT doc_id AS vec_id, list(v ORDER BY j) AS emb FROM fv GROUP BY 1)
        | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
        |  SELECT a.vec_id AS q, b.vec_id AS cand,
        |   list_dot_product(a.emb, b.emb) /
        |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim,
        |   row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |     list_dot_product(a.emb, b.emb) /
        |       (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) DESC,
        |     b.vec_id) AS rank
        |  FROM e a JOIN e b ON a.vec_id < 5 AND a.vec_id != b.vec_id)
        | WHERE rank <= 5""".stripMargin,

    "llm_pipeline_clean" -> (pipelineCleanCtes +
      """ SELECT e.doc_id, q.stop_ratio, q.mean_tok_len
        | FROM ek e JOIN q USING (doc_id)
        | WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin),

    // pipeline v2: survivors → deterministic holdout split → the
    // per-split doc/token accounting a training run consumes
    "llm_pipeline_v2" -> (pipelineCleanCtes +
      s""", surv AS (SELECT e.doc_id, e.text FROM ek e
        |  WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)),
        | sp AS (SELECT doc_id, text,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5('split:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) % 100 AS bucket FROM surv)
        | SELECT CASE WHEN bucket < 80 THEN 'train'
        |   WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
        | FROM sp GROUP BY 1""".stripMargin),

    // v4: the contamination CTEs (c-prefixed to avoid colliding with
    // the clean chain's sh) gate the corpus, then the v1 body runs
    // over the decontaminated relation, then the per-lang rollup
    "llm_pipeline_v4" ->
      (s"""WITH csh AS (SELECT doc_id, $shSql AS shs FROM documents),
        | cbench AS (SELECT DISTINCT unnest(shs) AS g FROM csh
        |   WHERE doc_id % 50 = 0),
        | cex AS (SELECT doc_id, unnest(shs) AS g FROM csh
        |   WHERE doc_id % 50 != 0),
        | chits AS (SELECT doc_id, count(*) AS n FROM cex JOIN cbench
        |   USING (g) GROUP BY 1),
        | crt AS (SELECT s.doc_id,
        |   round(coalesce(h.n, 0) * 1.0 / len(s.shs), 6) AS ratio
        |  FROM csh s LEFT JOIN chits h USING (doc_id)
        |  WHERE s.doc_id % 50 != 0),
        | dd AS (SELECT d.doc_id, d.text, d.lang FROM documents d
        |  JOIN crt USING (doc_id) WHERE crt.ratio < 0.2),
        | """.stripMargin + pipelineCleanBody("dd") +
      s""",
        | surv AS (SELECT e.doc_id FROM ek e
        |  WHERE e.doc_id NOT IN (SELECT doc_id FROM losers))
        | SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
        | FROM surv JOIN documents d USING (doc_id) GROUP BY 1""".stripMargin),

    // v5: canonical-URL dedup (min doc per canon) → exact-containment
    // dedup (df ≤ 24 posting contract, higher doc_id of a pair drops)
    // → quality gate → per-lang accounting — every stage's CTE is its
    // standalone oracle's, composed
    "llm_pipeline_v5" ->
      s"""WITH cu AS (SELECT min(doc_id) AS doc_id FROM (
        |   SELECT doc_id,
        |    'https://example.com/doc/' || (doc_id % 40) || '?a=1&b=2' AS canon
        |   FROM documents) GROUP BY canon),
        | d1 AS (SELECT d.doc_id, d.text, d.lang
        |   FROM documents d JOIN cu USING (doc_id)),
        | shv AS (SELECT doc_id, $shSql AS shs FROM d1),
        | pv AS (SELECT doc_id, unnest(shs) AS g FROM shv),
        | dfv AS (SELECT g, count(*) AS df FROM pv GROUP BY 1),
        | rv AS (SELECT p.doc_id, p.g FROM pv p JOIN dfv USING (g)
        |   WHERE dfv.df <= 24),
        | cv AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        |   FROM rv x JOIN rv y ON x.g = y.g AND x.doc_id < y.doc_id),
        | dropv AS (SELECT DISTINCT c.db AS doc_id FROM cv c
        |   JOIN shv a ON a.doc_id = c.da JOIN shv b ON b.doc_id = c.db
        |   WHERE CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) * 1000000
        |     // least(len(a.shs), len(b.shs)) >= 600000),
        | d2 AS (SELECT * FROM d1
        |   WHERE doc_id NOT IN (SELECT doc_id FROM dropv)),
        | qv AS (SELECT doc_id,
        |   round(len(list_filter($toksSql, x -> list_contains(
        |     ['the','a','of','and','to','in','is','it'], x))) * 1.0 / len($toksSql), 6)
        |     AS stop_ratio,
        |   round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
        |     / len($toksSql), 6) AS mean_tok_len
        |  FROM d2),
        | g2 AS (SELECT d.doc_id, d.text, d.lang FROM d2 d JOIN qv USING (doc_id)
        |  WHERE qv.stop_ratio <= 0.5 AND qv.mean_tok_len >= 2.0)
        | SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
        | FROM g2 GROUP BY 1""".stripMargin,

    // v3: quality gate → CDC span-strip rewrite → cluster-granular
    // split → per-split accounting; fully-duplicated docs vanish
    "llm_pipeline_v3" ->
      s"""WITH RECURSIVE q AS (SELECT doc_id,
        |   round(len(list_filter($toksSql, x -> list_contains(
        |     ['the','a','of','and','to','in','is','it'], x))) * 1.0 / len($toksSql), 6)
        |     AS stop_ratio,
        |   round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
        |     / len($toksSql), 6) AS mean_tok_len
        |  FROM documents),
        | gated AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
        |  WHERE q.stop_ratio <= 0.5 AND q.mean_tok_len >= 2.0),
        | ${cdcChunkCtesFrom("gated")},
        | fo AS (SELECT doc_id, chunk, n_tok, ctext, row_number() OVER (
        |     PARTITION BY ch ORDER BY doc_id, chunk) AS rn FROM cc),
        | rw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks_kept,
        |   CAST(sum(n_tok) AS BIGINT) AS n_tok_clean
        |  FROM fo WHERE rn = 1 GROUP BY doc_id),
        | ${minhashPairCtesFrom("gated")},
        | edges AS (SELECT da, db FROM pr UNION SELECT db AS da, da AS db FROM pr),
        | reach(a, b) AS (
        |   SELECT da, db FROM edges
        |   UNION
        |   SELECT r.a, e.db FROM reach r JOIN edges e ON r.b = e.da),
        | cl AS (SELECT g.doc_id,
        |   least(g.doc_id, coalesce(min(r.b), g.doc_id)) AS cluster
        |  FROM gated g LEFT JOIN reach r ON r.a = g.doc_id
        |  GROUP BY g.doc_id),
        | sp AS (SELECT doc_id,
        |   ${hash32On("'csplit:' || CAST(cluster AS VARCHAR)")} % 100 AS bucket
        |  FROM cl)
        | SELECT CASE WHEN bucket < 80 THEN 'train'
        |   WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chunks_kept) AS BIGINT) AS n_chunks,
        |  CAST(sum(n_tok_clean) AS BIGINT) AS n_tokens_clean
        | FROM rw JOIN sp USING (doc_id) GROUP BY 1""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id, len($toksSql) AS n_tokens,
        | len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))
        |   AS n_bpe_tokens,
        | length(text) AS n_chars FROM documents""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
        | round(len(list_filter($toksSql, x -> list_contains(
        |   ['the','a','of','and','to','in','is','it'], x))) * 1.0 / len($toksSql), 6)
        |   AS stop_ratio,
        | round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
        |   / len($toksSql), 6) AS mean_tok_len,
        | round(len(list_distinct($toksSql)) * 1.0 / len($toksSql), 6) AS ttr
        | FROM documents""".stripMargin,

    // same exact regex counts, same left-associated float formula
    "text_readability" ->
      s"""WITH c AS (SELECT doc_id,
        |  CAST(len($toksSql) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |    AS n_sentences
        | FROM documents)
        | SELECT doc_id, n_words, n_syllables, n_sentences,
        |  CASE WHEN n_words = 0 THEN 0.0 ELSE
        |   round(206.835
        |     - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |     - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 4)
        |  END AS flesch
        | FROM c""".stripMargin,

    // keep decided from the same ROUNDED stats in both engines
    "text_c4_filters" ->
      s"""WITH st AS (SELECT doc_id,
        |   CAST(len($toksSql) AS BIGINT) AS n_words,
        |   CASE WHEN len($toksSql) = 0 THEN 0.0 ELSE
        |    round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
        |     / len($toksSql), 6) END AS mean_word_len,
        |   CASE WHEN len($toksSql) = 0 THEN 0.0 ELSE
        |    round(len(list_filter($toksSql, x -> regexp_matches(x, '[A-Za-z]')))
        |     * 1.0 / len($toksSql), 6) END AS alpha_frac,
        |   (contains(text, '{') OR contains(lower(text), 'lorem ipsum'))
        |     AS flagged
        |  FROM documents)
        | SELECT doc_id, n_words, mean_word_len, alpha_frac, flagged,
        |  (n_words BETWEEN 50 AND 100000
        |   AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND alpha_frac > 0.8 AND NOT flagged) AS keep
        | FROM st""".stripMargin,

    // streaming replay must be row-identical to the batch rule bundle
    "stream_c4_filters" ->
      s"""WITH st AS (SELECT doc_id,
        |   CAST(len($toksSql) AS BIGINT) AS n_words,
        |   CASE WHEN len($toksSql) = 0 THEN 0.0 ELSE
        |    round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
        |     / len($toksSql), 6) END AS mean_word_len,
        |   CASE WHEN len($toksSql) = 0 THEN 0.0 ELSE
        |    round(len(list_filter($toksSql, x -> regexp_matches(x, '[A-Za-z]')))
        |     * 1.0 / len($toksSql), 6) END AS alpha_frac,
        |   (contains(text, '{') OR contains(lower(text), 'lorem ipsum'))
        |     AS flagged
        |  FROM documents)
        | SELECT doc_id, n_words, mean_word_len, alpha_frac, flagged,
        |  (n_words BETWEEN 50 AND 100000
        |   AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND alpha_frac > 0.8 AND NOT flagged) AS keep
        | FROM st""".stripMargin,

    "text_langid" ->
      """WITH sc AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> list_contains(['the','a','of'], x))) AS se,
        |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> list_contains(['el','la','de'], x))) AS ss,
        |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> list_contains(['der','die','das'], x))) AS sd
        | FROM documents)
        | SELECT doc_id, CASE WHEN se >= ss AND se >= sd THEN 'en'
        |   WHEN ss >= sd THEN 'es' ELSE 'de' END AS pred_lang,
        |  se AS score_en FROM sc""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string(list_sort(list_distinct($toksSql)), ' '))
        | AS fp FROM documents""".stripMargin,

    // duplicate-3-gram fraction needs the NON-distinct shingle list
    "text_repetition" ->
      s"""WITH sh AS (SELECT doc_id,
        |  CASE WHEN len($toksSql) < 3 THEN [array_to_string($toksSql, ' ')]
        |   ELSE list_transform(range(1, len($toksSql) - 1),
        |     i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2]) END AS shs
        |  FROM documents)
        | SELECT doc_id, round(1.0 - len(list_distinct(shs)) * 1.0 / len(shs), 6)
        |  AS dup_3gram_ratio FROM sh""".stripMargin,

    "text_len_quantiles" ->
      """SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
        | quantile_cont(n_chars, 0.9) AS p90, count(*) AS n
        | FROM documents GROUP BY 1""".stripMargin,

    // exact epoch-microsecond gap rule, (ts, event_id) total order —
    // mirrors operators.Sessionize.sessions
    "rel_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        | g AS (SELECT user_id, ts, us, CASE WHEN
        |    lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       > 1800000000 THEN 1 ELSE 0 END AS brk,
        |   event_id FROM e),
        | s AS (SELECT user_id, ts, us, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g)
        | SELECT user_id, sid, count(*) AS n_events, min(ts) AS start_ts,
        |  max(us) - min(us) AS dur_us
        | FROM s GROUP BY user_id, sid""".stripMargin,

    // plain overlap-join oracle (DuckDB IEJoins it); the engine's
    // binned+ownership plan must produce the identical pair set
    "rel_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_us(ts) AS a_s,
        |   epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS a_e
        |  FROM events WHERE event_type = 'click'),
        | b AS (SELECT event_id AS b_id, epoch_us(ts) AS b_s,
        |   epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS b_e
        |  FROM events WHERE event_type = 'error')
        | SELECT a_id AS event_id, count(*) AS n_overlap
        | FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        | GROUP BY a_id""".stripMargin,

    // salted md5 bucket mod 100 (= Sampling.trainValTest)
    "llm_split" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5('split:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) % 100 AS bucket
        | FROM documents)
        | SELECT doc_id, bucket, CASE WHEN bucket < 80 THEN 'train'
        |  WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b""".stripMargin,

    // supply per source → rate = min(1, cap/supply) → salted
    // hash-threshold keep (= Sampling.mixToBudget)
    "llm_mix_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        | s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        |  FROM t GROUP BY source),
        | r AS (SELECT source, src_tokens, least(1.0,
        |   (CASE source WHEN 'src0' THEN 6000.0 WHEN 'src1' THEN 1500.0
        |    ELSE 3000.0 END) / src_tokens) AS rate FROM s),
        | k AS (SELECT t.source, t.n_tokens, r.src_tokens, r.rate
        |  FROM t JOIN r USING (source)
        |  WHERE CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5('mix:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 < r.rate)
        | SELECT source, min(src_tokens) AS src_tokens, round(min(rate), 9) AS rate,
        |  count(*) AS n_sel, CAST(sum(n_tokens) AS BIGINT) AS sel_tokens
        | FROM k GROUP BY source""".stripMargin,

    "emb_kmeans" -> kmeansSql("SELECT vec_id, cid AS cluster FROM a3"),

    "emb_pq_encode" -> pqSql(
      "SELECT vec_id, " + (0 until 8).map(s => s"c$s").mkString(", ") + " FROM enc"),

    "sim_topk_pq" -> pqSql(pqAdcSelect()),
    "sim_topk_ivfpq" -> ivfpqSql(),

    // URL canon: the canonical closed form per doc — any missed
    // normalization (case, port, utm, order, fragment) splits a group
    "llm_url_canon" ->
      """WITH c AS (SELECT doc_id,
        |   'https://example.com/doc/' || (doc_id % 40) || '?a=1&b=2' AS canon
        |  FROM documents)
        | SELECT canon AS canon_url, count(*) AS n_dups,
        |   min(doc_id) AS min_doc_id
        | FROM c GROUP BY 1""".stripMargin,

    // streaming twin: count and min are linear in the arrival split,
    // so the final running aggregate equals the batch table exactly
    "stream_url_canon" ->
      """WITH c AS (SELECT doc_id,
        |   'https://example.com/doc/' || (doc_id % 40) || '?a=1&b=2' AS canon
        |  FROM documents)
        | SELECT canon AS canon_url, count(*) AS n_dups,
        |   min(doc_id) AS min_doc_id
        | FROM c GROUP BY 1""".stripMargin,

    // greedy k-center (k=4): c1 = lowest vec_id, then 3 unrolled
    // farthest-point rounds; md chains as a CASE running min in
    // center order — exact integers, so argmax/ties replay identically
    "llm_coreset_kcenter" -> {
      def d(q: String, c: String) = kmDistSql(q, c)
      s"""WITH q AS (SELECT vec_id, $sq8QvSql AS qv FROM embeddings),
        | c1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
        | m1 AS (SELECT q.vec_id, q.qv, ${d("q.qv", "c.qv")} AS md
        |   FROM q, c1 c),
        | c2 AS (SELECT vec_id, qv, md FROM m1 ORDER BY md DESC, vec_id LIMIT 1),
        | m2 AS (SELECT m.vec_id, m.qv,
        |   CASE WHEN ${d("m.qv", "c.qv")} < m.md
        |        THEN ${d("m.qv", "c.qv")} ELSE m.md END AS md
        |   FROM m1 m, c2 c),
        | c3 AS (SELECT vec_id, qv, md FROM m2 ORDER BY md DESC, vec_id LIMIT 1),
        | m3 AS (SELECT m.vec_id, m.qv,
        |   CASE WHEN ${d("m.qv", "c.qv")} < m.md
        |        THEN ${d("m.qv", "c.qv")} ELSE m.md END AS md
        |   FROM m2 m, c3 c),
        | c4 AS (SELECT vec_id, qv, md FROM m3 ORDER BY md DESC, vec_id LIMIT 1)
        | SELECT CAST(1 AS BIGINT) AS rank, vec_id, 0.0 AS dist FROM c1
        | UNION ALL SELECT 2, vec_id, md FROM c2
        | UNION ALL SELECT 3, vec_id, md FROM c3
        | UNION ALL SELECT 4, vec_id, md FROM c4""".stripMargin
    },

    "llm_sample_diverse" -> kmeansSql(
      """SELECT cid AS cluster, vec_id,
        | CAST(row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS BIGINT) AS rank
        | FROM a3 QUALIFY rank <= 3""".stripMargin),

    // KMV: 32 smallest distinct hashes per lang; kth value → estimate
    "sketch_kmv_distinct" ->
      """WITH u AS (SELECT DISTINCT lang AS g,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 AS u
        | FROM documents),
        | r AS (SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn
        |  FROM u QUALIFY rn <= 32),
        | a AS (SELECT g, count(*) AS nd, max(CASE WHEN rn = 32 THEN u END) AS uk
        |  FROM r GROUP BY g)
        | SELECT g AS lang, CASE WHEN nd < 32 THEN CAST(nd AS DOUBLE)
        |  ELSE round(31.0 / uk, 6) END AS est_distinct FROM a""".stripMargin,

    "graph_pagerank" -> pagerankSql(iters = 3),

    // truncated Katz: integer damped walk counts, 3 unrolled rounds
    "graph_katz" -> katzSql(3),

    // reciprocity: reversed-pair EXISTS count over the same edge set
    "graph_reciprocity" ->
      """WITH e AS (SELECT DISTINCT * FROM (
        |   SELECT 'c:'||o_custkey AS src, 'o:'||o_orderkey AS dst FROM orders
        |   UNION ALL SELECT 'o:'||o_orderkey, 'c:'||o_custkey
        |    FROM orders WHERE o_orderkey % 3 = 0)),
        | r AS (SELECT count(*) AS n_recip FROM e
        |   WHERE EXISTS (SELECT 1 FROM e e2
        |     WHERE e2.src = e.dst AND e2.dst = e.src)),
        | n AS (SELECT count(*) AS n_edges FROM e)
        | SELECT n.n_edges, r.n_recip,
        |   n_recip * 1000000 // n_edges AS recip_micro FROM n, r""".stripMargin,

    // truncated HITS: 2 unrolled (hub, auth) half-step pairs, integer
    // damping div 4 — same edge CTE as katz
    "graph_hits" -> hitsSql(2),

    // resource allocation: common_neighbors' CTE shape with each
    // qualifying center contributing 1e6 // deg(center) micro-units
    "graph_resource_alloc" ->
      """WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |   FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | adj AS (SELECT a AS v, b AS n FROM e0
        |   UNION ALL SELECT b AS v, a AS n FROM e0),
        | deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY 1),
        | ctr AS (SELECT adj.v, adj.n, 1000000 // d.deg AS w
        |   FROM adj JOIN deg d ON d.v = adj.n WHERE d.deg <= 40),
        | pairs AS (SELECT x.v AS a, y.v AS b,
        |   CAST(count(*) AS BIGINT) AS common,
        |   CAST(sum(x.w) AS BIGINT) AS ra_micro
        |  FROM ctr x JOIN ctr y ON x.n = y.n AND x.v < y.v
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        | SELECT a, b, common, ra_micro FROM pairs
        | ORDER BY ra_micro DESC, a, b LIMIT 20""".stripMargin,

    // DAG longest path: 6 unrolled synchronous max-plus rounds over
    // the weighted FK DAG (depth 4 — idempotent past the fixpoint,
    // matching the engine's early-exit fixpoint); every node starts
    // at 0, improvement spelled as CASE
    "graph_dag_longest" -> dagLongestSql(6),

    // weighted SSSP: 5 unrolled synchronous Bellman-Ford rounds (the
    // graph's weighted hop diameter is 4), exact BIGINT min-plus;
    // NULL-safe running min spelled as CASE so both engines' null
    // semantics agree exactly
    "graph_sssp_weighted" -> ssspSql(5),
    "graph_ppr" -> pprSql(iters = 3),
    "graph_kcore" -> kcoreSql(k = 60, rounds = 6),
    "graph_lpa" -> lpaSql(rounds = 3),
    "graph_modularity" -> modularitySql(rounds = 3),
    "graph_closeness" -> closenessSql(k = 4, hops = 6),
    "graph_harmonic" -> harmonicSql(k = 4, hops = 6),
    "graph_diameter" -> diameterSql(hops = 6),

    // closed-form: the FK graph's components ARE the regions; each
    // component's label is its least member IRI
    "graph_wcc" ->
      """WITH members AS (
        |   SELECT 'tpch:region/'||r_regionkey AS node, r_regionkey AS comp
        |    FROM region
        |   UNION ALL SELECT 'tpch:nation/'||n_nationkey, n_regionkey FROM nation
        |   UNION ALL SELECT 'tpch:customer/'||c_custkey, n_regionkey
        |    FROM customer JOIN nation ON c_nationkey = n_nationkey
        |   UNION ALL SELECT 'tpch:supplier/'||s_suppkey, n_regionkey
        |    FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        | lbl AS (SELECT comp, min(node) AS label FROM members GROUP BY 1)
        | SELECT m.node, l.label AS component
        | FROM members m JOIN lbl l USING (comp)""".stripMargin,

    // closed-form SCC restatement: the cyclic core is one component
    // per region (members: region, selected orders, their customers,
    // their nations; label = min member string); every other edge
    // endpoint is a singleton labeled by itself
    "graph_scc" ->
      """WITH selo AS (
        |   SELECT o.o_orderkey AS ok, c.c_custkey AS ck,
        |          n.n_nationkey AS nk, n.n_regionkey AS rk
        |   FROM orders o
        |   JOIN customer c ON o.o_custkey = c.c_custkey
        |   JOIN nation n ON c.c_nationkey = n.n_nationkey
        |   WHERE o.o_orderkey % 20 = 0),
        | members AS (
        |   SELECT DISTINCT rk, 'r:'||rk AS node FROM selo
        |   UNION SELECT DISTINCT rk, 'o:'||ok FROM selo
        |   UNION SELECT DISTINCT rk, 'c:'||ck FROM selo
        |   UNION SELECT DISTINCT rk, 'n:'||nk FROM selo),
        | lbl AS (SELECT rk, min(node) AS component FROM members GROUP BY rk),
        | cyc AS (SELECT m.node, l.component FROM members m JOIN lbl l USING (rk)),
        | univ AS (
        |   SELECT 'o:'||o_orderkey AS node FROM orders
        |   UNION SELECT 'c:'||c_custkey FROM customer
        |   UNION SELECT 'n:'||n_nationkey FROM nation
        |   UNION SELECT DISTINCT 'r:'||n_regionkey FROM nation)
        | SELECT u.node, coalesce(c.component, u.node) AS component
        | FROM univ u LEFT JOIN cyc c ON u.node = c.node""".stripMargin,

    // per-group sketches → union distinct → re-truncate → estimate
    "sketch_kmv_union" ->
      """WITH u AS (SELECT DISTINCT lang AS g,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 AS u
        | FROM documents),
        | sk AS (SELECT DISTINCT u FROM (
        |   SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn
        |   FROM u QUALIFY rn <= 32)),
        | r AS (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM sk QUALIFY rn <= 32),
        | a AS (SELECT count(*) AS nd, max(CASE WHEN rn = 32 THEN u END) AS uk FROM r)
        | SELECT CASE WHEN nd < 32 THEN CAST(nd AS DOUBLE)
        |  ELSE round(31.0 / uk, 6) END AS est_distinct FROM a""".stripMargin,

    "text_vocab_topk" ->
      s"""WITH tf AS (SELECT lang, unnest(list_distinct($toksSql)) AS tok
        |  FROM documents),
        | df AS (SELECT lang, tok, count(*) AS df FROM tf GROUP BY lang, tok)
        | SELECT lang, tok, df, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY df DESC, tok) AS BIGINT) AS rank
        | FROM df QUALIFY rank <= 20""".stripMargin,

    // adjacent pairs, NON-distinct (frequency is the merge signal)
    "text_bpe_pairs" ->
      s"""WITH tk AS (SELECT $toksSql AS t FROM documents WHERE len($toksSql) >= 2),
        | p AS (SELECT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS pair FROM tk),
        | c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair)
        | SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
        | FROM c QUALIFY rank <= 30""".stripMargin,

    // BPE merge-loop training, 12 rounds unrolled as CTE chains. Each
    // round: pair counts from the current vocab (p_i), argmax with the
    // engine's tie-break (b_i — ORDER BY freq DESC, pair equals the
    // engine's (freq DESC, lhs, rhs) because symbols are [a-z_]+ and
    // ' ' sorts below both), then the greedy left-to-right merge
    // replayed with unnest + window functions ONLY (u_i: position/
    // symbol rows; c_i: candidate mark where (sym, next sym) = the
    // merge pair; s_i: gaps-and-islands over consecutive candidate
    // positions — within a run, every ODD candidate merges, which IS
    // greedy left-to-right since runs longer than 1 only occur when
    // lhs = rhs; v_i: re-list with merged pairs substituted and their
    // consumed right symbols dropped). Merged pairs consume both
    // symbols: [a,a,a] + (a,a) -> [aa,a]. This formulation uses no
    // list_reduce/lambda-fold state machine, so it is robust across
    // DuckDB versions. Every chained CTE is MATERIALIZED: DuckDB
    // otherwise inlines them, and a 12-round chain where each round
    // references its predecessor multiple times re-evaluates
    // exponentially (measured: >4 min inlined, 0.2 s materialized at
    // sf0.001).
    // NOTE freq is CAST AS BIGINT at the final projection: `sum()` of
    // an integer is HUGEINT in DuckDB, and HUGEINT's arrow/pandas
    // export representation differs across DuckDB versions — every
    // other integer-sum oracle in this map already casts (sum_okey
    // etc.); the two BPE entries were the only uncast exports and the
    // only hash-red rows for three rounds.
    "text_bpe_train" -> {
      s"""WITH ${bpeWindowChain(12)}
         | ${(1 to 12).map(i =>
             s"SELECT CAST($i AS BIGINT) AS rank, lhs, rhs, CAST(freq AS BIGINT) AS freq FROM b$i")
             .mkString(" UNION ALL ")}
         | ORDER BY rank""".stripMargin
    },

    // divergence probe: top-3 argmax candidates of every round (same
    // chain as text_bpe_train; only the emitted projection differs)
    // (freq cast for the same HUGEINT-export reason as text_bpe_train)
    "text_bpe_train_rounds" -> {
      s"""WITH ${bpeWindowChain(12)}
         | SELECT round, cand_rank, lhs, rhs, freq FROM (
         |  ${(1 to 12).map(i =>
             s"""SELECT CAST($i AS BIGINT) AS round, split_part(pair,' ',1) AS lhs,
                | split_part(pair,' ',2) AS rhs, CAST(freq AS BIGINT) AS freq,
                | CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS cand_rank
                | FROM p$i QUALIFY cand_rank <= 3""".stripMargin)
             .mkString(" UNION ALL ")})
         | ORDER BY round, cand_rank""".stripMargin
    },

    // round-1 isolation probes: pair counting alone, resp. the
    // unnest+window merge replay alone (see the query-side comment)
    "text_bpe_probe_pairs" -> {
      s"""WITH ${bpeWindowChain(1)}
         | SELECT split_part(pair,' ',1) AS l, split_part(pair,' ',2) AS r,
         |   CAST(freq AS BIGINT) AS freq FROM p1""".stripMargin
    },
    "text_bpe_probe_merge" -> {
      s"""WITH ${bpeWindowChain(2)}
         | SELECT w, array_to_string(syms, ' ') AS syms,
         |   CAST(cnt AS BIGINT) AS cnt FROM v1""".stripMargin
    },

    // BPE apply: the same 12-round merge chain, but the vocab rows
    // carry their source word `w` through every fold so the final
    // round yields a word→encoded-symbols map; per-doc word counts
    // then join that map and sum. Folds run for ALL 12 rounds here
    // (train skips the last — it only needs the decision).
    "text_bpe_apply" -> {
      def round(i: Int): String = {
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        s""", p$i AS MATERIALIZED (SELECT t.pair, sum(t.cnt) AS freq FROM (
           |   SELECT unnest(list_transform(range(1, len(syms)),
           |     j -> syms[j] || ' ' || syms[j+1])) AS pair, cnt
           |   FROM $prev WHERE len(syms) >= 2) t GROUP BY t.pair),
           | b$i AS MATERIALIZED (SELECT split_part(pair,' ',1) AS lhs,
           |   split_part(pair,' ',2) AS rhs, freq
           |  FROM p$i ORDER BY freq DESC, pair LIMIT 1),
           | v$i AS MATERIALIZED (SELECT w, string_split(
           |   CASE WHEN split_part(st,'|',2)='' THEN split_part(st,'|',1)
           |        WHEN split_part(st,'|',1)='' THEN split_part(st,'|',2)
           |        ELSE split_part(st,'|',1) || ',' || split_part(st,'|',2) END,
           |   ',') AS syms, cnt
           |  FROM (SELECT w, list_reduce(list_prepend('|', syms), (acc, x) ->
           |   CASE WHEN split_part(acc,'|',2) = b$i.lhs AND x = b$i.rhs
           |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
           |          ELSE split_part(acc,'|',1)||',' END) || b$i.lhs || b$i.rhs || '|'
           |    WHEN split_part(acc,'|',2) <> ''
           |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
           |          ELSE split_part(acc,'|',1)||',' END) || split_part(acc,'|',2) || '|' || x
           |    ELSE split_part(acc,'|',1) || '|' || x END) AS st, cnt
           |   FROM $prev, b$i) q)""".stripMargin
      }
      s"""WITH dw AS (SELECT doc_id,
         |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents),
         | dwc AS MATERIALIZED (SELECT doc_id, w, count(*) AS c
         |  FROM dw GROUP BY doc_id, w),
         | wc AS MATERIALIZED (SELECT w, sum(c) AS cnt FROM dwc GROUP BY w),
         | v0 AS MATERIALIZED (SELECT w,
         |    list_append(regexp_extract_all(w, '[a-z]'), '_') AS syms, cnt
         |  FROM wc)
         | ${(1 to 12).map(round).mkString("\n")}
         | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         |   CAST(sum(c * len(syms)) AS BIGINT) AS n_bpe_tokens
         | FROM dwc JOIN v12 USING (w) GROUP BY doc_id""".stripMargin
    },

    // byte-level BPE train: the same merge chain as text_bpe_train
    // over the hex-byte v0 (space byte 20 = word marker)
    "text_bytebpe_train" -> {
      s"""WITH ${byteBpeWindowChain(10)}
         | ${(1 to 10).map(i =>
             s"SELECT CAST($i AS BIGINT) AS rank, lhs, rhs, CAST(freq AS BIGINT) AS freq FROM b$i")
             .mkString(" UNION ALL ")}
         | ORDER BY rank""".stripMargin
    },

    // byte-level apply: the 10-round chain with vocab rows carrying
    // their source word through the list_reduce fold (text_bpe_apply's
    // scheme; hex symbols are ','/'|'-free so the delimiters are safe)
    "text_bytebpe_apply" -> {
      def round(i: Int): String = {
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        s""", p$i AS MATERIALIZED (SELECT t.pair, sum(t.cnt) AS freq FROM (
           |   SELECT unnest(list_transform(range(1, len(syms)),
           |     j -> syms[j] || ' ' || syms[j+1])) AS pair, cnt
           |   FROM $prev WHERE len(syms) >= 2) t GROUP BY t.pair),
           | b$i AS MATERIALIZED (SELECT split_part(pair,' ',1) AS lhs,
           |   split_part(pair,' ',2) AS rhs, freq
           |  FROM p$i ORDER BY freq DESC, pair LIMIT 1),
           | v$i AS MATERIALIZED (SELECT w, string_split(
           |   CASE WHEN split_part(st,'|',2)='' THEN split_part(st,'|',1)
           |        WHEN split_part(st,'|',1)='' THEN split_part(st,'|',2)
           |        ELSE split_part(st,'|',1) || ',' || split_part(st,'|',2) END,
           |   ',') AS syms, cnt
           |  FROM (SELECT w, list_reduce(list_prepend('|', syms), (acc, x) ->
           |   CASE WHEN split_part(acc,'|',2) = b$i.lhs AND x = b$i.rhs
           |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
           |          ELSE split_part(acc,'|',1)||',' END) || b$i.lhs || b$i.rhs || '|'
           |    WHEN split_part(acc,'|',2) <> ''
           |    THEN (CASE WHEN split_part(acc,'|',1)='' THEN ''
           |          ELSE split_part(acc,'|',1)||',' END) || split_part(acc,'|',2) || '|' || x
           |    ELSE split_part(acc,'|',1) || '|' || x END) AS st, cnt
           |   FROM $prev, b$i) q)""".stripMargin
      }
      s"""WITH dw AS (SELECT doc_id,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         |  FROM documents),
         | dwc AS MATERIALIZED (SELECT doc_id, w, count(*) AS c
         |  FROM dw GROUP BY doc_id, w),
         | wc AS MATERIALIZED (SELECT w, sum(c) AS cnt FROM dwc GROUP BY w),
         | v0 AS MATERIALIZED (SELECT w, list_transform(range(1, strlen(w)+2),
         |   j -> substr(hex(' '||w), (j-1)*2+1, 2)) AS syms, cnt
         |  FROM wc)
         | ${(1 to 10).map(round).mkString("\n")}
         | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         |   CAST(sum(c * len(syms)) AS BIGINT) AS n_bytebpe_tokens
         | FROM dwc JOIN v10 USING (w) GROUP BY doc_id""".stripMargin
    },

    // WordPiece train: 8 likelihood-argmax rounds (exact HUGEINT
    // floor(freq·1e12/(n_l·n_r)), ties score DESC then pair), merge
    // replayed with the same unnest+gaps-and-islands formulation as
    // BPE but ##-stripped merged symbols (integer casts for the same
    // HUGEINT-export reason as text_bpe_train)
    "text_wordpiece_train" -> {
      s"""WITH ${wpWindowChain(8)}
         | ${(1 to 8).map(i =>
             s"""SELECT CAST($i AS BIGINT) AS rank, lhs, rhs,
                | CAST(freq AS BIGINT) AS freq, score_e12 FROM b$i""".stripMargin)
             .mkString(" UNION ALL ")}
         | ORDER BY rank""".stripMargin
    },

    // WordPiece apply: the same 8-round likelihood-argmax chain, vocab
    // rows carrying their source word through a list_reduce fold (the
    // text_bpe_apply replay formulation, ##-stripped merged symbols);
    // per-doc word counts join the final word→symbols map
    "text_wordpiece_apply" -> wpApplySql,

    // STREAMING WordPiece encode: identical counts by construction
    // (the stream applies the same trained merges per micro-batch as
    // a stateless projection), so it shares the batch oracle
    "stream_wordpiece_apply" -> wpApplySql,

    // Naive Bayes train: add-one smoothed log-likelihoods in integer
    // micro-log units (round AT the integer boundary — the rounded
    // double is integer-valued so the BIGINT cast is exact in both
    // engines), top-20 per class by (cnt DESC, tok)
    "text_nb_train" ->
      s"""WITH tk AS (SELECT lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents),
        | cc AS (SELECT lang, tok, count(*) AS cnt FROM tk GROUP BY lang, tok),
        | tot AS (SELECT lang, sum(cnt) AS tokens_c FROM cc GROUP BY lang),
        | voc AS (SELECT count(DISTINCT tok) AS v FROM cc)
        | SELECT lang, tok, cnt,
        |  CAST(round(ln((cnt + 1)::DOUBLE / (tokens_c + v)::DOUBLE)
        |    * 1000000.0::DOUBLE, 0) AS BIGINT) AS lp_micro,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok)
        |    AS BIGINT) AS rank
        | FROM cc JOIN tot USING (lang) CROSS JOIN voc
        | QUALIFY rank <= 20""".stripMargin,

    // Naive Bayes score: prior + dl·lp0 + Σ_present tf·(lp − lp0),
    // all exact integer arithmetic after the one rounded ln per model
    // cell; argmax per doc (score DESC, lang ASC)
    "text_nb_score" ->
      s"""WITH tk AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents),
        | cc AS (SELECT lang, tok, count(*) AS cnt FROM tk GROUP BY lang, tok),
        | tot AS (SELECT lang, sum(cnt) AS tokens_c FROM cc GROUP BY lang),
        | voc AS (SELECT count(DISTINCT tok) AS v FROM cc),
        | n AS (SELECT count(*) AS n FROM documents),
        | cls AS (SELECT t.lang,
        |    CAST(round(ln(d.docs_c::DOUBLE / n.n::DOUBLE)
        |      * 1000000.0::DOUBLE, 0) AS BIGINT) AS prior_micro,
        |    CAST(round(ln(1.0::DOUBLE / (t.tokens_c + voc.v)::DOUBLE)
        |      * 1000000.0::DOUBLE, 0) AS BIGINT) AS lp0_micro
        |   FROM tot t
        |   JOIN (SELECT lang, count(*) AS docs_c FROM documents GROUP BY lang) d
        |     USING (lang) CROSS JOIN n CROSS JOIN voc),
        | model AS (SELECT cc.lang, cc.tok,
        |    CAST(round(ln((cnt + 1)::DOUBLE / (tokens_c + v)::DOUBLE)
        |      * 1000000.0::DOUBLE, 0) AS BIGINT) AS lp_micro
        |   FROM cc JOIN tot USING (lang) CROSS JOIN voc),
        | dtf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
        | dl AS (SELECT doc_id, sum(tf) AS dl FROM dtf GROUP BY doc_id),
        | adj AS (SELECT dtf.doc_id, m.lang,
        |    sum(dtf.tf * (m.lp_micro - c.lp0_micro)) AS adj_micro
        |   FROM dtf JOIN model m USING (tok) JOIN cls c ON m.lang = c.lang
        |   GROUP BY dtf.doc_id, m.lang),
        | scored AS (SELECT dl.doc_id, c.lang,
        |    c.prior_micro + dl.dl * c.lp0_micro + coalesce(a.adj_micro, 0)
        |      AS score_micro
        |   FROM dl CROSS JOIN cls c
        |   LEFT JOIN adj a ON a.doc_id = dl.doc_id AND a.lang = c.lang)
        | SELECT doc_id, lang AS pred_lang, CAST(score_micro AS BIGINT) AS score_micro
        | FROM scored QUALIFY row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score_micro DESC, lang) = 1""".stripMargin,

    // trained-IVF: probe the 2 nearest trained cells (c2 = centroids
    // after round 3's update schedule), exact-integer-dot rerank
    // inside — extends the k-means CTE chain (a3 = cell assignment)
    "sim_topk_ivf_trained" -> kmeansSql(ivfTrainedSelect),

    // upsert: k-means chain trains on the 90% "old" corpus only;
    // batch rows assign against c2 (the trained book) and the drift
    // restates ‖batch mean − centroid‖ from the same integer sums
    "sim_ivf_upsert" -> kmeansSql(
      s""", qb AS (SELECT vec_id, $sq8QvSql AS qv
        |   FROM embeddings WHERE vec_id % 10 = 0),
        | ab AS (SELECT vec_id, qv, cid, dist FROM (
        |   SELECT qb.vec_id, qb.qv, c.cid,
        |     ${kmDistSql("qb.qv", "c.cv")} AS dist
        |   FROM qb CROSS JOIN c2 c) t
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cid) = 1),
        | mu AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_new,
        |   list_value(${(1 to 64).map(i => s"sum(qv[$i])/count(*)").mkString(", ")}) AS mv
        |  FROM ab GROUP BY cid),
        | dr AS (SELECT mu.cid, mu.n_new,
        |   round(sqrt(${kmDistSql("mu.mv", "c.cv")}), 6) AS drift
        |  FROM mu JOIN c2 c ON c.cid = mu.cid)
        | SELECT ab.vec_id, ab.cid AS cluster, round(ab.dist, 6) AS dist,
        |  dr.n_new, dr.drift, dr.drift > 8.0 AS refit_hint
        | FROM ab JOIN dr ON dr.cid = ab.cid""".stripMargin,
      preCtes = "old AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0), ",
      src = "old"),

    // streaming drift monitor: the dr statistics of the upsert chain
    // alone (per-cluster batch count, integer-sum mean drift vs the
    // frozen book, hint at 8.0) — sums are linear, so the streamed
    // per-micro-batch fold equals this batch restatement exactly
    "stream_ivf_drift" -> kmeansSql(
      s""", qb AS (SELECT vec_id, $sq8QvSql AS qv
        |   FROM embeddings WHERE vec_id % 10 = 0),
        | ab AS (SELECT vec_id, qv, cid FROM (
        |   SELECT qb.vec_id, qb.qv, c.cid,
        |     ${kmDistSql("qb.qv", "c.cv")} AS dist
        |   FROM qb CROSS JOIN c2 c) t
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cid) = 1),
        | mu AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_new,
        |   list_value(${(1 to 64).map(i => s"sum(qv[$i])/count(*)").mkString(", ")}) AS mv
        |  FROM ab GROUP BY cid)
        | SELECT mu.cid AS cluster, mu.n_new,
        |   round(sqrt(${kmDistSql("mu.mv", "c.cv")}), 6) AS drift,
        |   round(sqrt(${kmDistSql("mu.mv", "c.cv")}), 6) > 8.0 AS refit_hint
        | FROM mu JOIN c2 c ON c.cid = mu.cid""".stripMargin,
      preCtes = "old AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0), ",
      src = "old"),

    // partial refit: upsert's chain + drifted-cell set (drift > 100),
    // one restricted Lloyd round over the drifted cells' existing+batch
    // members (a3 ∪ ab), reassignment among drifted cells only —
    // frozen rows pass through with refit=false
    "sim_ivf_refit" -> kmeansSql(
      s""", qb AS (SELECT vec_id, $sq8QvSql AS qv
        |   FROM embeddings WHERE vec_id % 10 = 0),
        | ab AS (SELECT vec_id, qv, cid, dist FROM (
        |   SELECT qb.vec_id, qb.qv, c.cid,
        |     ${kmDistSql("qb.qv", "c.cv")} AS dist
        |   FROM qb CROSS JOIN c2 c) t
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cid) = 1),
        | mu AS (SELECT cid,
        |   list_value(${(1 to 64).map(i => s"sum(qv[$i])/count(*)").mkString(", ")}) AS mv
        |  FROM ab GROUP BY cid),
        | dr AS (SELECT mu.cid,
        |   round(sqrt(${kmDistSql("mu.mv", "c.cv")}), 6) AS drift
        |  FROM mu JOIN c2 c ON c.cid = mu.cid),
        | dset AS (SELECT cid FROM dr WHERE drift > 100.0),
        | allv AS (SELECT vec_id, qv, cid, dist FROM a3
        |   UNION ALL SELECT vec_id, qv, cid, dist FROM ab),
        | mem AS (SELECT * FROM allv WHERE cid IN (SELECT cid FROM dset)),
        | newc AS (SELECT cid,
        |   list_value(${(1 to 64).map(i => s"sum(qv[$i])/count(*)").mkString(", ")}) AS cv
        |  FROM mem GROUP BY cid),
        | rea AS (SELECT vec_id, cid AS cluster, round(dist, 6) AS dist,
        |   true AS refit FROM (
        |   SELECT m.vec_id, c.cid, ${kmDistSql("m.qv", "c.cv")} AS dist
        |   FROM mem m CROSS JOIN newc c) t
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cid) = 1)
        | SELECT vec_id, cid AS cluster, round(dist, 6) AS dist,
        |   false AS refit
        | FROM allv WHERE cid NOT IN (SELECT cid FROM dset)
        | UNION ALL SELECT vec_id, cluster, dist, refit FROM rea""".stripMargin,
      preCtes = "old AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0), ",
      src = "old"),

    // BM25 (terms spark/join/vector, k1=1.2, b=0.75, Lucene idf).
    // Every fractional literal is ::DOUBLE — bare 0.5 is DECIMAL in
    // DuckDB and would run the whole chain in decimal arithmetic
    // where the engine uses IEEE doubles. Term contributions add
    // left-associatively in the engine's fixed term order.
    "text_bm25" ->
      s"""WITH $bm25ScCtes
        | SELECT doc_id, score FROM sc WHERE score > 0
        | ORDER BY score DESC, doc_id LIMIT 100""".stripMargin,

    // RRF hybrid: BM25 top-50 (same sc CTEs as text_bm25) ∪ dense
    // cosine-vs-vec-0 top-50, fused by integer round(10⁹/(60+rank))
    // contributions; full-outer on id, top-20 by (rrf desc, id)
    "sim_rrf_hybrid" -> {
      def contrib(r: String) =
        s"coalesce(CAST(round(1000000000.0::DOUBLE / (60.0::DOUBLE + $r), 0) AS BIGINT), 0)"
      s"""WITH $bm25ScCtes,
        | sp AS (SELECT doc_id AS id, CAST(row_number() OVER (
        |     ORDER BY score DESC, doc_id) AS BIGINT) AS rs
        |   FROM (SELECT * FROM sc WHERE score > 0
        |         ORDER BY score DESC, doc_id LIMIT 50)),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        | dn0 AS (SELECT vec_id, list_dot_product(qe, emb) /
        |     (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(emb, emb))) AS sim
        |   FROM e, q WHERE vec_id != 0),
        | dn AS (SELECT vec_id AS id, CAST(row_number() OVER (
        |     ORDER BY sim DESC, vec_id) AS BIGINT) AS rd
        |   FROM (SELECT * FROM dn0 ORDER BY sim DESC, vec_id LIMIT 50)),
        | fu AS (SELECT coalesce(sp.id, dn.id) AS id,
        |     ${contrib("rs")} + ${contrib("rd")} AS rrf
        |   FROM sp FULL OUTER JOIN dn ON sp.id = dn.id)
        | SELECT id, rrf, CAST(row_number() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rank
        | FROM fu ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },

    // degree-ordered triangle counting on the co-order parts graph:
    // orient by (deg, id), wedges from the single out-out self-join,
    // close on the (v, w) oriented edge; each triangle counted once,
    // then credited to its 3 corners
    "graph_triangles" ->
      """WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |   FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | deg AS (SELECT v, count(*) AS deg FROM (
        |   SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY 1),
        | o AS (SELECT
        |   CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
        |        THEN e0.a ELSE e0.b END AS src,
        |   CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
        |        THEN e0.b ELSE e0.a END AS dst,
        |   CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
        |        THEN db.deg ELSE da.deg END AS dd
        |   FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        | w AS (SELECT o1.src AS src, o1.dst AS v, o2.dst AS w2
        |   FROM o o1 JOIN o o2 ON o1.src = o2.src
        |   AND (o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.dst < o2.dst))),
        | tr AS (SELECT w.src AS x, w.v AS y, w.w2 AS z
        |   FROM w JOIN o o3 ON o3.src = w.v AND o3.dst = w.w2),
        | n AS (SELECT unnest([x, y, z]) AS node FROM tr),
        | c AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM n GROUP BY 1)
        | SELECT node, tri FROM c ORDER BY tri DESC, node LIMIT 20""".stripMargin,

    // basket lift: nab·N·1e6/(na·nb), one rounded double division over
    // integer inputs
    // assortativity: exact HUGEINT moment sums over symmetrized edge
    // ends, then the same two double casts + one division as the engine
    "graph_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |   FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | deg AS (SELECT v, count(*) AS deg FROM (
        |   SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY 1),
        | p AS (SELECT da.deg AS x, db.deg AS y
        |   FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        | s AS (SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p),
        | m AS (SELECT count(*) AS n, sum(x) AS s1, sum(x*y) AS sxy,
        |   sum(x*x) AS s2 FROM s)
        | SELECT CAST(n AS BIGINT) AS n_ends,
        |  CASE WHEN n*s2 - s1*s1 = 0 THEN 0.0
        |       ELSE round(CAST(n*sxy - s1*s1 AS DOUBLE)
        |                  / CAST(n*s2 - s1*s1 AS DOUBLE), 6)
        |  END AS assortativity
        | FROM m""".stripMargin,

    "rel_basket_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        | n AS (SELECT count(DISTINCT bk) AS n FROM b),
        | items AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        | pairs AS (SELECT x.it AS a, y.it AS b, count(*) AS nab
        |   FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |   GROUP BY 1, 2 HAVING count(*) >= 5)
        | SELECT a, b, nab,
        |  CAST(round(CAST(nab * n.n * 1000000 AS DOUBLE) / (ia.ni * ib.ni), 0) AS BIGINT) AS lift_u
        | FROM pairs JOIN items ia ON ia.it = a JOIN items ib ON ib.it = b, n
        | ORDER BY lift_u DESC, a, b LIMIT 20""".stripMargin,

    // CDC chunks: boundary AFTER words with hash32 ≡ 0 (mod 16);
    // chunk id = boundaries strictly before pos; chunk hash = md5 of
    // the position-ordered words
    "text_cdc_chunks" ->
      s"""WITH $cdcChunkCtes
        | SELECT doc_id, chunk, n_tok, ch FROM cc""".stripMargin,

    // duplicate CDC spans: ≥3-token chunks whose hash lands in >1 doc
    "dedup_cdc_spans" ->
      s"""WITH $cdcChunkCtes
        | SELECT ch, CAST(min(n_tok) AS BIGINT) AS n_tok,
        |   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |   CAST(count(*) AS BIGINT) AS n_occ
        | FROM cc WHERE n_tok >= 3 GROUP BY 1
        | HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    // exact-substring spans: the marked windows merged by
    // gaps-and-islands (a gap opens past prev_pos + L)
    "dedup_substring_spans" ->
      s"""WITH ${substrMarkCtes(8)},
        | ${substrSpanSelect(8)}""".stripMargin,

    // streaming twin: corpus-hit spans ONLY (no batch-internal pass —
    // per-document result is a function of (doc, corpus index), so any
    // micro-batch split appends the same rows)
    "stream_substring_spans" ->
      s"""WITH d0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | p0 AS (SELECT doc_id, toks, generate_subscripts(toks, 1) AS gi FROM d0),
        | o0 AS (SELECT doc_id, CAST(gi - 1 AS BIGINT) AS pos,
        |   ${hash32On(s"array_to_string(toks[gi : gi + 7], ' ')")} AS h,
        |   (doc_id % 10 < 2) AS isnew
        |  FROM p0 WHERE gi <= len(toks) - 7),
        | ch AS (SELECT DISTINCT h FROM o0 WHERE NOT isnew),
        | bt AS (SELECT doc_id, pos, h FROM o0 WHERE isnew),
        | mk AS (SELECT doc_id, pos FROM bt JOIN ch USING (h)),
        | ${substrSpanSelect(8)}""".stripMargin,

    // incremental substring spans: batch (doc_id%10<2) windows already
    // in the corpus hash set, plus batch-internal dups minus each
    // hash's batch-first occurrence — merged by the same islands
    "dedup_substring_incr" ->
      s"""WITH d0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | p0 AS (SELECT doc_id, toks, generate_subscripts(toks, 1) AS gi FROM d0),
        | o0 AS (SELECT doc_id, CAST(gi - 1 AS BIGINT) AS pos,
        |   ${hash32On(s"array_to_string(toks[gi : gi + 7], ' ')")} AS h,
        |   (doc_id % 10 < 2) AS isnew
        |  FROM p0 WHERE gi <= len(toks) - 7),
        | ch AS (SELECT DISTINCT h FROM o0 WHERE NOT isnew),
        | bt AS (SELECT doc_id, pos, h FROM o0 WHERE isnew),
        | ic AS (SELECT doc_id, pos FROM bt JOIN ch USING (h)),
        | bs AS (SELECT h FROM bt GROUP BY h HAVING count(*) >= 2),
        | k0 AS (SELECT h, doc_id, pos, row_number() OVER (
        |     PARTITION BY h ORDER BY doc_id, pos) AS rn FROM bt),
        | ib AS (SELECT bt.doc_id, bt.pos FROM bt JOIN bs USING (h)
        |   JOIN (SELECT h, doc_id AS kd, pos AS kp FROM k0 WHERE rn = 1) k
        |     USING (h)
        |   WHERE NOT (bt.doc_id = k.kd AND bt.pos = k.kp)),
        | mk AS (SELECT doc_id, pos FROM ic UNION
        |        SELECT doc_id, pos FROM ib),
        | ${substrSpanSelect(8)}""".stripMargin,

    // the spans applied: tokens at covered positions dropped, the
    // rest re-joined in order; n_removed = covered-position count
    "dedup_substring_clean" ->
      s"""WITH ${substrMarkCtes(8)},
        | cov AS (SELECT DISTINCT doc_id, pos + unnest(range(0, 8)) AS cp
        |   FROM mk),
        | t1 AS (SELECT doc_id, unnest(toks) AS s,
        |   CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS i FROM d0)
        | SELECT t1.doc_id,
        |   coalesce(string_agg(s, ' ' ORDER BY i)
        |     FILTER (WHERE cov.cp IS NULL), '') AS clean_text,
        |   CAST(count(cov.cp) AS BIGINT) AS n_removed
        | FROM t1 LEFT JOIN cov ON t1.doc_id = cov.doc_id AND t1.i = cov.cp
        | GROUP BY 1""".stripMargin,

    // funnel oracle: the k-way self-join EXISTS formulation — correct,
    // quadratic on hot users, labelled; window constrains chain ENDS
    // (intermediates sit between); ties chain id-ascending like the
    // engine's (ts, event_id) fold order
    "rel_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_us(ts) AS t,
        |   event_type AS ty FROM events),
        | us AS (SELECT DISTINCT u FROM e),
        | l1 AS (SELECT DISTINCT u FROM e WHERE ty = 'click'),
        | l2 AS (SELECT DISTINCT a.u FROM e a JOIN e b ON a.u = b.u
        |   AND a.ty = 'click' AND b.ty = 'view'
        |   AND (a.t < b.t OR (a.t = b.t AND a.id < b.id))
        |   AND b.t - a.t <= 7200000000),
        | l3 AS (SELECT DISTINCT a.u FROM e a JOIN e b ON a.u = b.u
        |   AND a.ty = 'click' AND b.ty = 'view'
        |   AND (a.t < b.t OR (a.t = b.t AND a.id < b.id))
        |   JOIN e c ON c.u = a.u AND c.ty = 'purchase'
        |   AND (b.t < c.t OR (b.t = c.t AND b.id < c.id))
        |   AND c.t - a.t <= 7200000000),
        | lv AS (SELECT us.u, CASE WHEN l3.u IS NOT NULL THEN 3
        |     WHEN l2.u IS NOT NULL THEN 2
        |     WHEN l1.u IS NOT NULL THEN 1 ELSE 0 END AS lev
        |   FROM us LEFT JOIN l1 ON us.u = l1.u
        |   LEFT JOIN l2 ON us.u = l2.u LEFT JOIN l3 ON us.u = l3.u)
        | SELECT CAST(lev AS BIGINT) AS level, count(*) AS n_users
        | FROM lv GROUP BY 1""".stripMargin,

    // attribution oracle: EXISTS any same-user click before-and-within
    // window — equivalent to the engine's latest-click check because
    // the latest preceding touch minimizes the gap
    "rel_attribution" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_us(ts) AS t,
        |   ts, event_type AS ty FROM events)
        | SELECT date_trunc('hour', p.ts) AS h, count(*) AS n_conv,
        |  CAST(count_if(EXISTS (SELECT 1 FROM e c WHERE c.u = p.u
        |    AND c.ty = 'click'
        |    AND (c.t < p.t OR (c.t = p.t AND c.id < p.id))
        |    AND p.t - c.t <= 7200000000)) AS BIGINT) AS n_attributed
        | FROM e p WHERE p.ty = 'purchase' GROUP BY 1""".stripMargin,

    // retention: first-event hour cohort; ret_k = users active in
    // EXACTLY cohort+k hours
    "rel_retention" ->
      """WITH f AS (SELECT user_id AS u, date_trunc('hour', min(ts)) AS cohort
        |   FROM events GROUP BY 1),
        | a AS (SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS p FROM events),
        | fl AS (SELECT a.u, cohort,
        |   max(CASE WHEN p = cohort + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS f1,
        |   max(CASE WHEN p = cohort + INTERVAL 3 HOUR THEN 1 ELSE 0 END) AS f3,
        |   max(CASE WHEN p = cohort + INTERVAL 6 HOUR THEN 1 ELSE 0 END) AS f6
        |  FROM a JOIN f ON a.u = f.u GROUP BY 1, 2)
        | SELECT cohort, count(*) AS n_users,
        |  CAST(sum(f1) AS BIGINT) AS ret_1, CAST(sum(f3) AS BIGINT) AS ret_3,
        |  CAST(sum(f6) AS BIGINT) AS ret_6
        | FROM fl GROUP BY 1""".stripMargin,

    // count-min sketch: 4×256 cells over salted hash32("i:token"),
    // estimate = min over a term's 4 cells; rollup build ≡ direct
    // build by CMS linearity, so the oracle builds directly
    "sketch_cms_topk" -> {
      // NB: hash32Sql's fold variable is `i`, so the salt must be
      // pre-concatenated (sv) — referencing the salt column inside
      // md5(...) would be captured by the lambda binder
      val b = s"""${hash32On("sv")} % 32"""
      s"""WITH tok AS (SELECT unnest($toksSql) AS s FROM documents),
        | ri AS (SELECT CAST(range AS VARCHAR) AS salt FROM range(4)),
        | tc AS (SELECT salt, salt || ':' || s AS sv FROM tok, ri),
        | cells AS (SELECT salt, $b AS bucket, count(*) AS cnt FROM tc GROUP BY 1, 2),
        | ex AS (SELECT s, CAST(count(*) AS BIGINT) AS exact FROM tok GROUP BY 1),
        | pr AS (SELECT s, exact, salt, $b AS bucket
        |   FROM (SELECT s, exact, salt, salt || ':' || s AS sv FROM ex, ri)),
        | est AS (SELECT s AS term, exact, CAST(min(cnt) AS BIGINT) AS est
        |   FROM pr JOIN cells USING (salt, bucket) GROUP BY 1, 2)
        | SELECT term, exact, est FROM est
        | ORDER BY est DESC, term LIMIT 20""".stripMargin
    },

    // CDC dedup rewrite: first (doc_id, chunk) occurrence of each
    // chunk hash survives; docs rebuilt from survivors in chunk order
    "llm_cdc_clean" ->
      s"""WITH $cdcChunkCtes,
        | fo AS (SELECT doc_id, chunk, n_tok, ctext, row_number() OVER (
        |     PARTITION BY ch ORDER BY doc_id, chunk) AS rn FROM cc)
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks_kept,
        |   CAST(sum(n_tok) AS BIGINT) AS n_tok_clean,
        |   md5(string_agg(ctext, ' ' ORDER BY chunk)) AS clean_fp
        | FROM fo WHERE rn = 1 GROUP BY doc_id""".stripMargin,

    // Bloom-pruned semi-join — the Bloom pass only prunes, so the
    // oracle is the exact semi-join; revenue summed as exact cents
    "rel_bloom_semijoin" ->
      """SELECT o_orderpriority AS pri, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM orders
        | WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                     WHERE c_mktsegment = 'BUILDING')
        | GROUP BY 1""".stripMargin,

    // tf·idf top-3 per doc; rank over the ROUNDED score (term-asc
    // ties) so both engines rank identical values
    // unigram-LM Viterbi hard-EM, DP unrolled per round
    "text_unigram_train" -> unigramSql(64, 4, 2, 16),
    // …one more unrolled segmentation round + the per-doc join
    "text_unigram_apply" -> unigramSql(64, 4, 2, 16, mode = "apply"),

    // PMI: directed window-2 pairs, marginals = row/column sums of the
    // pair table, one ln on an exact integer ratio (same operand order
    // as the engine: (cast(n_ab)·N) / (n_a·n_b))
    "text_pmi_topk" ->
      s"""WITH d0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
        | p0 AS (SELECT toks, generate_subscripts(toks, 1) AS gi FROM d0),
        | pr AS (SELECT toks[gi] AS a, toks[gi + d] AS b
        |   FROM p0 CROSS JOIN (SELECT unnest(range(1, 3)) AS d) ds
        |   WHERE gi + d <= len(toks)),
        | nab AS (SELECT a, b, count(*) AS n_ab FROM pr GROUP BY 1, 2),
        | na AS (SELECT a, sum(n_ab) AS n_a FROM nab GROUP BY 1),
        | nb AS (SELECT b, sum(n_ab) AS n_b FROM nab GROUP BY 1),
        | tt AS (SELECT sum(n_ab) AS n FROM nab),
        | sc AS (SELECT a AS w, b AS ctx, CAST(n_ab AS BIGINT) AS n_ab,
        |    round(ln(CAST(n_ab AS DOUBLE) * n / (n_a * n_b)), 6) AS pmi
        |  FROM nab JOIN na USING (a) JOIN nb USING (b) CROSS JOIN tt
        |  WHERE n_ab >= 5)
        | SELECT w, ctx, n_ab, pmi, CAST(row_number() OVER (
        |    PARTITION BY w ORDER BY pmi DESC, ctx) AS BIGINT) AS rank
        | FROM sc QUALIFY rank <= 5""".stripMargin,

    "text_tfidf_topk" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        | dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | nd AS (SELECT count(*) AS n FROM documents),
        | sc AS (SELECT doc_id, tf.term AS term,
        |    round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN dft ON tf.term = dft.term, nd)
        | SELECT doc_id, term, tfidf, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        | FROM sc QUALIFY rank <= 3""".stripMargin,

    // DSIR weights: 64 hashed-unigram buckets (= Dedup.hash32 % 64),
    // add-one smoothed target(en)/raw LMs; the per-doc sum replays
    // the engine's left fold EXACTLY — list_reduce over the
    // log-ratios in token order, seeded with 0.0
    "llm_dsir_weights" -> dsirWeightsSql,

    // DSIR resampling: A-ES over w = exp(weight) (rounded so both
    // engines order identical doubles); same hashU as llm_sample_weighted
    "llm_dsir_sample" ->
      s"""WITH dw AS ($dsirWeightsSql),
        | u AS (SELECT doc_id, lang, round(exp(weight), 9) AS w,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 AS u
        | FROM dw)
        | SELECT doc_id, lang, w, round(ln(u) / w, 9) AS skey
        | FROM u ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin,

    // full-batch logistic descent replayed round-for-round in integer
    // micro-units (the ONLY float op is the boundary-rounded sigmoid)
    "llm_quality_lr" -> logisticSql(buckets = 8, rounds = 3, stepDiv = 16L),

    // calibration: decile bins over the SAME unrolled descent's final
    // scores; all-integer bin stats (// is DuckDB integer division)
    "llm_calibration" -> logisticSql(buckets = 8, rounds = 3, stepDiv = 16L,
      tail = """SELECT bin, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(p) // count(*) AS BIGINT) AS mean_score_micro,
        | CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_micro
        | FROM (SELECT least(pf.p // 100000, 9) AS bin, pf.p AS p, yv.y AS y
        |   FROM pf JOIN yv USING (doc_id))
        | GROUP BY bin""".stripMargin),

    // streaming calibration ≡ batch calibration (linear bin sums)
    "stream_calibration" -> logisticSql(buckets = 8, rounds = 3, stepDiv = 16L,
      tail = """SELECT bin, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(p) // count(*) AS BIGINT) AS mean_score_micro,
        | CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_micro
        | FROM (SELECT least(pf.p // 100000, 9) AS bin, pf.p AS p, yv.y AS y
        |   FROM pf JOIN yv USING (doc_id))
        | GROUP BY bin""".stripMargin),

    // k-truss: 6 unrolled peel rounds (idempotent past the engine's
    // asserted fixpoint) + one final support pass over the survivors
    "graph_ktruss" -> ktrussSql(k = 10, rounds = 6),
    "llm_pca_power" -> pcaSql(dim = 64, iters = 3, nComp = 2),
    // stream == batch projection by construction
    "stream_pca_project" -> pcaSql(dim = 64, iters = 3, nComp = 2),

    // bigram perplexity: three zipped unnests rebuild (pos, w1, w2);
    // the per-doc sum replays the engine's pos-sorted left fold via
    // ordered list_reduce seeded with 0.0
    "text_bigram_ppl" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents
        |   WHERE len($toksSql) >= 2),
        | big AS (SELECT doc_id,
        |    unnest(range(1, len(toks))) AS pos,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i+1])) AS w2
        |  FROM d),
        | bc AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
        | uc AS (SELECT w1, count(*) AS cu FROM big GROUP BY 1),
        | vt AS (SELECT count(DISTINCT w2) AS v FROM big),
        | sc AS (SELECT big.doc_id, big.pos,
        |    ln((cb + 1) / CAST(cu + v AS DOUBLE)) AS lp
        |  FROM big JOIN bc USING (w1, w2) JOIN uc USING (w1), vt),
        | agg AS (SELECT doc_id, list_reduce(
        |     list_prepend(CAST(0 AS DOUBLE), list(lp ORDER BY pos)),
        |     (a, x) -> a + x) AS cum, count(*) AS n_bigrams FROM sc GROUP BY 1)
        | SELECT doc_id, round(exp(-cum / n_bigrams), 6) AS ppl, n_bigrams
        | FROM agg""".stripMargin,

    // temperature sampling: Σ supply^α folded in LANG order (exact
    // engine association); rate rounded to 9 BEFORE the threshold so
    // both engines compare identical doubles against the same hashU
    "llm_sample_temp" ->
      """WITH t AS (SELECT doc_id, lang,
        |   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        | s AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS supply
        |  FROM t GROUP BY lang),
        | dn AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(power(CAST(supply AS DOUBLE), 0.5::DOUBLE) ORDER BY lang)),
        |    (a, x) -> a + x) AS denom FROM s),
        | r AS (SELECT lang, supply, round(least(1.0::DOUBLE,
        |    30000.0::DOUBLE * (power(CAST(supply AS DOUBLE), 0.5::DOUBLE) / denom)
        |      / supply), 9) AS rate FROM s, dn),
        | k AS (SELECT t.lang, t.n_tokens, r.supply, r.rate
        |  FROM t JOIN r USING (lang)
        |  WHERE CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef',
        |            substr(md5('temp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) / 4294967296.0 < r.rate)
        | SELECT lang, min(supply) AS supply, min(rate) AS rate,
        |  count(*) AS n_sel, CAST(sum(n_tokens) AS BIGINT) AS sel_tokens
        | FROM k GROUP BY lang""".stripMargin,

    "rel_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment""".stripMargin,

    "rel_zorder_scan" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        | CAST(sum(l_suppkey) AS BIGINT) AS sum_skey
        | FROM lineitem
        | WHERE l_orderkey BETWEEN 100 AND 700
        |   AND l_suppkey BETWEEN 1 AND 3""".stripMargin,

    // --- round-10 warehouse analytics oracles ---

    // GROUPING() bit order: leftmost argument = most significant bit
    // in BOTH engines (Postgres semantics)
    // exact weighted lower median: value-folded weights, integer
    // 2·cum >= total threshold — no ratio float anywhere
    "rel_weighted_median" ->
      """WITH per AS (SELECT l_returnflag AS g,
        |   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
        |   sum(CAST(l_quantity AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        | c AS (SELECT g, v,
        |   sum(w) OVER (PARTITION BY g ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(w) OVER (PARTITION BY g) AS tot FROM per)
        | SELECT g, CAST(min(v) AS BIGINT) AS wmedian
        | FROM c WHERE cum * 2 >= tot GROUP BY g""".stripMargin,

    // deterministic walks: 3 unrolled hash-picked steps down the
    // reversed FK graph (rank = hash32 of walk:step:node mod outdeg)
    "graph_walks" -> {
      def pick(t: Int) =
        s"(${hash32On(s"w.walk_id || ':$t:' || w.node")}) % dg.deg + 1"
      def round(t: Int) =
        s"""w$t AS (SELECT w.walk_id, rk.dst AS node,
           |   CAST($t AS BIGINT) AS step
           | FROM w${t - 1} w JOIN dg ON dg.src = w.node
           | JOIN rk ON rk.src = w.node AND rk.rnk = ${pick(t)})""".stripMargin
      s"""WITH e AS (SELECT DISTINCT * FROM (
        |   SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst FROM nation
        |   UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
        |   UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey FROM orders)),
        | rk AS (SELECT src, dst, CAST(row_number() OVER (
        |     PARTITION BY src ORDER BY dst) AS BIGINT) AS rnk FROM e),
        | dg AS (SELECT src, count(*) AS deg FROM rk GROUP BY src),
        | w0 AS (SELECT node AS walk_id, node, CAST(0 AS BIGINT) AS step
        |  FROM (SELECT 'r:'||r_regionkey AS node FROM region
        |        UNION SELECT 'n:'||n_nationkey FROM nation)),
        | ${round(1)}, ${round(2)}, ${round(3)}
        | SELECT walk_id, node, step FROM w0
        | UNION ALL SELECT walk_id, node, step FROM w1
        | UNION ALL SELECT walk_id, node, step FROM w2
        | UNION ALL SELECT walk_id, node, step FROM w3""".stripMargin
    },

    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM lineitem
        | GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "rel_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM orders
        | GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    // the unpivoted roundtrip must equal the direct long-form answer
    "rel_unpivot" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours
        | FROM events GROUP BY 1""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM orders
        | GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |   (o_orderstatus), (o_orderpriority))""".stripMargin,

    "rel_pivot" ->
      """SELECT date_trunc('hour', ts) AS h,
        | count(*) FILTER (event_type = 'click') AS n_click,
        | count(*) FILTER (event_type = 'view') AS n_view,
        | count(*) FILTER (event_type = 'signup') AS n_signup,
        | count(*) FILTER (event_type = 'purchase') AS n_purchase,
        | count(*) FILTER (event_type = 'error') AS n_error
        | FROM events GROUP BY 1""".stripMargin,

    // state-change rows survive; intervals close on the NEXT change
    // (valid_to null = current); version counts changes per user
    "rel_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |   lag(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS pty FROM events),
        | ch AS (SELECT user_id, ts, event_id, event_type FROM o
        |   WHERE pty IS NULL OR event_type <> pty)
        | SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS BIGINT) AS version
        | FROM ch""".stripMargin,

    // islands via the rank-difference trick on distinct active hours
    "rel_gap_islands" ->
      """WITH h AS (SELECT DISTINCT user_id,
        |   CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hr
        |   FROM events),
        | g AS (SELECT user_id, hr,
        |   hr - row_number() OVER (PARTITION BY user_id ORDER BY hr) AS grp
        |  FROM h),
        | i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        | SELECT user_id, count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_hours
        | FROM i GROUP BY 1""".stripMargin,

    "rel_next_event" ->
      """WITH o AS (SELECT user_id, event_type AS src_type,
        |   lead(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS dst_type FROM events)
        | SELECT src_type, dst_type, count(*) AS n FROM o
        | WHERE dst_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // z rounded to 6 decimals pre-compare so both engines classify
    // identical doubles (FIXTURES.md oracle-protocol float rule);
    // σ=0 → z=0 explicitly (Spark x/0 is NULL, DuckDB is inf)
    "rel_zscore_outliers" ->
      """WITH st AS (SELECT event_type, avg(value) AS mu,
        |   stddev_pop(value) AS sigma FROM events GROUP BY 1),
        | z AS (SELECT e.event_type, round(CASE WHEN sigma = 0 THEN 0
        |     ELSE abs(value - mu) / sigma END, 6) AS z
        |  FROM events e JOIN st USING (event_type))
        | SELECT event_type, count(*) AS n,
        |  CAST(count_if(z >= 2.0) AS BIGINT) AS n_outliers,
        |  max(z) AS max_z
        | FROM z GROUP BY 1""".stripMargin,

    // entropy via −Σp·log2 p = log2(total) − Σc·log2(c)/total (single
    // stats pass both sides); shares/ratios are divisions of exact
    // integer counts, so both engines round identical doubles
    "rel_skew_profile" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS cnt
        |   FROM events GROUP BY 1),
        | st AS (SELECT sum(cnt) AS total, count(*) AS n_keys,
        |   max(cnt) AS max_sz, sum(cnt * log2(cnt)) AS slog FROM c),
        | top AS (SELECT key, cnt,
        |   row_number() OVER (ORDER BY cnt DESC, key) AS rnk
        |  FROM c ORDER BY cnt DESC, key LIMIT 10)
        | SELECT CAST(rnk AS BIGINT) AS rnk, key, cnt,
        |  round(cnt * 1.0 / total, 6) AS share,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  round(total * 1.0 / n_keys, 6) AS mean_sz, max_sz,
        |  round(max_sz / (total * 1.0 / n_keys), 6) AS skew_ratio,
        |  round(log2(total) - slog / total, 6) AS entropy_bits
        | FROM top CROSS JOIN st""".stripMargin,

    // Σ c_A·c_B over the keys-sized join of the two count tables;
    // shares are divisions of exact integer counts
    "rel_join_cardinality" ->
      """WITH lc AS (SELECT o_custkey AS key, count(*) AS cnt_l
        |   FROM orders GROUP BY 1),
        | rc AS (SELECT c_custkey AS key, count(*) AS cnt_r
        |   FROM customer GROUP BY 1),
        | co AS (SELECT key, cnt_l, cnt_r, cnt_l * cnt_r AS contrib
        |   FROM lc JOIN rc USING (key)),
        | st AS (SELECT CAST(sum(contrib) AS BIGINT) AS est_rows,
        |   count(*) AS matching_keys FROM co),
        | sd AS (SELECT (SELECT CAST(sum(cnt_l) AS BIGINT) FROM lc) AS left_rows,
        |   (SELECT count(*) FROM lc) AS left_keys,
        |   (SELECT CAST(sum(cnt_r) AS BIGINT) FROM rc) AS right_rows,
        |   (SELECT count(*) FROM rc) AS right_keys),
        | top AS (SELECT key, cnt_l, cnt_r, contrib,
        |   row_number() OVER (ORDER BY contrib DESC, key) AS rnk
        |  FROM co ORDER BY contrib DESC, key LIMIT 10)
        | SELECT CAST(rnk AS BIGINT) AS rnk, key, cnt_l, cnt_r,
        |  CAST(contrib AS BIGINT) AS contrib,
        |  round(contrib * 1.0 / est_rows, 6) AS share,
        |  est_rows, CAST(matching_keys AS BIGINT) AS matching_keys,
        |  left_rows, CAST(left_keys AS BIGINT) AS left_keys,
        |  right_rows, CAST(right_keys AS BIGINT) AS right_keys
        | FROM top CROSS JOIN st CROSS JOIN sd""".stripMargin,

    // CAST day to TIMESTAMP: DuckDB date_trunc('day') yields DATE,
    // Spark's yields TIMESTAMP
    "rel_moving_sum" ->
      """WITH daily AS (SELECT n_name,
        |   CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |     AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        | SELECT n_name, day, rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY n_name ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov7_cents,
        |  CAST(count(*) OVER (PARTITION BY n_name ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov7_n
        | FROM daily""".stripMargin,

    // value-RANGE frame over day-truncated timestamps ≡ the engine's
    // epoch-second range frame (bounds land on exact midnights)
    "rel_range_window" ->
      """WITH daily AS (SELECT n_name,
        |   CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |     AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        | SELECT n_name, day, rev_cents,
        |  CAST(sum(rev_cents) OVER w AS BIGINT) AS r7_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS r7_n
        | FROM daily WINDOW w AS (PARTITION BY n_name ORDER BY day
        |   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin,

    // distributed Bloom build prunes only — oracle is the exact
    // semi-join (same contract as rel_bloom_semijoin)
    "rel_bloom_dist" ->
      """SELECT o_orderstatus AS st, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM orders
        | WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                     WHERE c_mktsegment = 'BUILDING')
        | GROUP BY 1""".stripMargin,

    "llm_domain_cap" ->
      s"""WITH t AS (SELECT doc_id, source,
        |   CAST(len($toksSql) AS BIGINT) AS n_tokens,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY n_chars DESC, doc_id) AS rk FROM documents)
        | SELECT source, count(*) AS n_docs,
        |  CAST(count_if(rk <= 30) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(n_tokens) FILTER (rk <= 30), 0) AS BIGINT) AS kept_tokens,
        |  CAST(coalesce(sum(n_tokens) FILTER (rk > 30), 0) AS BIGINT) AS dropped_tokens
        | FROM t GROUP BY 1""".stripMargin,

    "llm_length_buckets" ->
      s"""WITH t AS (SELECT CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
        | b AS (SELECT n_tok, least(n_tok // 16, 15) AS bucket FROM t)
        | SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        |  CAST(sum(CASE WHEN bucket < 15 THEN (bucket + 1) * 16 - n_tok
        |    ELSE 0 END) AS BIGINT) AS pad_waste
        | FROM b GROUP BY 1""".stripMargin,

    // streaming transitions ≡ the batch transition matrix when
    // micro-batches respect per-key time order (file replay does)
    "stream_transitions" ->
      """WITH o AS (SELECT user_id, event_type AS src_type,
        |   lead(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS dst_type FROM events)
        | SELECT src_type, dst_type, count(*) AS n FROM o
        | WHERE dst_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // theta intersection replay: same md5 u-hash, same θ = min of the
    // two kth mins (1.0 when a set fits its sketch), retained < θ
    "sketch_kmv_intersect" ->
      s"""WITH tok AS (SELECT lang AS g, unnest($toksSql) AS s
        |   FROM documents WHERE lang IN ('en', 'es')),
        | u AS (SELECT DISTINCT g, ($hash32Sql) / 4294967296.0 AS u FROM tok),
        | sk AS (SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn
        |   FROM u QUALIFY rn <= 64),
        | th AS (SELECT g, count(*) AS nd,
        |   max(CASE WHEN rn = 64 THEN u END) AS uk FROM sk GROUP BY g),
        | t AS (SELECT min(CASE WHEN nd < 64 THEN 1.0 ELSE uk END) AS theta FROM th),
        | ret AS (SELECT g, u, theta FROM sk, t WHERE u < theta),
        | m AS (SELECT u, theta, max(g = 'en') AS ia, max(g = 'es') AS ib
        |   FROM ret GROUP BY 1, 2)
        | SELECT CAST(count_if(ia) AS BIGINT) AS n_ret_a,
        |  CAST(count_if(ib) AS BIGINT) AS n_ret_b,
        |  CAST(count_if(ia AND ib) AS BIGINT) AS n_common,
        |  round(count_if(ia AND ib) / theta, 6) AS est_intersect,
        |  round(CAST(count_if(ia AND ib) AS DOUBLE) / count(*), 6) AS est_jaccard
        | FROM m GROUP BY theta""".stripMargin,

    // same retained-sample CTEs; a-not-b / b-not-a estimates
    "sketch_kmv_diff" ->
      s"""WITH tok AS (SELECT lang AS g, unnest($toksSql) AS s
        |   FROM documents WHERE lang IN ('en', 'es')),
        | u AS (SELECT DISTINCT g, ($hash32Sql) / 4294967296.0 AS u FROM tok),
        | sk AS (SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn
        |   FROM u QUALIFY rn <= 64),
        | th AS (SELECT g, count(*) AS nd,
        |   max(CASE WHEN rn = 64 THEN u END) AS uk FROM sk GROUP BY g),
        | t AS (SELECT min(CASE WHEN nd < 64 THEN 1.0 ELSE uk END) AS theta FROM th),
        | ret AS (SELECT g, u, theta FROM sk, t WHERE u < theta),
        | m AS (SELECT u, theta, max(g = 'en') AS ia, max(g = 'es') AS ib
        |   FROM ret GROUP BY 1, 2)
        | SELECT CAST(count_if(ia) AS BIGINT) AS n_ret_a,
        |  CAST(count_if(ib) AS BIGINT) AS n_ret_b,
        |  CAST(count_if(ia AND ib) AS BIGINT) AS n_common,
        |  round((count_if(ia) - count_if(ia AND ib)) / theta, 6) AS est_diff_ab,
        |  round((count_if(ib) - count_if(ia AND ib)) / theta, 6) AS est_diff_ba
        | FROM m GROUP BY theta""".stripMargin,

    // quantile_cont shares Spark percentile's linear interpolation
    "rel_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_quantity, 0.25), 6) AS q25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS q50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS q75
        | FROM lineitem GROUP BY 1""".stripMargin,

    // capped common-neighbor evidence; full degrees in the denominator
    "graph_common_neighbors" ->
      """WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |   FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | adj AS (SELECT a AS v, b AS n FROM e0
        |   UNION ALL SELECT b AS v, a AS n FROM e0),
        | deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY 1),
        | ctr AS (SELECT adj.v, adj.n FROM adj JOIN deg d ON d.v = adj.n
        |   WHERE d.deg <= 40),
        | pairs AS (SELECT x.v AS pa, y.v AS pb, count(*) AS common
        |   FROM ctr x JOIN ctr y ON x.n = y.n AND x.v < y.v
        |   GROUP BY 1, 2 HAVING count(*) >= 3),
        | sc AS (SELECT pa AS a, pb AS b, CAST(common AS BIGINT) AS common,
        |   CAST(round(CAST(common * 1000000 AS DOUBLE)
        |     / (da.deg + db.deg - common), 0) AS BIGINT) AS jacc_u
        |  FROM pairs JOIN deg da ON da.v = pa JOIN deg db ON db.v = pb)
        | SELECT a, b, common, jacc_u FROM sc
        | ORDER BY jacc_u DESC, a, b LIMIT 20""".stripMargin,

    // streaming retention ≡ batch cohort retention (rel_retention)
    "stream_retention" ->
      """WITH f AS (SELECT user_id AS u, date_trunc('hour', min(ts)) AS cohort
        |   FROM events GROUP BY 1),
        | a AS (SELECT DISTINCT user_id AS u, date_trunc('hour', ts) AS p FROM events),
        | fl AS (SELECT a.u, cohort,
        |   max(CASE WHEN p = cohort + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS f1,
        |   max(CASE WHEN p = cohort + INTERVAL 3 HOUR THEN 1 ELSE 0 END) AS f3,
        |   max(CASE WHEN p = cohort + INTERVAL 6 HOUR THEN 1 ELSE 0 END) AS f6
        |  FROM a JOIN f ON a.u = f.u GROUP BY 1, 2)
        | SELECT cohort, count(*) AS n_users,
        |  CAST(sum(f1) AS BIGINT) AS ret_1, CAST(sum(f3) AS BIGINT) AS ret_3,
        |  CAST(sum(f6) AS BIGINT) AS ret_6
        | FROM fl GROUP BY 1""".stripMargin,

    // native group top-k: same contract as rel_topk_window
    "rel_topk_native" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem) WHERE rk <= 3""".stripMargin,

    // nearest = min |gap| of the backward (<=) and forward (>=)
    // candidates, tie → backward; labelled correlated-subquery oracle
    "rel_asof_nearest" ->
      """WITH c AS (SELECT user_id AS u, ts AS c_ts,
        |   max_by(value, event_id) AS cv FROM events
        |   WHERE event_type = 'click' GROUP BY 1, 2),
        | p AS (SELECT event_id, user_id AS u, ts, epoch_us(ts) AS t
        |   FROM events WHERE event_type = 'purchase'),
        | sel AS (SELECT p.event_id, p.u, p.ts, p.t,
        |   (SELECT max(epoch_us(c_ts)) FROM c
        |     WHERE c.u = p.u AND epoch_us(c_ts) <= p.t) AS bt,
        |   (SELECT min(epoch_us(c_ts)) FROM c
        |     WHERE c.u = p.u AND epoch_us(c_ts) >= p.t) AS ft
        |  FROM p),
        | nr AS (SELECT event_id, u, ts, t,
        |   CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
        |    WHEN ft IS NULL THEN bt WHEN bt IS NULL THEN ft
        |    WHEN t - bt <= ft - t THEN bt ELSE ft END AS nt
        |  FROM sel)
        | SELECT nr.event_id, nr.u AS user_id, nr.ts,
        |  make_timestamp(nt) AS near_ts, c.cv AS near_v,
        |  CAST(abs(nr.t - nt) AS BIGINT) AS gap_us
        | FROM nr LEFT JOIN c ON c.u = nr.u AND epoch_us(c.c_ts) = nr.nt""".stripMargin,

    // HLL replay: same md5 hash, same 6/26 bit split, rank via binary
    // string length (no float log), same alpha and ln correction
    "sketch_hll_distinct" ->
      """WITH u AS (SELECT lang AS g,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) AS h
        | FROM documents),
        | r AS (SELECT g, h // 67108864 AS b, h % 67108864 AS rest FROM u),
        | rk AS (SELECT g, b, max(CASE WHEN rest = 0 THEN 27
        |    ELSE 27 - len(bin(rest)) END) AS reg FROM r GROUP BY 1, 2),
        | ag AS (SELECT g, count(*) AS present,
        |    sum(power(2.0, -reg)) AS sp FROM rk GROUP BY 1)
        | SELECT g AS lang,
        |  CASE WHEN 0.709 * 4096 / (sp + 64 - present) < 160
        |        AND present < 64
        |   THEN round(64 * ln(64.0 / (64 - present)), 6)
        |   ELSE round(0.709 * 4096 / (sp + 64 - present), 6) END
        |   AS est_distinct
        | FROM ag""".stripMargin,

    // streamed filter ≡ batch filter; result = exact clicks ⋉ purchasers
    "stream_bloom_semijoin" ->
      """SELECT user_id, count(*) AS n_clicks FROM events
        | WHERE event_type = 'click' AND user_id IN (
        |   SELECT user_id FROM events WHERE event_type = 'purchase')
        | GROUP BY 1""".stripMargin,

    // median/MAD via quantile_cont; dev rounded pre-compare;
    // MAD=0 → dev=0 explicitly (Spark x/0 is NULL, DuckDB is inf)
    "rel_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |   FROM events GROUP BY 1),
        | mad AS (SELECT e.event_type,
        |   quantile_cont(abs(value - med), 0.5) AS mad, any_value(med) AS med
        |  FROM events e JOIN med USING (event_type) GROUP BY 1)
        | SELECT e.event_type, count(*) AS n,
        |  CAST(count_if(round(CASE WHEN m.mad = 0 THEN 0
        |    ELSE abs(value - m.med) / m.mad END, 6) > 3.0) AS BIGINT)
        |    AS n_outliers,
        |  round(any_value(m.med), 6) AS med, round(any_value(m.mad), 6) AS mad
        | FROM events e JOIN mad m USING (event_type) GROUP BY 1""".stripMargin,

    // skyline oracle: the quadratic NOT-EXISTS dominance scan (labelled)
    "rel_skyline" ->
      """WITH p AS (SELECT DISTINCT CAST(p_retailprice AS DOUBLE) AS x,
        |   CAST(p_size AS DOUBLE) AS y FROM part)
        | SELECT x, y FROM p a WHERE NOT EXISTS (
        |  SELECT 1 FROM p b WHERE b.x <= a.x AND b.y >= a.y
        |    AND (b.x < a.x OR b.y > a.y))""".stripMargin,

    "text_hapax" ->
      s"""WITH tf AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        | c AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2)
        | SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
        |  count(*) AS n_types,
        |  CAST(count_if(tf = 1) AS BIGINT) AS n_hapax,
        |  round(CAST(count_if(tf = 1) AS DOUBLE) / count(*), 6) AS hapax_ratio
        | FROM c GROUP BY 1""".stripMargin,

    // union path: merge per-lang registers by max, then read out
    "sketch_hll_union" ->
      """WITH u AS (SELECT lang AS g,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(text), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) AS h
        | FROM documents),
        | r AS (SELECT g, h // 67108864 AS b, h % 67108864 AS rest FROM u),
        | rk AS (SELECT g, b, max(CASE WHEN rest = 0 THEN 27
        |    ELSE 27 - len(bin(rest)) END) AS reg FROM r GROUP BY 1, 2),
        | mg AS (SELECT b, max(reg) AS reg FROM rk GROUP BY 1),
        | ag AS (SELECT count(*) AS present,
        |    sum(power(2.0, -reg)) AS sp FROM mg)
        | SELECT CASE WHEN 0.709 * 4096 / (sp + 64 - present) < 160
        |        AND present < 64
        |   THEN round(64 * ln(64.0 / (64 - present)), 6)
        |   ELSE round(0.709 * 4096 / (sp + 64 - present), 6) END
        |   AS est_distinct
        | FROM ag""".stripMargin,

    // streaming registers ≡ batch registers (max-mergeable): oracle =
    // the batch sketch of distinct users per type
    "stream_hll_users" ->
      """WITH u AS (SELECT event_type AS g,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) AS h
        | FROM events),
        | r AS (SELECT g, h // 67108864 AS b, h % 67108864 AS rest FROM u),
        | rk AS (SELECT g, b, max(CASE WHEN rest = 0 THEN 27
        |    ELSE 27 - len(bin(rest)) END) AS reg FROM r GROUP BY 1, 2),
        | ag AS (SELECT g, count(*) AS present,
        |    sum(power(2.0, -reg)) AS sp FROM rk GROUP BY 1)
        | SELECT g AS event_type,
        |  CASE WHEN 0.709 * 4096 / (sp + 64 - present) < 160
        |        AND present < 64
        |   THEN round(64 * ln(64.0 / (64 - present)), 6)
        |   ELSE round(0.709 * 4096 / (sp + 64 - present), 6) END
        |   AS est_distinct
        | FROM ag""".stripMargin,

    // bigram blocking is lossless above any Dice threshold > 0
    "rel_fuzzy_join" ->
      """WITH pr AS (SELECT unnest(['NATON_1', 'NATIN_12', 'NATIOM_22',
        |     'XYZZY']) AS probe),
        | lb AS (SELECT probe, unnest(list_distinct(list_transform(range(1, len(probe)), i -> substr(probe, CAST(i AS INT), 2)))) AS bg FROM pr),
        | rb AS (SELECT n_name, unnest(list_distinct(list_transform(range(1, len(n_name)), i -> substr(n_name, CAST(i AS INT), 2)))) AS bg FROM nation),
        | cand AS (SELECT DISTINCT probe, n_name FROM lb JOIN rb USING (bg)),
        | sc AS (SELECT probe, n_name AS matched,
        |   round(2.0 * len(list_intersect(list_distinct(list_transform(range(1, len(probe)), i -> substr(probe, CAST(i AS INT), 2))),
        |       list_distinct(list_transform(range(1, len(n_name)), i -> substr(n_name, CAST(i AS INT), 2)))))
        |     / (len(list_distinct(list_transform(range(1, len(probe)), i -> substr(probe, CAST(i AS INT), 2)))) + len(list_distinct(list_transform(range(1, len(n_name)), i -> substr(n_name, CAST(i AS INT), 2))))), 6) AS sim
        |  FROM cand),
        | best AS (SELECT probe, matched, sim, row_number() OVER (
        |    PARTITION BY probe ORDER BY sim DESC, matched) AS rk
        |  FROM sc WHERE sim >= 0.5)
        | SELECT probe, matched, sim FROM best WHERE rk = 1""".stripMargin,

    // two-pass equi-width histogram; bucket arithmetic in doubles on
    // both engines (identical inputs → identical buckets); hi=lo →
    // bucket 0 explicitly (x/0: NULL in Spark, inf/nan in DuckDB)
    "rel_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |   FROM orders)
        | SELECT CASE WHEN hi = lo THEN 0
        |   ELSE least(15, CAST(floor((o_totalprice - lo) * 16.0 / (hi - lo))
        |     AS BIGINT)) END AS bucket, count(*) AS n
        | FROM orders, mm GROUP BY 1""".stripMargin,

    // token-sorted entropy fold (list_reduce in tok order = the
    // engine's array_sort + aggregate association order)
    "text_token_entropy" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        | tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
        |   FROM tok GROUP BY 1, 2),
        | agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n,
        |   list(tf ORDER BY tok) AS ts FROM tf GROUP BY 1)
        | SELECT doc_id, n, round(-list_reduce(
        |   list_prepend(CAST(0 AS DOUBLE),
        |     list_transform(ts, x -> (x / n) * ln(x / n))),
        |   (a, x) -> a + x), 6) AS entropy
        | FROM agg""".stripMargin,

    // interval-containment oracle over the SCD-2 CTE (ends exclusive,
    // open tail) ≡ the engine's as-of + version tie-break
    "rel_scd2_lookup" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |   lag(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS pty FROM events),
        | ch AS (SELECT user_id, ts, event_id, event_type FROM o
        |   WHERE pty IS NULL OR event_type <> pty),
        | iv AS (SELECT user_id, event_type AS state, ts AS vf,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
        |   CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS BIGINT) AS version FROM ch),
        | f AS (SELECT event_id, user_id, ts FROM events
        |   WHERE event_type = 'purchase')
        | SELECT f.event_id, f.user_id, f.ts, iv.state, iv.version
        | FROM f JOIN iv ON iv.user_id = f.user_id
        |   AND iv.vf <= f.ts AND (iv.vt IS NULL OR f.ts < iv.vt)""".stripMargin,

    // latest row per key via the same (ts, id) total order
    "rel_dedup_latest" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        | SELECT user_id, ts AS last_ts, event_id AS last_id,
        |  event_type AS last_type, value AS last_value
        | FROM r WHERE rn = 1""".stripMargin,

    // streaming islands ≡ the batch rank-difference computation
    "stream_gap_islands" ->
      """WITH h AS (SELECT DISTINCT user_id,
        |   CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hr
        |   FROM events),
        | g AS (SELECT user_id, hr,
        |   hr - row_number() OVER (PARTITION BY user_id ORDER BY hr) AS grp
        |  FROM h),
        | i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        | SELECT user_id, count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_hours
        | FROM i GROUP BY 1""".stripMargin,

    // JSON round-trip must be value-exact → aggregate over raw parquet
    "ext_json_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | round(sum(value), 6) AS sum_value
        | FROM events GROUP BY 1""".stripMargin,

    // ordered fold replay: DuckDB's list_reduce seeds with the first
    // element and folds (acc, x) left-to-right — exactly the engine's
    // aggregate(slice(vs,2,…), first, …); same float op sequence
    "rel_ewma" ->
      """WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
        |   FROM events GROUP BY 1)
        | SELECT user_id, CAST(len(vs) AS INTEGER) AS n,
        |  round(list_reduce(vs, (a, x) -> 0.3 * x + 0.7 * a), 6) AS ewma
        | FROM g""".stripMargin,

    // typed columnar round-trip must be value-exact too
    "ext_orc_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | round(sum(value), 6) AS sum_value
        | FROM events GROUP BY 1""".stripMargin,

    // RFC-4180 text round-trip must be value-exact too
    "ext_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | round(sum(value), 6) AS sum_value
        | FROM events GROUP BY 1""".stripMargin,

    // markup round-trip must be value-exact too (full-precision double
    // text round-trip through the XML writer/parser)
    "ext_xml_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | round(sum(value), 6) AS sum_value
        | FROM events GROUP BY 1""".stripMargin,

    // line-format RDF round-trip: closed-form re-statement of the
    // typed fixture (escape-stress string incl. quote/newline/tab/
    // backslash must come back verbatim)
    "ext_ntriples_roundtrip" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
        |   CAST(n_regionkey AS BIGINT) AS rk FROM nation)
        | SELECT 'instance' AS g, 'tpch:nation/'||k AS s, 'ex:name' AS p,
        |   'l' AS o_kind, 'xsd:string' AS o_typ,
        |   nm||'"'||chr(10)||chr(9)||'\é' AS v,
        |   CAST(NULL AS VARCHAR) AS o_lang FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:key', 'l',
        |   'xsd:integer', CAST(k AS VARCHAR), NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:even', 'l',
        |   'xsd:boolean', CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END,
        |   NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:frac', 'l',
        |   'xsd:double', CAST(CAST(rk + 0.25 AS DOUBLE) AS VARCHAR),
        |   NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:region', 'i',
        |   'iri', 'tpch:region/'||rk, NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:tag', 'l',
        |   'xsd:string', nm, 'en' FROM n""".stripMargin,

    // prefixed-Turtle round-trip: EAV restatement of the dumped
    // customer predicates (pnames expand back to the store's canonical
    // prefixed IRIs; `a` back to rdf:type; bare ints to xsd:integer)
    "ext_turtle_dist" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS nm,
        |   c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nk
        |   FROM customer)
        | SELECT 'instance' AS g, 'tpch:customer/'||k AS s,
        |   'tpch:c_custkey' AS p, 'l' AS o_kind,
        |   CAST(NULL AS VARCHAR) AS o_iri, 'xsd:integer' AS o_typ,
        |   CAST(NULL AS VARCHAR) AS o_str, k AS o_lng FROM c
        | UNION ALL SELECT 'instance', 'tpch:customer/'||k, 'tpch:c_name',
        |   'l', NULL, 'xsd:string', nm, NULL FROM c
        | UNION ALL SELECT 'instance', 'tpch:customer/'||k,
        |   'tpch:c_mktsegment', 'l', NULL, 'xsd:string', seg, NULL FROM c
        | UNION ALL SELECT 'instance', 'tpch:customer/'||k,
        |   'tpch:c_nationkey', 'i', 'tpch:nation/'||nk, NULL, NULL, NULL
        |   FROM c
        | UNION ALL SELECT 'instance', 'tpch:customer/'||k, 'rdf:type',
        |   'i', 'tpch:Customer', NULL, NULL, NULL FROM c""".stripMargin,

    // quad sibling: identical statement set, with the graph label
    // riding two predicates into a second named graph
    "ext_nquads_roundtrip" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
        |   CAST(n_regionkey AS BIGINT) AS rk FROM nation)
        | SELECT 'instance' AS g, 'tpch:nation/'||k AS s, 'ex:name' AS p,
        |   'l' AS o_kind, 'xsd:string' AS o_typ,
        |   nm||'"'||chr(10)||chr(9)||'\é' AS v,
        |   CAST(NULL AS VARCHAR) AS o_lang FROM n
        | UNION ALL SELECT 'g:audit', 'tpch:nation/'||k, 'ex:key', 'l',
        |   'xsd:integer', CAST(k AS VARCHAR), NULL FROM n
        | UNION ALL SELECT 'g:audit', 'tpch:nation/'||k, 'ex:even', 'l',
        |   'xsd:boolean', CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END,
        |   NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:frac', 'l',
        |   'xsd:double', CAST(CAST(rk + 0.25 AS DOUBLE) AS VARCHAR),
        |   NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:region', 'i',
        |   'iri', 'tpch:region/'||rk, NULL FROM n
        | UNION ALL SELECT 'instance', 'tpch:nation/'||k, 'ex:tag', 'l',
        |   'xsd:string', nm, 'en' FROM n""".stripMargin,

    // streaming decode must reproduce the batch codec's closed form
    "stream_mm_meta" ->
      """SELECT doc_id, 1 + doc_id % 64 AS width, 1 + doc_id % 48 AS height,
        | 'image/png' AS format FROM documents""".stripMargin,

    // the commit-per-micro-batch chain must materialize to exactly the
    // batch encode: one triple per order per streamed predicate
    "stream_ingest_commits" ->
      """SELECT 'tpch:o_custkey' AS p, count(*) AS n FROM orders
        | UNION ALL
        | SELECT 'tpch:o_totalprice', count(*) FROM orders""".stripMargin,

    // closed-form restatement of the N-Quads fixture after the
    // parse-on-stream → commit-per-batch → materialize round trip
    "stream_nquads_ingest" ->
      """WITH s AS (SELECT count(*) AS c,
        |   CAST(sum(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS sk
        |  FROM nation)
        | SELECT 'g:audit' AS g, 'ex:key' AS p, c AS n, sk AS sum_lng FROM s
        | UNION ALL SELECT 'g:audit', 'ex:even', c, NULL FROM s
        | UNION ALL SELECT 'instance', 'ex:name', c, NULL FROM s
        | UNION ALL SELECT 'instance', 'ex:frac', c, NULL FROM s
        | UNION ALL SELECT 'instance', 'ex:region', c, NULL FROM s
        | UNION ALL SELECT 'instance', 'ex:tag', c, NULL FROM s""".stripMargin,

    // seven analytic windows over one (nation, acctbal desc, custkey)
    // order; cume_dist as its exact integer numerator (see engine note)
    "rel_window_suite" ->
      """SELECT c_custkey, c_nationkey,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 6) AS prk,
        | CAST(round(cume_dist() OVER w * count(*) OVER wf, 0) AS BIGINT) AS cd_num,
        | count(*) OVER wf AS n,
        | first(c_custkey) OVER wf AS richest,
        | last(c_custkey) OVER wf AS poorest
        | FROM customer
        | WINDOW w AS (PARTITION BY c_nationkey
        |     ORDER BY c_acctbal DESC, c_custkey),
        |   wf AS (PARTITION BY c_nationkey
        |     ORDER BY c_acctbal DESC, c_custkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    // streaming attribution ≡ the batch EXISTS formulation
    "stream_attribution" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_us(ts) AS t,
        |   ts, event_type AS ty FROM events)
        | SELECT date_trunc('hour', p.ts) AS h, count(*) AS n_conv,
        |  CAST(count_if(EXISTS (SELECT 1 FROM e c WHERE c.u = p.u
        |    AND c.ty = 'click'
        |    AND (c.t < p.t OR (c.t = p.t AND c.id < p.id))
        |    AND p.t - c.t <= 7200000000)) AS BIGINT) AS n_attributed
        | FROM e p WHERE p.ty = 'purchase' GROUP BY 1""".stripMargin,

    // grid = nations × global day span; day cast TIMESTAMP (DuckDB
    // date_trunc yields DATE); zero-fill then running cumulative
    "rel_gapfill_daily" ->
      """WITH daily AS (SELECT n_name,
        |   CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
        | span AS (SELECT CAST(date_trunc('day', min(o_orderdate)) AS TIMESTAMP) AS d0,
        |   CAST(date_trunc('day', max(o_orderdate)) AS TIMESTAMP) AS d1 FROM orders),
        | grid AS (SELECT n_name, unnest(generate_series(d0, d1,
        |     INTERVAL 1 DAY)) AS day FROM nation, span),
        | filled AS (SELECT g.n_name, g.day,
        |   coalesce(daily.rev, 0) AS rev_cents
        |  FROM grid g LEFT JOIN daily ON g.n_name = daily.n_name
        |    AND g.day = daily.day)
        | SELECT n_name, day, CAST(rev_cents AS BIGINT) AS rev_cents,
        |  CAST(sum(rev_cents) OVER (PARTITION BY n_name ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents
        | FROM filled""".stripMargin,

    // per-stratum hash-ordered k-sample (native top-k path)
    "llm_sample_per_group" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(list_sum(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(md5('psamp:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |         * power(16, 8 - i))) AS BIGINT) AS h
        |  FROM documents),
        | r AS (SELECT doc_id, lang, h, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk FROM t)
        | SELECT doc_id, lang, h, rk FROM r WHERE rk <= 20""".stripMargin,

    // streaming funnel ≡ batch funnel (time-ordered replay); same
    // k-way self-join EXISTS oracle as rel_funnel
    "stream_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_us(ts) AS t,
        |   event_type AS ty FROM events),
        | us AS (SELECT DISTINCT u FROM e),
        | l1 AS (SELECT DISTINCT u FROM e WHERE ty = 'click'),
        | l2 AS (SELECT DISTINCT a.u FROM e a JOIN e b ON a.u = b.u
        |   AND a.ty = 'click' AND b.ty = 'view'
        |   AND (a.t < b.t OR (a.t = b.t AND a.id < b.id))
        |   AND b.t - a.t <= 7200000000),
        | l3 AS (SELECT DISTINCT a.u FROM e a JOIN e b ON a.u = b.u
        |   AND a.ty = 'click' AND b.ty = 'view'
        |   AND (a.t < b.t OR (a.t = b.t AND a.id < b.id))
        |   JOIN e c ON c.u = a.u AND c.ty = 'purchase'
        |   AND (b.t < c.t OR (b.t = c.t AND b.id < c.id))
        |   AND c.t - a.t <= 7200000000),
        | lv AS (SELECT us.u, CASE WHEN l3.u IS NOT NULL THEN 3
        |     WHEN l2.u IS NOT NULL THEN 2
        |     WHEN l1.u IS NOT NULL THEN 1 ELSE 0 END AS lev
        |   FROM us LEFT JOIN l1 ON us.u = l1.u
        |   LEFT JOIN l2 ON us.u = l2.u LEFT JOIN l3 ON us.u = l3.u)
        | SELECT CAST(lev AS BIGINT) AS level, count(*) AS n_users
        | FROM lv GROUP BY 1""".stripMargin
  )

  private lazy val dsirWeightsSql: String =
    s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
      | tok AS (SELECT doc_id, lang, unnest(toks) AS s,
      |    generate_subscripts(toks, 1) AS pos FROM d),
      | tb AS (SELECT doc_id, lang, pos, $hash32Sql % 64 AS b FROM tok),
      | c AS (SELECT b, count(*) AS n_raw,
      |    count_if(lang = 'en') AS n_tgt FROM tb GROUP BY 1),
      | tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM c),
      | lr AS (SELECT b, ln((n_tgt + 1) / CAST(t_tgt + 64 AS DOUBLE))
      |      - ln((n_raw + 1) / CAST(t_raw + 64 AS DOUBLE)) AS lr FROM c, tot),
      | w AS (SELECT tb.doc_id, list_reduce(
      |     list_prepend(CAST(0 AS DOUBLE), list(lr.lr ORDER BY tb.pos)),
      |     (a, x) -> a + x) AS weight
      |  FROM tb JOIN lr ON tb.b = lr.b GROUP BY tb.doc_id)
      | SELECT d.doc_id, d.lang, round(coalesce(w.weight, 0), 6) AS weight
      | FROM d LEFT JOIN w ON d.doc_id = w.doc_id""".stripMargin

  /** Unrolled Lloyd CTEs replaying Clustering.kmeansSq8(k=8, iters=3,
    * dim=64) round-for-round: q = sq8 codes, c0 = codes of the 8
    * lowest vec_ids, aN = argmin assignment under c(N−1) (the distance
    * is the SAME left-assoc sum-of-squares op sequence the engine
    * folds, so ties resolve identically), cN = exact-integer-sum
    * means with empty clusters keeping their previous centroid. */
  /** Batch-vs-corpus dedup oracle, shared by the batch operator and
    * its streaming foreachBatch twin (same total classification set). */
  private def incrDedupSql: String =
      s"""WITH nf AS (SELECT doc_id, (doc_id % 10 < 2) AS isnew FROM documents),
        | ch AS (SELECT d.doc_id, nf.isnew,
        |    md5(trim(regexp_replace(lower(d.text), '[^a-z0-9]+', ' ', 'g'))) AS h
        |  FROM documents d JOIN nf ON nf.doc_id = d.doc_id),
        | corpus_h AS (SELECT DISTINCT h FROM ch WHERE NOT isnew),
        | ex AS (SELECT c.doc_id, (corpus_h.h IS NOT NULL) AS exact_dup
        |  FROM ch c LEFT JOIN corpus_h ON c.h = corpus_h.h WHERE c.isnew),
        | sh AS (SELECT doc_id, $shSql AS shs FROM documents),
        | h AS (SELECT doc_id, $hash32Sql AS hv FROM
        |        (SELECT doc_id, unnest(shs) AS s FROM sh)),
        | sig AS (SELECT doc_id,
        |   min((1000003*hv+12345) % 4294967311) AS m0,
        |   min((2000029*hv+54321) % 4294967311) AS m1,
        |   min((3000073*hv+11111) % 4294967311) AS m2,
        |   min((4000037*hv+22222) % 4294967311) AS m3,
        |   min((5000011*hv+33333) % 4294967311) AS m4,
        |   min((6000011*hv+44444) % 4294967311) AS m5,
        |   min((7000003*hv+55555) % 4294967311) AS m6,
        |   min((8000009*hv+66666) % 4294967311) AS m7
        |  FROM h GROUP BY doc_id),
        | cand AS (SELECT DISTINCT a.doc_id AS dn, b.doc_id AS dc
        |  FROM sig a JOIN nf na ON na.doc_id = a.doc_id AND na.isnew
        |   JOIN sig b ON (
        |    md5(a.m0||'_'||a.m1) = md5(b.m0||'_'||b.m1) OR
        |    md5(a.m2||'_'||a.m3) = md5(b.m2||'_'||b.m3) OR
        |    md5(a.m4||'_'||a.m5) = md5(b.m4||'_'||b.m5) OR
        |    md5(a.m6||'_'||a.m7) = md5(b.m6||'_'||b.m7))
        |   JOIN nf nb ON nb.doc_id = b.doc_id AND NOT nb.isnew),
        | near AS (SELECT dn, count(*) AS n_near, min(dc) AS near_min FROM (
        |   SELECT cand.dn, cand.dc FROM cand
        |    JOIN sh x ON x.doc_id = cand.dn JOIN sh y ON y.doc_id = cand.dc
        |   WHERE len(list_intersect(x.shs, y.shs)) * 1.0 /
        |     len(list_distinct(list_concat(x.shs, y.shs))) >= 0.5)
        |  GROUP BY dn)
        | SELECT e.doc_id,
        |  CASE WHEN e.exact_dup THEN 'exact'
        |       WHEN near.n_near IS NOT NULL THEN 'near'
        |       ELSE 'new' END AS status,
        |  coalesce(near.n_near, 0) AS n_near, near.near_min
        | FROM ex e LEFT JOIN near ON near.dn = e.doc_id""".stripMargin

  /** Shared CTE chain of the cleaning pipeline (quality gate → exact
    * dedup keepers → MinHash-LSH losers), ending at `losers`; the
    * pipeline_clean and pipeline_v2 oracles append their selects. */
  private def pipelineCleanCtes: String =
    "WITH " + pipelineCleanBody("documents")

  /** The v1 cleaning chain's CTE body (quality gate → exact dedup →
    * LSH near-dup losers), parameterized on the source relation so v4
    * can run it over the DECONTAMINATED corpus. */
  private def pipelineCleanBody(from: String): String =
    s"""q AS (SELECT doc_id,
      |   round(len(list_filter($toksSql, x -> list_contains(
      |     ['the','a','of','and','to','in','is','it'], x))) * 1.0 / len($toksSql), 6)
      |     AS stop_ratio,
      |   round(list_sum(list_transform($toksSql, x -> length(x))) * 1.0
      |     / len($toksSql), 6) AS mean_tok_len
      |  FROM $from),
      | gated AS (SELECT d.doc_id, d.text FROM $from d JOIN q USING (doc_id)
      |  WHERE q.stop_ratio <= 0.5 AND q.mean_tok_len >= 2.0),
      | keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
      | ek AS (SELECT g.doc_id, g.text FROM gated g JOIN keep USING (doc_id)),
      | sh AS (SELECT doc_id, $shSql AS shs FROM ek),
      | h AS (SELECT doc_id, $hash32Sql AS hv FROM
      |        (SELECT doc_id, unnest(shs) AS s FROM sh)),
      | sig AS (SELECT doc_id,
      |   min((1000003*hv+12345) % 4294967311) AS m0,
      |   min((2000029*hv+54321) % 4294967311) AS m1,
      |   min((3000073*hv+11111) % 4294967311) AS m2,
      |   min((4000037*hv+22222) % 4294967311) AS m3,
      |   min((5000011*hv+33333) % 4294967311) AS m4,
      |   min((6000011*hv+44444) % 4294967311) AS m5,
      |   min((7000003*hv+55555) % 4294967311) AS m6,
      |   min((8000009*hv+66666) % 4294967311) AS m7
      |  FROM h GROUP BY doc_id),
      | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
      |    md5(a.m0||'_'||a.m1) = md5(b.m0||'_'||b.m1) OR
      |    md5(a.m2||'_'||a.m3) = md5(b.m2||'_'||b.m3) OR
      |    md5(a.m4||'_'||a.m5) = md5(b.m4||'_'||b.m5) OR
      |    md5(a.m6||'_'||a.m7) = md5(b.m6||'_'||b.m7))),
      | losers AS (SELECT DISTINCT db AS doc_id
      |  FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
      |  WHERE len(list_intersect(x.shs, y.shs)) * 1.0 /
      |    len(list_distinct(list_concat(x.shs, y.shs))) >= 0.5)""".stripMargin

  /** Unrolled scaled-integer PageRank rounds (= operators.PageRank
    * .fixedPoint over the orders→customer→nation→region FK graph):
    * every op is exact integer arithmetic (`//`, BIGINT sums), so the
    * replay is bit-identical round-for-round. */
  private def pagerankSql(iters: Int, scale: Long = 1000000000L): String = {
    val base = 15L * scale / 100
    val rounds = (1 to iters).map { n =>
      s"""p$n AS (SELECT nd.node, CAST($base + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS pr
         | FROM nodes nd LEFT JOIN (
         |  SELECT e.dst AS node, sum(p.pr // d.deg) AS inflow
         |  FROM e JOIN p${n - 1} p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst) i ON nd.node = i.node)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       | p0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM nodes),
       | $rounds
       | SELECT node, pr FROM p$iters""".stripMargin
  }

  /** Unrolled synchronous label-propagation rounds (= Lpa.communities
    * over the same FK entity graph as graph_pagerank, undirected):
    * per round, every node takes its neighbors' most frequent label,
    * ties to the LEAST label — pure integer counts and string
    * comparisons, so the replay is exact. */
  private def lpaSql(rounds: Int): String = {
    val steps = (1 to rounds).map { n =>
      s"""c$n AS (SELECT e.dst AS node, p.lbl AS nl, count(*) AS c
         |   FROM e JOIN l${n - 1} p ON e.src = p.node GROUP BY 1, 2),
         | w$n AS (SELECT node, nl FROM (SELECT node, nl,
         |     row_number() OVER (PARTITION BY node ORDER BY c DESC, nl ASC) AS rn
         |   FROM c$n) WHERE rn = 1),
         | l$n AS (SELECT nd.node, coalesce(w.nl, nd.node) AS lbl
         |   FROM nodes nd LEFT JOIN w$n w ON nd.node = w.node)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | ed AS (SELECT src, dst FROM e0 WHERE src <> dst),
       | e AS (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
       | nodes AS (SELECT DISTINCT src AS node FROM e),
       | l0 AS (SELECT node, node AS lbl FROM nodes),
       | $steps
       | SELECT node, lbl AS community FROM l$rounds""".stripMargin
  }

  /** Newman modularity over the lpaSql partition: the label query
    * nests as a subquery CTE (inner WITH scope shadows the outer edge
    * CTEs); all moments integer, one micro-rounded division with the
    * SAME operand order as the engine. */
  private def modularitySql(rounds: Int): String =
    s"""WITH lab AS (
       |${lpaSql(rounds)}
       | ),
       | e0 AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       |  UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       |  UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | ed AS (SELECT src, dst FROM e0 WHERE src <> dst),
       | e AS (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
       | deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
       | tm AS (SELECT CAST(sum(d) AS BIGINT) AS two_m FROM deg),
       | ew AS (SELECT CAST(count(*) AS BIGINT) AS e_within2 FROM e
       |   JOIN lab a ON e.src = a.node JOIN lab b ON e.dst = b.node
       |   WHERE a.community = b.community),
       | dc AS (SELECT a.community, sum(d) AS dcv
       |   FROM lab a JOIN deg ON a.node = deg.node GROUP BY 1),
       | d2 AS (SELECT CAST(sum(dcv * dcv) AS BIGINT) AS dc2_sum,
       |   CAST(count(*) AS BIGINT) AS communities FROM dc)
       | SELECT communities, two_m, e_within2, dc2_sum,
       |   CAST(round(1000000.0 * (two_m * e_within2 - dc2_sum)
       |     / (two_m * two_m), 0) AS BIGINT) AS q_micro
       | FROM d2, tm, ew""".stripMargin

  /** Landmark-closeness BFS unrolled to `hops` min-dist rounds over
    * the undirected FK entity graph (= Centrality.landmarkCloseness:
    * least-id landmarks, k·V distance table, one micro-rounded final
    * division with pinned operand order). */
  /** Shared landmark-BFS WITH-prefix (= Centrality.landmarkDistances):
    * `d<hops>` holds (l, node, dist) min distances. */
  private def landmarkBfsWith(k: Int, hops: Int): String = {
    val steps = (1 to hops).map { h =>
      s"""d$h AS MATERIALIZED (SELECT l, node, min(dist) AS dist FROM (
         |   SELECT l, node, dist FROM d${h - 1}
         |   UNION ALL
         |   SELECT d.l, e.dst AS node, d.dist + 1
         |   FROM d${h - 1} d JOIN e ON e.src = d.node) GROUP BY 1, 2)"""
        .stripMargin
    }.mkString(",\n ")
    s"""WITH e0 AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | ed AS (SELECT src, dst FROM e0 WHERE src <> dst),
       | e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
       | lm AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e)
       |   ORDER BY node LIMIT $k),
       | d0 AS (SELECT node AS l, node, CAST(0 AS BIGINT) AS dist FROM lm),
       | $steps""".stripMargin
  }

  /** Double-sweep diameter (= Centrality.doubleSweepDiameter): both
    * BFS sweeps unrolled with the same hop cap; far-node tie-break is
    * (dist DESC, node) in both engines. */
  private def diameterSql(hops: Int): String = {
    def sweep(p: String): String = (1 to hops).map { h =>
      s"""$p$h AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
         |   SELECT node, dist FROM $p${h - 1}
         |   UNION ALL
         |   SELECT e.dst AS node, d.dist + 1
         |   FROM $p${h - 1} d JOIN e ON e.src = d.node) GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n ")
    s"""WITH e0 AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | ed AS (SELECT src, dst FROM e0 WHERE src <> dst),
       | e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)),
       | a0 AS (SELECT (SELECT min(src) FROM e) AS node,
       |   CAST(0 AS BIGINT) AS dist),
       | ${sweep("a")},
       | far AS (SELECT node, dist FROM a$hops
       |   ORDER BY dist DESC, node LIMIT 1),
       | b0 AS (SELECT (SELECT node FROM far) AS node,
       |   CAST(0 AS BIGINT) AS dist),
       | ${sweep("b")}
       | SELECT (SELECT min(src) FROM e) AS start_node,
       |   (SELECT node FROM far) AS far_node,
       |   (SELECT dist FROM far) AS ecc_start,
       |   (SELECT CAST(max(dist) AS BIGINT) FROM b$hops) AS diam_lb,
       |   (SELECT 2 * dist FROM far) AS diam_ub""".stripMargin
  }

  private def closenessSql(k: Int, hops: Int): String =
    s"""${landmarkBfsWith(k, hops)}
       | SELECT node, CAST(count(*) AS BIGINT) AS reached,
       |   CAST(sum(dist) AS BIGINT) AS sum_dist,
       |   CASE WHEN sum(dist) > 0 THEN CAST(round(1000000.0 * count(*)
       |       / sum(dist), 0) AS BIGINT)
       |     ELSE 0 END AS closeness_micro
       | FROM d$hops GROUP BY 1""".stripMargin

  /** Harmonic variant (= Centrality.landmarkHarmonic): Σ ⌊1e6/d⌋ over
    * finite d ≥ 1 — exact integer terms, no float anywhere. */
  private def harmonicSql(k: Int, hops: Int): String =
    s"""${landmarkBfsWith(k, hops)}
       | SELECT node, CAST(count(*) AS BIGINT) AS reached,
       |   CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_micro
       | FROM d$hops WHERE dist >= 1 GROUP BY 1""".stripMargin

  /** Unrolled full-batch logistic-regression descent (=
    * Classifier.logistic: hashed-unigram counts + bias, integer
    * micro-unit weights, sigmoid rounded at the integer boundary,
    * sign-symmetric truncating step): per round, z = exact long dot
    * product, p = micro sigmoid, g = exact integer gradient sums,
    * w += trunc(g / (n·stepDiv)). */
  /** Unrolled power-iteration-with-deflation PCA (= Pca.powerProjection):
    * the same quantize-each-round contract — round the max-abs-scaled
    * direction to 6 decimals at every round boundary so cross-engine
    * float-sum drift (~1e-13) never reaches the per-row projections;
    * deflation replays Gram-Schmidt against each PREVIOUS component's
    * FINAL quantized list. */
  private def pcaSql(dim: Int, iters: Int, nComp: Int): String = {
    def compSteps(c: Int): String = (1 to iters).map { n =>
      val core =
        s"""c${c}y$n AS MATERIALIZED (SELECT vec_id,
           |   list_dot_product(x, (SELECT vl FROM c${c}v${n - 1}l)) -
           |   list_dot_product((SELECT ml FROM mul),
           |     (SELECT vl FROM c${c}v${n - 1}l)) AS y FROM e),
           | c${c}s$n AS MATERIALIZED (SELECT k, sum(x[k] * yy.y) AS s
           |   FROM e JOIN c${c}y$n yy USING (vec_id)
           |   CROSS JOIN range(1, ${dim + 1}) t(k) GROUP BY k),
           | c${c}sy$n AS MATERIALIZED (SELECT sum(y) AS sy FROM c${c}y$n),
           | c${c}u${n}d0 AS MATERIALIZED (SELECT c${c}s$n.k,
           |   c${c}s$n.s - mu.m * (SELECT sy FROM c${c}sy$n) AS u
           |   FROM c${c}s$n JOIN mu USING (k))""".stripMargin
      val defl = (1 until c).map { p =>
        s""" c${c}r${n}_$p AS MATERIALIZED (SELECT
           |   (SELECT sum(u2.u * vv.vl[u2.k])
           |     FROM c${c}u${n}d${p - 1} u2 CROSS JOIN c${p}v${iters}l vv) /
           |   (SELECT list_dot_product(vl, vl) FROM c${p}v${iters}l) AS r),
           | c${c}u${n}d$p AS MATERIALIZED (SELECT u.k, u.u - c${c}r${n}_$p.r * vv.vl[u.k] AS u
           |   FROM c${c}u${n}d${p - 1} u CROSS JOIN c${p}v${iters}l vv
           |   CROSS JOIN c${c}r${n}_$p)""".stripMargin
      }.mkString(",")
      val last = s"c${c}u${n}d${c - 1}"
      val tail =
        s""" c${c}mx$n AS MATERIALIZED (SELECT max(abs(u)) AS mx FROM $last),
           | c${c}v${n}l AS MATERIALIZED (SELECT list(
           |   CASE WHEN (SELECT mx FROM c${c}mx$n) = 0 THEN 0.0
           |     ELSE round(u / (SELECT mx FROM c${c}mx$n), 6) END
           |   ORDER BY k) AS vl FROM $last)""".stripMargin
      (Seq(core) ++ (if (c > 1) Seq(defl) else Nil) ++ Seq(tail)).mkString(",")
    }.mkString(", ")
    val comps = (1 to nComp).map { c =>
      s"""c${c}v0l AS MATERIALIZED (SELECT list(0.125::DOUBLE) AS vl FROM range($dim)),
         | ${compSteps(c)}""".stripMargin
    }.mkString(", ")
    val projs = (1 to nComp).map { c =>
      s"""round(list_dot_product(x, (SELECT vl FROM c${c}v${iters}l)) -
         |     list_dot_product((SELECT ml FROM mul),
         |       (SELECT vl FROM c${c}v${iters}l)), 6) AS proj$c""".stripMargin
    }.mkString(",\n   ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
       | mu AS MATERIALIZED (SELECT k, round(avg(x[k]), 6) AS m
       |   FROM e CROSS JOIN range(1, ${dim + 1}) t(k) GROUP BY k),
       | mul AS MATERIALIZED (SELECT list(m ORDER BY k) AS ml FROM mu),
       | $comps
       | SELECT e.vec_id,
       |   $projs
       | FROM e""".stripMargin
  }

  private def logisticSql(buckets: Int, rounds: Int, stepDiv: Long,
                          tail: String = ""): String = {
    val steps = (1 to rounds).map { n =>
      s"""z$n AS (SELECT fb.doc_id, sum(fb.cnt * w${n - 1}.w) AS z
         |   FROM fb JOIN w${n - 1} ON fb.b = w${n - 1}.b GROUP BY 1),
         | p$n AS (SELECT doc_id, CAST(round(1000000.0 / (1.0 +
         |     exp(-(least(greatest(z, -20000000), 20000000)) / 1000000.0)), 0)
         |   AS BIGINT) AS p FROM z$n),
         | g$n AS (SELECT fb.b, sum(fb.cnt * (yv.y * 1000000 - p$n.p)) AS g
         |   FROM fb JOIN yv USING (doc_id) JOIN p$n USING (doc_id) GROUP BY 1),
         | w$n AS (SELECT w${n - 1}.b, w${n - 1}.w +
         |     (CASE WHEN coalesce(g$n.g, 0) >= 0
         |        THEN coalesce(g$n.g, 0) // (nn.n * $stepDiv)
         |        ELSE -((-coalesce(g$n.g, 0)) // (nn.n * $stepDiv)) END) AS w
         |   FROM w${n - 1} LEFT JOIN g$n ON w${n - 1}.b = g$n.b CROSS JOIN nn)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       | tokx AS (SELECT doc_id, unnest(toks) AS s FROM d),
       | fb AS (SELECT doc_id, $hash32Sql % $buckets AS b, count(*) AS cnt
       |     FROM tokx GROUP BY 1, 2
       |   UNION ALL SELECT doc_id, $buckets, 1 FROM documents),
       | yv AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |   FROM documents),
       | nn AS (SELECT count(*) AS n FROM documents),
       | w0 AS (SELECT CAST(range AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
       |   FROM range(${buckets + 1})),
       | $steps,
       | zf AS (SELECT fb.doc_id, sum(fb.cnt * w$rounds.w) AS z
       |   FROM fb JOIN w$rounds ON fb.b = w$rounds.b GROUP BY 1),
       | pf AS (SELECT doc_id, CAST(round(1000000.0 / (1.0 +
       |     exp(-(least(greatest(z, -20000000), 20000000)) / 1000000.0)), 0)
       |   AS BIGINT) AS p FROM zf)
       | ${if (tail.nonEmpty) tail else
          """SELECT d2.doc_id, d2.lang, CAST(yv.y AS BIGINT) AS y,
            |   pf.p AS score_micro, (pf.p >= 500000) AS pred
            | FROM documents d2 JOIN yv USING (doc_id) JOIN pf USING (doc_id)"""
            .stripMargin}""".stripMargin
  }

  /** Unrolled k-truss peel rounds (= KTruss.kTruss with its fixpoint
    * asserted within `rounds`: peeling is idempotent past the
    * fixpoint). Each round enumerates triangles on the survivors
    * (u < v < w via the three canonical edges), credits each to its
    * 3 edges, and keeps edges with support ≥ k−2; a final support
    * pass emits the truss edges with their supports. */
  private def ktrussSql(k: Int, rounds: Int): String = {
    def tri(n: Int, src: String) =
      s"""tr$n AS (SELECT x.a AS u, x.b AS v, y.b AS w
         |   FROM $src x JOIN $src y ON y.a = x.a AND x.b < y.b
         |   JOIN $src z ON z.a = x.b AND z.b = y.b),
         | s$n AS (SELECT a, b, CAST(count(*) AS BIGINT) AS s FROM (
         |   SELECT u AS a, v AS b FROM tr$n
         |   UNION ALL SELECT u, w FROM tr$n
         |   UNION ALL SELECT v, w FROM tr$n) GROUP BY 1, 2)""".stripMargin
    val steps = (1 to rounds).map { n =>
      tri(n, s"e${n - 1}") +
        s""", e$n AS MATERIALIZED (SELECT s$n.a, s$n.b FROM s$n
           |   JOIN e${n - 1} e ON e.a = s$n.a AND e.b = s$n.b
           |   WHERE s$n.s >= ${k - 2})""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |   FROM lineitem a JOIN lineitem b
       |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |   WHERE a.l_orderkey % 4 = 0),
       | $steps,
       | ${tri(rounds + 1, s"e$rounds")}
       | SELECT s.a, s.b, s.s AS support
       | FROM s${rounds + 1} s JOIN e$rounds e ON e.a = s.a AND e.b = s.b
       | WHERE s.s >= ${k - 2}""".stripMargin
  }

  /** Unrolled k-core peel rounds (= KCore.kCore: the peel is
    * idempotent past its fixpoint, so a fixed unroll ≥ the engine's
    * asserted convergence bound replays it exactly). */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { n =>
      s"""d$n AS (SELECT v, count(*) AS deg FROM (
         |   SELECT a AS v FROM e${n - 1} UNION ALL SELECT b AS v FROM e${n - 1}) GROUP BY 1),
         | a$n AS (SELECT v FROM d$n WHERE deg >= $k),
         | e$n AS MATERIALIZED (SELECT e.a, e.b FROM e${n - 1} e
         |   JOIN a$n x ON e.a = x.v JOIN a$n y ON e.b = y.v)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |   FROM lineitem a JOIN lineitem b
       |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       | $steps
       | SELECT v AS node, CAST(count(*) AS BIGINT) AS deg FROM (
       |  SELECT a AS v FROM e$rounds UNION ALL SELECT b AS v FROM e$rounds)
       | GROUP BY 1""".stripMargin
  }

  /** Personalized-PageRank rounds: reversed FK graph, teleport mass on
    * the seed only (= PageRank.personalized, bit-exact). */
  private def pprSql(iters: Int, scale: Long = 1000000000L): String = {
    val base = 15L * scale / 100
    val rounds = (1 to iters).map { n =>
      s"""p$n AS (SELECT nd.node, CAST((CASE WHEN nd.node = 'r:1' THEN $base ELSE 0 END)
         |   + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS pr
         | FROM nodes nd LEFT JOIN (
         |  SELECT e.dst AS node, sum(p.pr // d.deg) AS inflow
         |  FROM e JOIN p${n - 1} p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst) i ON nd.node = i.node)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (SELECT 'c:'||o_custkey AS src, 'o:'||o_orderkey AS dst FROM orders
       | UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey FROM customer
       | UNION ALL SELECT 'r:'||n_regionkey, 'n:'||n_nationkey FROM nation),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       | p0 AS (SELECT node, CAST(CASE WHEN node = 'r:1' THEN $scale ELSE 0 END AS BIGINT) AS pr
       |   FROM nodes),
       | $rounds
       | SELECT node, pr FROM p$iters""".stripMargin
  }

  /** Truncated-Katz rounds over the FK graph: t_h = inflow // alphaDen
    * per hop, katz = Σ t_h — the SQL twin of PageRank.katz's
    * scaled-integer walk. */
  private def katzSql(hops: Int, alphaDen: Long = 8L,
                      scale: Long = 1000000000L): String = {
    val rounds = (1 to hops).map { h =>
      s"""t$h AS (SELECT nd.node, coalesce(i.s, 0) // $alphaDen AS t
         | FROM nodes nd LEFT JOIN (
         |  SELECT e.dst AS node, sum(t.t) AS s
         |  FROM e JOIN t${h - 1} t ON e.src = t.node
         |  GROUP BY e.dst) i ON nd.node = i.node)""".stripMargin
    }.mkString(", ")
    val total = (1 to hops).map(h => s"t$h.t").mkString(" + ")
    val joins = (2 to hops).map(h => s"JOIN t$h ON t1.node = t$h.node")
      .mkString(" ")
    s"""WITH e AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | t0 AS (SELECT node, CAST($scale AS BIGINT) AS t FROM nodes),
       | $rounds
       | SELECT t1.node, CAST($total AS BIGINT) AS katz FROM t1 $joins""".stripMargin
  }

  /** Unrolled synchronous Bellman-Ford rounds over the weighted FK
    * graph (r→n→c→o→p, lineitem fan-in) — the SQL twin of
    * Sssp.weighted. The running min is an explicit CASE (NULL-safe in
    * both engines' semantics). */
  private def ssspSql(hops: Int): String = {
    val rounds = (1 to hops).map { h =>
      s"""d$h AS (SELECT nd.node,
         |  CASE WHEN nd.dist IS NULL THEN i.cand
         |       WHEN i.cand IS NULL THEN nd.dist
         |       WHEN i.cand < nd.dist THEN i.cand ELSE nd.dist END AS dist
         | FROM d${h - 1} nd LEFT JOIN (
         |  SELECT e.dst AS node, min(d.dist + e.w) AS cand
         |  FROM e JOIN d${h - 1} d ON e.src = d.node
         |  WHERE d.dist IS NOT NULL GROUP BY e.dst) i ON nd.node = i.node)"""
        .stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst,
       |         n_nationkey % 5 + 1 AS w FROM nation
       |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey,
       |         c_custkey % 50 + 1 FROM customer
       |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey,
       |         o_orderkey % 100 + 1 FROM orders
       |  UNION ALL SELECT 'o:'||l_orderkey, 'p:'||l_partkey,
       |         CAST(l_quantity AS BIGINT) FROM lineitem),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | d0 AS (SELECT node,
       |   CASE WHEN node = 'r:1' THEN CAST(0 AS BIGINT) END AS dist
       |   FROM nodes),
       | $rounds
       | SELECT node, dist FROM d$hops""".stripMargin
  }

  /** Unrolled truncated-HITS half-step pairs — the SQL twin of
    * Hits.truncated (integer damping div `den` replacing L2
    * normalization), over katz's o∪c∪n edge CTE. */
  private def hitsSql(rounds: Int, den: Long = 4L,
                      scale: Long = 1000000L): String = {
    val steps = (1 to rounds).map { r =>
      s"""h$r AS (SELECT nd.node, coalesce(i.s, 0) // $den AS h
         | FROM nodes nd LEFT JOIN (
         |  SELECT e.src AS node, sum(a.a) AS s
         |  FROM e JOIN a${r - 1} a ON e.dst = a.node
         |  GROUP BY e.src) i ON nd.node = i.node),
         | a$r AS (SELECT nd.node, coalesce(i.s, 0) // $den AS a
         | FROM nodes nd LEFT JOIN (
         |  SELECT e.dst AS node, sum(h.h) AS s
         |  FROM e JOIN h$r h ON e.src = h.node
         |  GROUP BY e.dst) i ON nd.node = i.node)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (SELECT 'o:'||o_orderkey AS src, 'c:'||o_custkey AS dst FROM orders
       | UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
       | UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | a0 AS (SELECT node, CAST($scale AS BIGINT) AS a FROM nodes),
       | $steps
       | SELECT h$rounds.node, CAST(h$rounds.h AS BIGINT) AS hub,
       |  CAST(a$rounds.a AS BIGINT) AS auth
       | FROM h$rounds JOIN a$rounds ON h$rounds.node = a$rounds.node""".stripMargin
  }

  /** Unrolled synchronous max-plus rounds over the weighted FK DAG —
    * the SQL twin of Sssp.dagLongest (every node a 0-source;
    * improvement spelled as CASE). Idempotent past the fixpoint, so
    * unrolling past the DAG depth matches the engine's early exit. */
  private def dagLongestSql(hops: Int): String = {
    val rounds = (1 to hops).map { h =>
      s"""d$h AS (SELECT nd.node,
         |  CASE WHEN i.cand IS NOT NULL AND i.cand > nd.dist
         |       THEN i.cand ELSE nd.dist END AS dist
         | FROM d${h - 1} nd LEFT JOIN (
         |  SELECT e.dst AS node, max(d.dist + e.w) AS cand
         |  FROM e JOIN d${h - 1} d ON e.src = d.node
         |  GROUP BY e.dst) i ON nd.node = i.node)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT 'r:'||n_regionkey AS src, 'n:'||n_nationkey AS dst,
       |         n_nationkey % 5 + 1 AS w FROM nation
       |  UNION ALL SELECT 'n:'||c_nationkey, 'c:'||c_custkey,
       |         c_custkey % 50 + 1 FROM customer
       |  UNION ALL SELECT 'c:'||o_custkey, 'o:'||o_orderkey,
       |         o_orderkey % 100 + 1 FROM orders
       |  UNION ALL SELECT 'o:'||l_orderkey, 'p:'||l_partkey,
       |         CAST(l_quantity AS BIGINT) FROM lineitem),
       | nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       | d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes),
       | $rounds
       | SELECT node, dist FROM d$hops""".stripMargin
  }

  /** Left-assoc Σ(q[i]−c[i])² over DuckDB list elements — the same
    * float op sequence Clustering.sqDist folds. */
  private def kmDistSql(q: String, c: String, dim: Int = 64): String =
    (1 to dim).map(i => s"($q[$i]-$c[$i])*($q[$i]-$c[$i])").mkString(" + ")

  /** Shared sq8 quantization of the embedding column (the SQL twin of
    * the engine's Similarity.sq8). A def, not a val: the oracle maps
    * above initialize before this point in the object body. */
  private def sq8QvSql: String =
    "list_transform(CAST(embedding AS DOUBLE[]), " +
      "x -> greatest(-128, least(127, floor(x * 256))))"

  /** Unrolled PER-SUBSPACE Lloyd chains replaying
    * Clustering.trainPqBooks + pqEncodeWith (m subspaces of dim/m,
    * kSub codewords, 2 rounds): for each subspace s, qs$s = slice,
    * c0s$s = init, a1s$s = round-1 assignment, c1s$s = the trained
    * book, a2s$s = the code; `enc` joins the m codes per vector.
    * Emitted WITHOUT the WITH/q header — shared by [[pqSql]] and
    * [[ivfpqSql]], which prepends the k-means chain too. */
  private def pqChainCtes(m: Int = 8, kSub: Int = 16,
                          dim: Int = 64): String = {
    val sub = dim / m
    val sums = (1 to sub).map(i => s"sum(qv[$i])/count(*)").mkString(", ")
    val chains = (0 until m).map { s =>
      val lo = s * sub
      def d(q: String, c: String) = kmDistSql(q, c, sub)
      s"qs$s AS (SELECT vec_id, list_slice(qv, ${lo + 1}, ${lo + sub}) AS qv FROM q), " +
        s"c0s$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid, " +
        s"qv AS cv FROM (SELECT vec_id, qv FROM qs$s ORDER BY vec_id LIMIT $kSub)), " +
        s"a1s$s AS (SELECT vec_id, qv, cid FROM (SELECT t.vec_id, t.qv, c.cid, " +
        s"${d("t.qv", "c.cv")} AS dist FROM qs$s t CROSS JOIN c0s$s c) z " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1), " +
        s"c1s$s AS (SELECT p.cid, CASE WHEN g.cid IS NULL THEN p.cv ELSE g.cv END AS cv " +
        s"FROM c0s$s p LEFT JOIN (SELECT cid, list_value($sums) AS cv " +
        s"FROM a1s$s GROUP BY cid) g ON p.cid = g.cid), " +
        s"a2s$s AS (SELECT vec_id, cid FROM (SELECT t.vec_id, c.cid, " +
        s"${d("t.qv", "c.cv")} AS dist FROM qs$s t CROSS JOIN c1s$s c) z " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)"
    }.mkString(", ")
    val encJoin = (1 until m).map(s => s"JOIN a2s$s USING (vec_id)").mkString(" ")
    val encCols = (0 until m).map(s => s"a2s$s.cid AS c$s").mkString(", ")
    s"$chains, enc AS (SELECT a2s0.vec_id, $encCols FROM a2s0 $encJoin)"
  }

  private def pqSql(select: String, m: Int = 8, kSub: Int = 16,
                    dim: Int = 64): String =
    s"WITH q AS (SELECT vec_id, $sq8QvSql AS qv FROM embeddings), " +
      s"${pqChainCtes(m, kSub, dim)} $select"

  /** ADC select over the [[pqSql]] CTEs: query slices vs the cand's
    * codeword per subspace, subspace sums added left-to-right (the
    * same grouping Similarity.pqTopK reduces). */
  private def pqAdcSelect(m: Int = 8, dim: Int = 64, k: Int = 5): String = {
    val sub = dim / m
    val qaCols = (0 until m).map { s =>
      s"list_slice(qv, ${s * sub + 1}, ${s * sub + sub}) AS qa$s"
    }.mkString(", ")
    val dists = (0 until m)
      .map(s => s"(${kmDistSql(s"qq.qa$s", s"b$s.cv", sub)})").mkString(" + ")
    val bookJoins = (0 until m)
      .map(s => s"JOIN c1s$s b$s ON b$s.cid = e.c$s").mkString(" ")
    s", qq AS (SELECT vec_id AS q, $qaCols FROM q WHERE vec_id < 10), " +
      s"sims AS (SELECT qq.q, e.vec_id AS cand, $dists AS adist " +
      s"FROM qq CROSS JOIN enc e $bookJoins WHERE qq.q != e.vec_id) " +
      "SELECT q, cand, CAST(row_number() OVER (PARTITION BY q ORDER BY adist, cand) " +
      s"AS BIGINT) AS rank, round(adist, 6) AS adist FROM sims QUALIFY rank <= $k"
  }

  /** The coarse k-means chain CTEs alone (c0, a1..c{iters−1}, a{iters})
    * — no WITH/q header, shared by [[kmeansSql]] and [[ivfpqSql]]. */
  private def kmeansCtes(k: Int = 8, iters: Int = 3,
                         dim: Int = 64): String = {
    def dist(q: String, c: String) = kmDistSql(q, c, dim)
    val sums = (1 to dim).map(i => s"sum(qv[$i])/count(*)").mkString(", ")
    val iterCtes = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      val aN = s"a$n AS (SELECT vec_id, qv, cid, dist FROM (" +
        s"SELECT q.vec_id, q.qv, c.cid, ${dist("q.qv", "c.cv")} AS dist " +
        s"FROM q CROSS JOIN $prev c) t " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)"
      val cN = if (n == iters) "" else
        s", c$n AS (SELECT p.cid, CASE WHEN g.cid IS NULL THEN p.cv ELSE g.cv END AS cv " +
          s"FROM $prev p LEFT JOIN (SELECT cid, list_value($sums) AS cv " +
          s"FROM a$n GROUP BY cid) g ON p.cid = g.cid)"
      aN + cN
    }.mkString(", ")
    "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid, " +
      s"qv AS cv FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT $k)), " +
      s"$iterCtes"
  }

  private def kmeansSql(select: String, k: Int = 8, iters: Int = 3,
                        dim: Int = 64, preCtes: String = "",
                        src: String = "embeddings"): String =
    s"WITH ${preCtes}q AS (SELECT vec_id, $sq8QvSql AS qv FROM $src), " +
      s"${kmeansCtes(k, iters, dim)} $select"

  /** IVF-ADC oracle replaying Similarity.ivfPqTopK: the coarse k-means
    * chain provides probe centroids (c{iters−1}) and cell assignments
    * (a{iters}); the PQ chains provide codes (enc) and trained books
    * (c1s*); ADC ranks candidates inside the probed cells with the
    * same per-subspace left folds added left-to-right. */
  private def ivfpqSql(k: Int = 5, nprobe: Int = 2, cells: Int = 8,
                       ivfIters: Int = 3, m: Int = 8, kSub: Int = 16,
                       dim: Int = 64, preCtes: String = "",
                       src: String = "embeddings"): String = {
    val sub = dim / m
    val qaCols = (0 until m).map { s =>
      s"list_slice(qa, ${s * sub + 1}, ${s * sub + sub}) AS qa$s"
    }.mkString(", ")
    val dists = (0 until m)
      .map(s => s"(${kmDistSql(s"p.qa$s", s"b$s.cv", sub)})").mkString(" + ")
    val bookJoins = (0 until m)
      .map(s => s"JOIN c1s$s b$s ON b$s.cid = e.c$s").mkString(" ")
    s"WITH ${preCtes}q AS (SELECT vec_id, $sq8QvSql AS qv FROM $src), " +
      s"${kmeansCtes(cells, ivfIters, dim)}, ${pqChainCtes(m, kSub, dim)}, " +
      s"p AS (SELECT vec_id AS q_id, $qaCols, cid AS cell FROM (" +
      s"SELECT q.vec_id, q.qv AS qa, c.cid, " +
      s"${kmDistSql("q.qv", "c.cv", dim)} AS cdist " +
      s"FROM q CROSS JOIN c${ivfIters - 1} c WHERE q.vec_id < 10) t " +
      "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cdist, cid) " +
      s"<= $nprobe), " +
      s"sims AS (SELECT p.q_id, a.vec_id AS cand, $dists AS adist " +
      s"FROM p JOIN a$ivfIters a ON p.cell = a.cid AND p.q_id != a.vec_id " +
      s"JOIN enc e ON e.vec_id = a.vec_id $bookJoins) " +
      "SELECT q_id AS q, cand, CAST(row_number() OVER (PARTITION BY q_id " +
      s"ORDER BY adist, cand) AS BIGINT) AS rank, round(adist, 6) AS adist " +
      s"FROM sims QUALIFY rank <= $k"
  }

  /** Oracles, plus entries DERIVED from other entries (the recall
    * evaluation wraps the brute and IVF top-k SQLs as subqueries —
    * one definition, no drift between an arm and its eval). */
  val oracleSql: Map[String, String] = baseOracleSql + (
    "dedup_recall_lsh" ->
      s"""WITH brute AS (SELECT da, db FROM (${baseOracleSql("dedup_embedding_nn")}) tb),
        | lsh AS (SELECT da, db FROM (${baseOracleSql("dedup_embedding_lsh")}) tl)
        | SELECT (SELECT CAST(count(*) AS BIGINT) FROM brute) AS n_brute,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
        |  (SELECT CAST(count(*) AS BIGINT) FROM brute b
        |    JOIN lsh l ON b.da = l.da AND b.db = l.db) AS n_hit,
        |  round((SELECT count(*) FROM brute b
        |    JOIN lsh l ON b.da = l.da AND b.db = l.db) * 1.0 /
        |   (SELECT count(*) FROM brute), 6) AS recall""".stripMargin,
    "sim_recall_ivf" -> recallSql("sim_topk_ivf"),
    // the streaming twin must equal the batch point-in-time lookup
    "stream_scd2_lookup" -> baseOracleSql("rel_scd2_lookup"),
    // kept prefix content-proved via the same md5 over the re-joined
    // token slice
    "llm_truncate_cap" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
        | CAST(least(len($toksSql), 256) AS BIGINT) AS n_kept,
        | len($toksSql) > 256 AS truncated,
        | md5(array_to_string(list_slice($toksSql, 1, 256), ' '))
        |   AS kept_hash
        | FROM documents""".stripMargin,
    // CCNet terciles over the bigram-ppl oracle as a subquery: same
    // rounded ppl, same (ppl, doc_id) NTILE order
    "llm_ccnet_buckets" ->
      s"""WITH p AS (SELECT doc_id, ppl
        |   FROM (${baseOracleSql("text_bigram_ppl")}) tp),
        | j AS (SELECT d.doc_id, d.lang, p.ppl,
        |   CAST(ntile(3) OVER (PARTITION BY d.lang ORDER BY p.ppl, d.doc_id)
        |     AS BIGINT) AS tercile
        |  FROM documents d JOIN p ON p.doc_id = d.doc_id)
        | SELECT doc_id, lang, ppl, tercile,
        |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        | FROM j""".stripMargin,
    // triangle counts come from the full triangles oracle as a
    // subquery; degrees re-derive from the same e0 definition
    "graph_lcc" ->
      s"""WITH t AS (SELECT * FROM (${baseOracleSql("graph_triangles")}) tt),
        | e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |   FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | deg AS (SELECT v, count(*) AS deg FROM (
        |   SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) GROUP BY 1)
        | SELECT t.node, t.tri, CAST(deg.deg AS BIGINT) AS deg,
        |  CAST(round(t.tri * 2000000.0 / (deg.deg * (deg.deg - 1)), 0)
        |    AS BIGINT) AS lcc_micro
        | FROM t JOIN deg ON deg.v = t.node""".stripMargin,
    "sim_recall_ivfpq" -> recallSql("sim_topk_ivfpq"),
    // recall on the CLUSTERED fixture: same shells, both arms sourced
    // from the clu CTE (the fixture generator's SQL twin)
    "sim_recall_ivft_clustered" -> recallShell(bruteCluSql,
      kmeansSql(ivfTrainedSelect, preCtes = cluCte, src = "clu")),
    "sim_recall_ivfpq_clustered" -> recallShell(bruteCluSql,
      ivfpqSql(preCtes = cluCte, src = "clu")))

  /** The recall@5 oracle shell around a brute and an ANN arm SQL — the
    * SQL twin of [[recallAt5]]. Defs, not vals: the maps above
    * initialize first (see the init-order note at [[sq8QvSql]]). */
  private def recallShell(bruteArm: String, annArm: String): String =
    s"""WITH brute AS (SELECT * FROM ($bruteArm) tb),
      | ann AS (SELECT * FROM ($annArm) ta),
      | hits AS (SELECT b.q, CAST(count(*) AS BIGINT) AS hits
      |   FROM brute b JOIN ann a ON b.q = a.q AND b.cand = a.cand GROUP BY 1)
      | SELECT q, CAST(coalesce(hits, 0) AS BIGINT) AS hits,
      |  round(coalesce(hits, 0) / 5.0, 6) AS recall
      | FROM (SELECT DISTINCT q FROM brute) qs LEFT JOIN hits USING (q)""".stripMargin

  private def recallSql(annKey: String): String =
    recallShell(baseOracleSql("sim_topk_brute"), baseOracleSql(annKey))

  /** Trained-IVF probe+rerank select over the k-means CTE chain
    * (c2 = trained centroids, a3 = cell assignment at iters = 3) —
    * shared by sim_topk_ivf_trained and its clustered-fixture twin. */
  private def ivfTrainedSelect: String =
    s""", p AS (SELECT vec_id AS q_id, qv AS qa, cid AS cell FROM (
      |  SELECT q.vec_id, q.qv, c.cid, ${kmDistSql("q.qv", "c.cv")} AS cdist
      |  FROM q CROSS JOIN c2 c WHERE q.vec_id < 10) t
      | QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cdist, cid) <= 2),
      | sims AS (SELECT p.q_id, a.vec_id AS cand,
      |  CASE WHEN list_dot_product(p.qa, p.qa) = 0
      |         OR list_dot_product(a.qv, a.qv) = 0 THEN 0.0
      |   ELSE list_dot_product(p.qa, a.qv) /
      |    (sqrt(list_dot_product(p.qa, p.qa)) * sqrt(list_dot_product(a.qv, a.qv)))
      |  END AS sim
      | FROM p JOIN a3 a ON p.cell = a.cid AND p.q_id != a.vec_id)
      | SELECT q_id AS q, cand, CAST(row_number() OVER (PARTITION BY q_id
      |   ORDER BY sim DESC, cand) AS BIGINT) AS rank, round(sim, 6) AS sim
      | FROM sims QUALIFY rank <= 5""".stripMargin

  /** The clustered fixture as a CTE — the SQL twin of
    * Similarity.clusteredFixture. Every term is a dyadic rational
    * (/16, /32, /16384) so both engines hold bit-identical doubles; the
    * noise hash replays the engine's md5-based hash32. */
  private def cluCte: String = {
    val h = hash32On("CAST(vi AS VARCHAR) || '_' || CAST(j AS VARCHAR)")
    s"""clu AS (SELECT vi AS vec_id, list_transform(range(0, 64), j ->
      |   CAST(((vi % 16) * 31 + j * 7) % 13 - 6 AS DOUBLE) / 16.0::DOUBLE +
      |   CAST(((vi % 16) * 17 + j * 3) % 11 - 5 AS DOUBLE) / 32.0::DOUBLE +
      |   CAST(($h) % 2001 - 1000 AS DOUBLE) / 16384.0::DOUBLE) AS embedding
      |  FROM range(0, 96) t(vi)), """.stripMargin
  }

  /** Brute cosine top-5 over the clustered fixture (same select as
    * sim_topk_brute, sourced from the clu CTE). */
  private def bruteCluSql: String =
    s"""WITH $cluCte e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM clu)
      | SELECT q, cand, rank, round(sim, 6) AS sim FROM (
      |  SELECT a.vec_id AS q, b.vec_id AS cand,
      |   list_dot_product(a.emb, b.emb) /
      |     (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) AS sim,
      |   row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |     list_dot_product(a.emb, b.emb) /
      |       (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) DESC,
      |     b.vec_id) AS rank
      |  FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id != b.vec_id)
      | WHERE rank <= 5""".stripMargin
}
