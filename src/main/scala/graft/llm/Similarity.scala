package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (SURVEY §2.12):
  *  - brute-force cosine top-k: exact baseline. The query side is small
  *    (a filter), so Catalyst broadcasts it; the corpus streams — no
  *    shuffle of the big side.
  *  - IVF with deterministic medoid centroids: coarse-quantize the
  *    corpus into cells (one shuffle on cell id), probe the closest
  *    `nprobe` cells per query, exact-rerank inside. This is the
  *    100 TB path: candidate set ∝ corpus/cells × nprobe.
  * Centroids are label-medoids (min vec_id per label) rather than
  * k-means means so every step is exactly reproducible in the oracle
  * (no floating-point averaging order).
  */
object Similarity {

  private def cos(a: Column, b: Column): Column =
    cosine(a.cast("array<double>"), b.cast("array<double>"))

  /** Exact top-k neighbors for each query vector (queries = filter). */
  def bruteTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val q = emb.where(isQuery).select(col("vec_id").as("q"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cand"), col("embedding").as("ce"))
    val sims = broadcast(q).join(c, col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Maximal Marginal Relevance diverse re-rank (Carbonell/Goldstein
    * 1998): greedily pick `k` of the top-`pool` candidates per query,
    * each step maximizing `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)`.
    * The retrieval-diversity pass every dedup-aware RAG / eval-set
    * builder runs after ANN.
    *
    * Determinism: cosines are rounded once to integer MICRO units and
    * λ=7/10 is applied as integer arithmetic (`score₁₀ = 7·sim_u −
    * 3·maxp_u`, i.e. 10× the λ-score) — every argmax is an exact
    * integer comparison, bit-identical in the DuckDB oracle.
    *
    * Scale shape: queries broadcast over the corpus scan for the pool
    * (one pass, TakeOrdered-per-query via window on bounded groups);
    * everything after operates on pool-sized groups — pairwise sims
    * are pool² per query (a constant), and the k greedy steps are
    * joins over those tiny frames, checkpointed per step to keep the
    * plan linear. The corpus is touched exactly once. */
  def mmrTopK(emb: DataFrame, isQuery: Column, k: Int, pool: Int): DataFrame = {
    def micro(c: Column): Column = round(c * lit(1000000.0), 0).cast("long")
    val q = emb.where(isQuery).select(col("vec_id").as("q"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cand"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim_u").desc, col("cand"))
    val cands = graft.util.Scratch.trackCheckpoint(
      broadcast(q).join(c, col("q") =!= col("cand"))
        .withColumn("sim_u", micro(cos(col("qe"), col("ce"))))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= pool)
        .select(col("q"), col("cand"), col("sim_u"), col("ce"))
        .localCheckpoint(true))
    val pairs = graft.util.Scratch.trackCheckpoint(
      cands.select(col("q"), col("cand").as("ca"), col("ce").as("ea"))
        .join(cands.select(col("q"), col("cand").as("cb"), col("ce").as("eb")), "q")
        .where(col("ca") =!= col("cb"))
        .select(col("q"), col("ca"), col("cb"), micro(cos(col("ea"), col("eb"))).as("psim_u"))
        .localCheckpoint(true))
    val pool0 = cands.select(col("q"), col("cand"), col("sim_u"))
    // step 1: S empty → score is just 7·sim
    val w1 = Window.partitionBy(col("q")).orderBy(col("sim_u").desc, col("cand"))
    var sel = pool0.withColumn("rn", row_number().over(w1)).where(col("rn") === 1)
      .select(col("q"), col("cand"), lit(1L).as("step"),
        (lit(7L) * col("sim_u")).as("mmr_u"))
    for (i <- 2 to k) {
      // rest is REBUILT from the checkpointed pool each round (pool
      // minus everything selected so far, one anti-join against the
      // checkpointed sel) — the previous rest-chains-rest form stacked
      // one anti-join of lineage per round, so round i re-analyzed and
      // re-ran i anti-joins.
      val rest = pool0.join(sel.select(col("q"), col("cand")),
        Seq("q", "cand"), "left_anti")
      val mp = pairs.join(sel.select(col("q"), col("cand").as("cb")),
          Seq("q", "cb"))
        .groupBy(col("q"), col("ca").as("cand")).agg(max(col("psim_u")).as("mp"))
      val ws = Window.partitionBy(col("q")).orderBy(col("score").desc, col("cand"))
      val pick = rest.join(mp, Seq("q", "cand"))
        .withColumn("score", lit(7L) * col("sim_u") - lit(3L) * col("mp"))
        .withColumn("rn", row_number().over(ws)).where(col("rn") === 1)
        .select(col("q"), col("cand"), lit(i.toLong).as("step"), col("score").as("mmr_u"))
      sel = graft.util.Scratch.trackCheckpoint(sel.union(pick).localCheckpoint(true))
    }
    sel
  }

  /** Deterministic coarse centroids: the min-vec_id member per label. */
  def medoidCentroids(emb: DataFrame): DataFrame =
    emb.groupBy(col("label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("cemb"))
      .select(col("label").as("cell"), col("cemb"))

  /** Cell assignment: nearest centroid by cosine (broadcast 10 rows). */
  def ivfAssign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(cents))
      .withColumn("csim", cos(col("embedding"), col("cemb")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Sign-random-projection LSH buckets: bit j of the bucket id is the
    * sign of the dot product with pseudo-random hyperplane j. Planes
    * derive deterministically from md5 (no RNG state — reproducible
    * across runs and engines). */
  def srpBucket(emb: Column, dim: Int, nbits: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until nbits).map { j =>
      (0 until dim).map { k =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"plane_$j:$k".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString, 16)
        h.toDouble / Int.MaxValue.toDouble - 1.0 // ~uniform [-1, 1)
      }
    }
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val arr = array(p.map(lit): _*)
      val dot = graft.functions.ArrayDot.dot(emb.cast("array<double>"), arr)
      when(dot >= 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding dimensionality, read from the first row (one tiny driver
    * action; pass `dim` explicitly in hot paths to avoid it). */
  def embDim(emb: DataFrame): Int =
    emb.select(size(col("embedding"))).head().getInt(0)

  /** LSH-bucketed approximate top-k: candidates share an SRP bucket
    * (equi-join on bucket id — candidate count ∝ corpus / 2^nbits per
    * query), exact cosine rerank inside. The 100 TB alternative to IVF
    * when no label/cluster structure exists. */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int, nbits: Int = 6,
              dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else embDim(emb)
    val bucketed = emb.withColumn("__b", srpBucket(col("embedding"), d, nbits))
    // multi-probe: each query also probes the hamming-1 buckets, the
    // standard recall/candidate-count dial for SRP-LSH
    val probes = array((lit(0L) +: (0 until nbits).map(j => lit(1L << j))): _*)
    // a candidate lives in exactly one bucket and probes are distinct,
    // so each (q, cand) pair matches at most once — no dedup needed
    val q = bucketed.where(isQuery)
      .select(col("vec_id").as("q"), col("embedding").as("qe"),
        explode(transform(probes, m => col("__b").bitwiseXOR(m))).as("__b"))
    val c = bucketed.select(col("vec_id").as("cand"), col("embedding").as("ce"), col("__b"))
    val cand = broadcast(q).join(c, Seq("__b")).where(col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    cand.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** LSH-bucketed cosine RANGE search — [[lshTopK]]'s sibling for the
    * "everything at least this similar" question (dedup sweeps,
    * recall-bounded retrieval, near-dup audits): every corpus vector
    * with cosine ≥ `threshold` of each query. Same SRP bucket +
    * hamming-1 multi-probe candidate join, then a pure FILTER — no
    * per-query window/sort anywhere, so the whole 100 TB cost is the
    * candidate equi-join (∝ corpus/2^nbits per query). */
  def lshRange(emb: DataFrame, isQuery: Column, threshold: Double,
               nbits: Int = 6, dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else embDim(emb)
    val bucketed = emb.withColumn("__b", srpBucket(col("embedding"), d, nbits))
    val probes = array((lit(0L) +: (0 until nbits).map(j => lit(1L << j))): _*)
    val q = bucketed.where(isQuery)
      .select(col("vec_id").as("q"), col("embedding").as("qe"),
        explode(transform(probes, m => col("__b").bitwiseXOR(m))).as("__b"))
    val c = bucketed.select(col("vec_id").as("cand"),
      col("embedding").as("ce"), col("__b"))
    broadcast(q).join(c, Seq("__b")).where(col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
      .where(col("sim") >= threshold)
      .select(col("q"), col("cand"), round(col("sim"), 6).as("sim"))
  }

  /** Symmetric int8 scalar quantization: x → clamp(floor(x·256), −128,
    * 127). `floor` (not `round`) so the oracle replays bit-exactly; the
    * codes stay doubles holding exact integers, so every downstream dot
    * product is exact integer arithmetic (≤ 128²·dim ≪ 2⁵³) with an
    * order-independent sum — deterministic across engines AND across
    * partition orders, which float32 accumulation is not. */
  def sq8(emb: Column): Column =
    transform(emb.cast("array<double>"),
      x => greatest(lit(-128.0), least(lit(127.0), floor(x * lit(256.0)))))

  /** Top-k over int8-quantized vectors — the memory-scale path for a
    * 100 TB embedding store: 4× smaller than float32 (int8 storage; the
    * in-plan doubles are a local-engine representation of the codes),
    * exact-integer dots, recall loss bounded by the quantization step.
    * Same broadcast-query plan as [[bruteTopK]]; composes with the IVF /
    * LSH bucketing above (quantize, then bucket) when the corpus side
    * must also shrink. */
  def sq8TopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val z = emb.withColumn("__q8", sq8(col("embedding")))
    val q = z.where(isQuery).select(col("vec_id").as("q"), col("__q8").as("qa"))
    val c = z.select(col("vec_id").as("cand"), col("__q8").as("cb"))
    val dotAB = graft.functions.ArrayDot.dot(col("qa"), col("cb"))
    val nA = graft.functions.ArrayDot.dot(col("qa"), col("qa"))
    val nB = graft.functions.ArrayDot.dot(col("cb"), col("cb"))
    val sims = broadcast(q).join(c, col("q") =!= col("cand"))
      .withColumn("sim", when(nA === 0.0 || nB === 0.0, lit(0.0))
        .otherwise(dotAB / (sqrt(nA) * sqrt(nB))))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** IVF top-k over a TRAINED codebook — [[ivfTopK]] without its
    * label crutch: cells come from [[Clustering.kmeansSq8]]'s Lloyd
    * rounds instead of pre-existing labels, which is the only form
    * available on an unlabeled 100 TB embedding store. Everything runs
    * on the sq8 integer codes (training, probing, AND the exact-dot
    * rerank — the same arithmetic [[sq8TopK]] uses), so the whole
    * pipeline stays bit-deterministic and oracle-replayable. Plan
    * shape: train (k·dim aggregates per round) → one equi-join on cell
    * id; candidates ∝ corpus/k × nprobe; queries broadcast. */
  def ivfTrainedTopK(emb: DataFrame, isQuery: Column, k: Int, nprobe: Int,
                     cells: Int, iters: Int, dim: Int): DataFrame = {
    val q0 = Clustering.codes(emb)
    val cents = Clustering.trainCentroids(q0, cells, iters, dim)
    val assigned = Clustering.assign(q0, cents)
    // probe: each query ranks all k centroids (k is tiny) and keeps
    // the nprobe nearest, lowest-cid ties first — mirrors assign()
    val qcodes = emb.where(isQuery).select(col("vec_id"))
      .join(assigned, Seq("vec_id"))
      .select(col("vec_id").as("q"), col("qv").as("qa"))
    val qs = qcodes
      .select(col("q"), col("qa"),
        posexplode(Clustering.distArray(col("qa"), cents)))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cdist")
    val wq = Window.partitionBy(col("q")).orderBy(col("cdist"), col("cell"))
    val probes = qs.withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("q"), col("qa"), col("cell").cast("long").as("cell"))
    // a candidate lives in exactly one cell → no pair dedup needed
    val cand = broadcast(probes)
      .join(assigned.select(col("cluster").as("cell"),
        col("vec_id").as("cand"), col("qv").as("cb")), Seq("cell"))
      .where(col("q") =!= col("cand"))
    val dotAB = graft.functions.ArrayDot.dot(col("qa"), col("cb"))
    val nA = graft.functions.ArrayDot.dot(col("qa"), col("qa"))
    val nB = graft.functions.ArrayDot.dot(col("cb"), col("cb"))
    val sims = cand.withColumn("sim", when(nA === 0.0 || nB === 0.0, lit(0.0))
      .otherwise(dotAB / (sqrt(nA) * sqrt(nB))))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** PQ top-k by asymmetric distance (ADC): the query keeps its full
    * sq8 code; each candidate is its m codeword ids, reconstructed
    * per-subspace from the trained books at ranking time. Distance =
    * Σₛ ‖qₛ − codebookₛ[cₛ]‖², with the subspace sums added
    * left-to-right and each inner sum a left fold — the exact float
    * op sequence the oracle's `(d0)+(d1)+…` replays, so the ranking
    * (and its ties) is engine-identical. This is the memory-scale ANN
    * tier below sq8: m bytes/vector; candidates stream against a
    * broadcast query side, no shuffle of the corpus. Accuracy is the
    * PQ trade: ranks come from quantized distances (no exact rerank
    * here by design — compose with a rerank stage when recall must be
    * exact). */
  def pqTopK(emb: DataFrame, isQuery: Column, k: Int, m: Int, kSub: Int,
             iters: Int, dim: Int): DataFrame = {
    val q0 = Clustering.codes(emb)
    val books = Clustering.trainPqBooks(q0, m, kSub, iters, dim)
    val enc = Clustering.pqEncodeWith(q0, books, dim)
    val sub = dim / m
    val qs = emb.where(isQuery).select(col("vec_id"))
      .join(q0, Seq("vec_id"))
      .select(col("vec_id").as("q"), col("qv").as("qa"))
    val candCols = col("vec_id").as("cand") +: (0 until m).map(s => col(s"c$s"))
    val cand = broadcast(qs)
      .join(enc.select(candCols: _*), col("q") =!= col("cand"))
    val adist = (0 until m).map { s =>
      val qSlice = slice(col("qa"), s * sub + 1, sub)
      val cw = element_at(typedLit(books(s).map(_.toSeq).toSeq),
        (col(s"c$s") + 1).cast("int"))
      aggregate(zip_with(qSlice, cw, (x, y) => { val d = x - y; d * d }),
        lit(0.0), (a, x) => a + x)
    }.reduce(_ + _)
    val sims = cand.withColumn("adist", adist)
    val w = Window.partitionBy(col("q")).orderBy(col("adist"), col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("adist"), 6).as("adist"))
  }

  /** Reciprocal-rank-fusion hybrid retrieval (Cormack/Clarke/Büttcher
    * SIGIR'09): fuse a sparse (BM25) ranking and a dense (cosine)
    * ranking by summing 1/(κ+rank) over the lists each id appears in.
    * This is the standard first-stage of a hybrid RAG retriever —
    * rank-space fusion needs no score calibration between the two
    * retrievers.
    *
    * Determinism: contributions are integers — round(10⁹/(κ+rank)) —
    * so the fused ordering is an exact integer comparison (ties →
    * id asc) and replays bit-identically in the DuckDB oracle.
    *
    * Scale shape: both candidate lists are top-`pool` — the sparse arm
    * is TextAnalysis.bm25 (corpus never shuffles, TakeOrdered head);
    * the dense arm broadcasts the single query vector over one corpus
    * scan and takes TakeOrderedAndProject(pool). Everything after the
    * two heads operates on ≤2·pool rows (global windows there are
    * bounded by construction). The fusion join is pool-sized. At
    * 100 TB only the two scans touch the corpus, once each. */
  def rrfHybrid(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                queryId: Long, pool: Int, k: Int, kap: Int = 60): DataFrame = {
    def contrib(r: Column): Column =
      when(r.isNotNull,
        round(lit(1.0e9) / (lit(kap.toDouble) + r.cast("double")), 0).cast("long"))
        .otherwise(lit(0L))
    val wS = Window.orderBy(col("score").desc, col("doc_id"))
    val sparse = TextAnalysis.bm25(docs, terms, n = pool)
      .withColumn("rs", row_number().over(wS).cast("long"))
      .select(col("doc_id").as("id"), col("rs"))
    val q = emb.where(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val densePool = emb.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", cos(col("qe"), col("embedding")))
      .orderBy(col("sim").desc, col("vec_id")).limit(pool)
    val wD = Window.orderBy(col("sim").desc, col("vec_id"))
    val dense = densePool
      .withColumn("rd", row_number().over(wD).cast("long"))
      .select(col("vec_id").as("id"), col("rd"))
    sparse.join(dense, Seq("id"), "full_outer")
      .withColumn("rrf", contrib(col("rs")) + contrib(col("rd")))
      .orderBy(col("rrf").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("rrf").desc, col("id"))).cast("long"))
      .select(col("id"), col("rrf"), col("rank"))
  }

  /** IVF-ADC top-k (the FAISS IVF-PQ serving shape, sans residual
    * encoding): a TRAINED coarse quantizer prunes candidates to the
    * `nprobe` closest cells, then PQ asymmetric distances rank inside
    * the probed cells. This composes the two memory/scale levers the
    * standalone tiers exercise separately — candidates ∝
    * corpus/cells × nprobe (never the corpus), distances from m-byte
    * codes (never the vectors). Training, probing, and ADC all run on
    * the sq8 integer codes with the exact float-op sequences the
    * standalone `sim_topk_ivf_trained` / `sim_topk_pq` oracles replay,
    * so the composite stays bit-deterministic: the oracle is literally
    * the two CTE chains joined. With nprobe = cells the candidate set
    * degenerates to everything and the result EQUALS pqTopK — the
    * spec's invariant. */
  def ivfPqTopK(emb: DataFrame, isQuery: Column, k: Int, nprobe: Int,
                cells: Int, ivfIters: Int, m: Int, kSub: Int,
                pqIters: Int, dim: Int): DataFrame = {
    val q0 = Clustering.codes(emb)
    val cents = Clustering.trainCentroids(q0, cells, ivfIters, dim)
    val assigned = Clustering.assign(q0, cents)
    val books = Clustering.trainPqBooks(q0, m, kSub, pqIters, dim)
    val enc = Clustering.pqEncodeWith(q0, books, dim)
    val sub = dim / m
    val qcodes = emb.where(isQuery).select(col("vec_id"))
      .join(q0, Seq("vec_id"))
      .select(col("vec_id").as("q"), col("qv").as("qa"))
    val qsx = qcodes.select(col("q"), col("qa"),
        posexplode(Clustering.distArray(col("qa"), cents)))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cdist")
    val wq = Window.partitionBy(col("q")).orderBy(col("cdist"), col("cell"))
    val probes = qsx.withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("q"), col("qa"), col("cell").cast("long").as("cell"))
    val candCols = col("cluster").as("cell") +: col("vec_id").as("cand") +:
      (0 until m).map(s => col(s"c$s"))
    val encCells = enc.join(assigned.select(col("vec_id"), col("cluster")),
        Seq("vec_id")).select(candCols: _*)
    val cand = broadcast(probes).join(encCells, Seq("cell"))
      .where(col("q") =!= col("cand"))
    val adist = (0 until m).map { s =>
      val qSlice = slice(col("qa"), s * sub + 1, sub)
      val cw = element_at(typedLit(books(s).map(_.toSeq).toSeq),
        (col(s"c$s") + 1).cast("int"))
      aggregate(zip_with(qSlice, cw, (x, y) => { val d = x - y; d * d }),
        lit(0.0), (a, x) => a + x)
    }.reduce(_ + _)
    val sims = cand.withColumn("adist", adist)
    val w = Window.partitionBy(col("q")).orderBy(col("adist"), col("cand"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"),
        round(col("adist"), 6).as("adist"))
  }

  /** IVF top-k: probe the `nprobe` closest cells, exact-rerank inside. */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int, nprobe: Int): DataFrame = {
    val cents = medoidCentroids(emb)
    val assigned = ivfAssign(emb, cents)
    val q = emb.where(isQuery).select(col("vec_id").as("q"), col("embedding").as("qe"))
    val qc = q.crossJoin(broadcast(cents))
      .withColumn("csim", cos(col("qe"), col("cemb")))
    val wq = Window.partitionBy(col("q")).orderBy(col("csim").desc, col("cell"))
    val probed = qc.withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("q"), col("qe"), col("cell"))
    val cand = probed.join(assigned.select(col("cell"),
        col("vec_id").as("cand"), col("embedding").as("ce")), Seq("cell"))
      .where(col("q") =!= col("cand"))
      .withColumn("sim", cos(col("qe"), col("ce")))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("cand"))
    cand.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("q"), col("cand"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic CLUSTERED embedding fixture (mixture-of-centroids):
    * vector i belongs to cluster i mod `clusters` (default 16 clusters
    * of 6 members, so each query's exact top-5 is its 5 cluster
    * mates — the retrieval a quantized tier must recover at CLUSTER
    * resolution; within-cluster rank order is exactly what PQ codes
    * collapse, so a fixture of few large clusters would measure tie
    * order, not retrieval — and `clusters` matches the PQ tier's
    * kSub = 16 codewords per subspace, since MORE clusters than
    * codewords makes codeword collisions structural and caps recall
    * regardless of implementation quality). Dim j of cluster c's centroid combines two
    * incommensurate residue terms, `(((c·31 + j·7) mod 13) − 6)/16 +
    * (((c·17 + j·3) mod 11) − 5)/32` — one modulus alone yields only
    * 13 distinct centroid patterns; the pair is distinct for all
    * c < 143 — plus hash noise `((h mod 2001) − 1000)/16384` (h =
    * md5-derived, the dedup tier's hash32). Every term is a DYADIC
    * rational — exactly representable in a double — so the DuckDB
    * oracle regenerates bit-identical inputs from the same formula.
    *
    * Why it exists: the shared synthetic `embeddings` table is
    * near-uniform — the WORST case for any vector-quantization tier,
    * so its recall numbers say nothing about clusterable corpora
    * (BASELINE.md's honest note). This fixture gives the trained
    * IVF/PQ tiers a structure they can exploit, and the recall
    * entries over it pin ≥ 0.8 recall@5 (ClusteringSpec floor). */
  def clusteredFixture(spark: org.apache.spark.sql.SparkSession,
                       n: Int = 96, dim: Int = 64,
                       clusters: Int = 16): DataFrame =
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val c = col("id") % clusters
        val mu13 = ((c * 31 + j.cast("long") * 7) % 13 - 6)
          .cast("double") / lit(16.0)
        val mu11 = ((c * 17 + j.cast("long") * 3) % 11 - 5)
          .cast("double") / lit(32.0)
        val h = Dedup.hash32(concat_ws("_", col("id"), j))
        mu13 + mu11 + ((h % 2001) - 1000).cast("double") / lit(16384.0)
      }).as("embedding"))
}
