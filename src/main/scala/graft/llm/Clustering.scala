package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over sq8-quantized embedding codes —
  * the codebook trainer that [[Similarity]]'s IVF tier needs when no
  * label structure exists (medoidCentroids is the labeled shortcut).
  *
  * Reproducibility is the hard part of distributed k-means: float32
  * accumulation order differs run-to-run (and engine-to-engine), so
  * naive means are not replayable. Three choices make every step
  * bit-deterministic and therefore oracle-checkable:
  *  - points are the [[Similarity.sq8]] integer codes: all per-dim
  *    sums are exact integer arithmetic (≤ 128·N ≪ 2⁵³), hence
  *    ORDER-INDEPENDENT across partitions;
  *  - init is the codes of the k lowest vec_ids (no RNG);
  *  - a centroid mean is one double division of an exact sum; empty
  *    clusters keep their previous centroid.
  * Assignment distances are left-associated squared-L2 sums, the same
  * float op sequence the oracle's `list_sum(list_transform(...))`
  * performs, so argmin ties resolve identically in both engines.
  *
  * Scale shape (100 TB): per iteration ONE scan + one k·dim-wide
  * partial aggregate (map-side combine → k rows on the driver —
  * centroids are a catalog-size artifact, like commit refs). Nothing
  * is ever shuffled by point; the iterate-collect loop is inherent to
  * Lloyd's and costs k·dim doubles per round trip. The quantized
  * codes are persisted once and reused across iterations.
  */
object Clustering {

  /** Distances to every centroid as ONE array column. The centroid
    * matrix rides as a single nested-array LITERAL and the squared-L2
    * sums run through higher-order functions — `aggregate` folds left
    * from 0.0, so the float op sequence is exactly the oracle's
    * left-assoc `(q[1]-c[1])² + …` (0.0+t₁ ≡ t₁). An unrolled k·dim
    * per-element expression computes the same thing but generates
    * ~k·dim·4 Catalyst nodes PER USE — Janino chews tens of seconds
    * compiling those stages at k=8·dim=64, while this tree is
    * constant-size regardless of k and dim. */
  private[llm] def distArray(qv: Column, cents: IndexedSeq[IndexedSeq[Double]]): Column = {
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    transform(centsLit, c =>
      aggregate(zip_with(qv, c, (x, y) => { val d = x - y; d * d }),
        lit(0.0), (a, x) => a + x))
  }

  // A codebook is a trained ARTIFACT: in production it is fitted once
  // and served by every subsequent query, not refitted per query. The
  // memos below give the same economics in-process — keyed by the
  // source's canonicalized logical plan (path-identified, no hash
  // collisions) plus the training params; training is deterministic,
  // so a cached book is bit-identical to a refit. They also stop
  // repeated invocations from stacking duplicate persisted RDDs.
  private val codeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val bookCache = new java.util.concurrent.ConcurrentHashMap[
    String, IndexedSeq[IndexedSeq[Double]]]()

  private[graft] def planKey(df: DataFrame): String = {
    val p = df.queryExecution.logical.canonicalized
    // The canonicalized LOGICAL plan of a lazy `spark.read.parquet(p)`
    // is still the unresolved read node, which prints "paths: 1
    // provided" — NO path — so two same-schema corpora would collide
    // and serve a codebook trained on the wrong data. Key instead on
    // the RESOLVED input files (path + size + mtime, the same
    // fingerprint the EAV/bucket caches use): a regenerated file or a
    // different corpus yields a different key. LocalRelations have no
    // files, so their rows fold in via a 128-bit digest (a 32-bit
    // hashCode can collide silently). The key is scoped to the owning
    // session — a persisted frame is bound to the SparkSession that
    // built it.
    val fileDesc = df.inputFiles.sorted.map { uri =>
      val f = new java.io.File(new java.net.URI(
        if (uri.contains(":")) uri else "file:" + uri).getPath)
      s"$uri:${f.length}:${f.lastModified}"
    }.mkString("|")
    val localData = p.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.map(_.toString).mkString(";")
    }.mkString("|")
    val dataMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest((fileDesc + "\u0000" + localData).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    System.identityHashCode(df.sparkSession).toString + "#" + p.toString +
      "#" + dataMd5
  }

  /** Drop all trained artifacts (unpersisting cached code frames) —
    * the eviction path for session teardown / retrain-from-scratch. */
  def clearArtifacts(): Unit = {
    codeCache.values.forEach(df => { val _ = df.unpersist() })
    codeCache.clear()
    bookCache.clear()
    TextAnalysis.clearArtifacts()
  }

  /** sq8 code frame (vec_id, qv), persisted once per source. */
  private[llm] def codes(emb: DataFrame): DataFrame =
    codeCache.computeIfAbsent(planKey(emb), _ =>
      emb.select(col("vec_id"), Similarity.sq8(col("embedding")).as("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Assignment + per-point distance under fixed centroids: a pure
    * narrow projection. The [[distArray]] column lands in its own
    * projection (multiply-referenced, so CollapseProject keeps it
    * materialized); argmin is then `array_position(min)`, whose
    * first-occurrence rule IS the lowest-cid tie-break (== ORDER BY
    * dist, cid). A folded when-chain argmin would duplicate the
    * accumulator at every step — a ~3^k Catalyst tree. */
  private[llm] def assign(q: DataFrame, cents: IndexedSeq[IndexedSeq[Double]]): DataFrame =
    q.withColumn("__d", distArray(col("qv"), cents))
      .select(col("vec_id"), col("qv"),
        (array_position(col("__d"), array_min(col("__d"))) - 1).as("cluster"),
        array_min(col("__d")).as("dist"))

  /** Lloyd's loop over a [[codes]] frame: returns the centroids after
    * `iters` rounds (the round-`iters` assignment is [[assign]] of the
    * result). Centroids are a catalog-size driver artifact (k·dim
    * doubles), like commit refs — the per-round collect is inherent to
    * Lloyd's, not a distributed-design smell. */
  private[llm] def trainCentroids(q: DataFrame, k: Int, iters: Int,
                                  dim: Int): IndexedSeq[IndexedSeq[Double]] =
    bookCache.computeIfAbsent(s"${planKey(q)}|$k|$iters|$dim", _ =>
      trainCentroidsImpl(q, k, iters, dim))

  private def trainCentroidsImpl(q: DataFrame, k: Int, iters: Int,
                                 dim: Int): IndexedSeq[IndexedSeq[Double]] = {
    var cents: IndexedSeq[IndexedSeq[Double]] =
      q.orderBy(col("vec_id")).limit(k).collect()
        .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    for (_ <- 1 until iters) {
      // exact integer per-dim sums → one double division per centroid
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(i => sum(col("qv")(i)).as(s"s$i"))
      val upd = assign(q, cents).groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          val n = r.getLong(1).toDouble
          r.getLong(0) -> (0 until dim).map(i => r.getDouble(i + 2) / n)
        }.toMap
      cents = cents.indices.map(j => upd.getOrElse(j.toLong, cents(j)))
    }
    cents
  }

  /** Final assignment after `iters` Lloyd rounds: (vec_id, qv, cluster,
    * dist). `dim` is passed explicitly (no hidden driver action). */
  def kmeansSq8(emb: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    require(k > 0 && iters > 0 && dim > 0)
    val q = codes(emb)
    assign(q, trainCentroids(q, k, iters, dim))
  }

  /** IVF artifact UPSERT: assign a NEW batch of vectors against the
    * codebook trained on the EXISTING corpus — no refit (the
    * incremental-dedup economics applied to ANN: the trained artifact
    * is content-addressed by the existing corpus's plan, so arriving
    * batches reuse it from [[trainCentroids]]'s memo and only pay one
    * narrow assignment projection over the batch).
    *
    * Alongside the assignment, a per-cluster CENTROID-DRIFT statistic:
    * drift(j) = ‖mean(batch vectors assigned to j) − centroid(j)‖₂ —
    * the standard refit trigger (large drift = the incoming
    * distribution has moved off the trained book). `refit_hint` flags
    * clusters past `driftThreshold`. Exact-math discipline: integer
    * qv sums ÷ count, squared terms summed in index order, one sqrt +
    * micro-round at the end — replayable closed-form in SQL. */
  def upsertAssign(existing: DataFrame, batch: DataFrame, k: Int,
                   iters: Int, dim: Int,
                   driftThreshold: Double = 8.0): DataFrame = {
    require(k > 0 && iters > 0 && dim > 0)
    val cents = trainCentroids(codes(existing), k, iters, dim)
    val assigned = assign(codes(batch), cents)
    val aggs = count(lit(1)).as("n_new") +:
      (0 until dim).map(i => sum(col("qv")(i)).as(s"s$i"))
    val means = assigned.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
    val drift = means.select(col("cluster"), col("n_new"),
      round(driftCol(cents, col("n_new"), dim), 6).as("drift"))
    assigned
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
      .join(broadcast(drift), "cluster")
      .select(col("vec_id"), col("cluster"), col("dist"), col("n_new"),
        col("drift"), (col("drift") > driftThreshold).as("refit_hint"))
  }

  /** The frozen trained book as a PUBLIC artifact (k·dim doubles):
    * external consumers — the streaming drift monitor — train once on
    * the static corpus and serve it per micro-batch. Memoized like
    * every trained artifact. */
  def trainedBook(existing: DataFrame, k: Int, iters: Int,
                  dim: Int): IndexedSeq[IndexedSeq[Double]] =
    trainCentroids(codes(existing), k, iters, dim)

  /** Cluster-assignment column for an sq8 `qv` column under a fixed
    * book — a pure projection (streaming-safe, codegen'd; the same
    * argmin/tie-break law as [[assign]]). */
  def assignCol(qv: Column, book: IndexedSeq[IndexedSeq[Double]]): Column = {
    val d = distArray(qv, book)
    array_position(d, array_min(d)) - 1
  }

  /** Per-cluster drift column from exact-integer sum columns s0..s{dim−1}
    * and a count column: ‖(sᵢ/n)ᵢ − centroid(cluster)‖₂, the
    * [[upsertAssign]] statistic factored out so its batch and
    * streaming twins share one definition. */
  def driftCol(book: IndexedSeq[IndexedSeq[Double]], nCol: Column,
               dim: Int): Column = {
    val centsLit = typedLit(book.map(_.toSeq).toSeq)
    val meanArr = array((0 until dim).map(i => col(s"s$i") / nCol): _*)
    val ownCent = element_at(centsLit, col("cluster").cast("int") + 1)
    sqrt(aggregate(
      zip_with(meanArr, ownCent, (x, y) => { val d = x - y; d * d }),
      lit(0.0), (a, x) => a + x))
  }

  /** Drift-triggered PARTIAL refit — the consumer of [[upsertAssign]]'s
    * `refit_hint` (it previously ended the incremental-ANN lifecycle at
    * a hint): cells whose batch-mean drift exceeds `driftThreshold` are
    * re-fit with ONE restricted Lloyd round — each drifted cell's
    * centroid moves to the exact-integer mean of its (existing + batch)
    * members under the frozen book, and ONLY those members reassign,
    * among the drifted cells; frozen cells, their centroids and their
    * members are untouched. That is the 100 TB economics: refit work ∝
    * drifted-cell membership, not corpus size, and the frozen book
    * stays memoized.
    *
    * Output: (vec_id, cluster, dist, refit) for EVERY existing + batch
    * vector — `refit=true` rows carry the post-refit assignment and
    * distance, `refit=false` rows the frozen ones. Exact-math
    * discipline throughout (integer qv sums ÷ count, left-assoc
    * squared-L2, micro-rounds at the edges), so the whole lifecycle is
    * replayable closed-form in SQL. */
  def refitDrifted(existing: DataFrame, batch: DataFrame, k: Int,
                   iters: Int, dim: Int,
                   driftThreshold: Double = 8.0): DataFrame = {
    require(k > 0 && iters > 0 && dim > 0)
    val cents = trainCentroids(codes(existing), k, iters, dim)
    val exA = assign(codes(existing), cents)
    val baA = assign(codes(batch), cents)
    // per-cell batch drift, the same statistic upsertAssign reports
    val aggs = count(lit(1)).as("n_new") +:
      (0 until dim).map(i => sum(col("qv")(i)).as(s"s$i"))
    val means = baA.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
    val drifted = means
      .select(col("cluster"), round(driftCol(cents, col("n_new"), dim), 6).as("drift"))
      .where(col("drift") > driftThreshold)
      .collect().map(_.getLong(0)).sorted // k-bounded driver artifact
    val all = exA.unionByName(baA)
    val frozenOut = (d: DataFrame) => d.select(col("vec_id"), col("cluster"),
      round(col("dist"), 6).as("dist"), lit(false).as("refit"))
    if (drifted.isEmpty) return frozenOut(all)
    val isDrift = col("cluster").isin(drifted: _*)
    // one restricted Lloyd update: drifted centroids ← exact-integer
    // member means (k·dim-bounded collect, the trainCentroids law)
    val upAggs = count(lit(1)).as("n") +:
      (0 until dim).map(i => sum(col("qv")(i)).as(s"s$i"))
    val mem = all.where(isDrift)
    val upd = mem.groupBy(col("cluster")).agg(upAggs.head, upAggs.tail: _*)
      .collect().map { r =>
        val n = r.getLong(1).toDouble
        r.getLong(0) -> (0 until dim).map(i => r.getDouble(i + 2) / n)
      }.toMap
    val dCents = drifted.map(c => upd(c).toIndexedSeq).toIndexedSeq
    val reDist = distArray(col("qv"), dCents)
    val cidArr = typedLit(drifted.toSeq)
    val refitPart = mem.withColumn("__d", reDist)
      .select(col("vec_id"),
        element_at(cidArr,
          array_position(col("__d"), array_min(col("__d"))).cast("int"))
          .as("cluster"),
        round(array_min(col("__d")), 6).as("dist"), lit(true).as("refit"))
    frozenOut(all.where(!isDrift)).unionByName(refitPart)
  }

  /** Product-quantization codebooks: `m` independent Lloyd's runs,
    * one per `dim/m`-wide slice of the sq8 codes. PQ is how a 100 TB
    * embedding store actually fits: m bytes per vector instead of
    * 4·dim, with distances served from codeword tables. Training cost
    * is m small k-means runs over the SAME cached code frame (the
    * slice is a cheap projection); determinism is inherited wholesale
    * from [[trainCentroids]]. */
  private[llm] def trainPqBooks(q: DataFrame, m: Int, kSub: Int, iters: Int,
      dim: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      val sl = q.select(col("vec_id"), slice(col("qv"), s * sub + 1, sub).as("qv"))
      trainCentroids(sl, kSub, iters, sub)
    }
  }

  /** PQ encode against given books: (vec_id, qv, c0..c{m−1}) — each
    * cⱼ the nearest codeword id in subspace j (map-only projection,
    * same argmin shape as [[assign]]). */
  private[llm] def pqEncodeWith(q: DataFrame,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], dim: Int): DataFrame = {
    val m = books.size; val sub = dim / m
    val codeCols = (0 until m).map { s =>
      val d = distArray(slice(col("qv"), s * sub + 1, sub), books(s))
      (array_position(d, array_min(d)) - 1).as(s"c$s")
    }
    q.select(col("vec_id") +: col("qv") +: codeCols: _*)
  }

  /** Train + encode: the corpus as m codeword ids per vector. */
  def pqEncode(emb: DataFrame, m: Int, kSub: Int, iters: Int, dim: Int): DataFrame = {
    val q = codes(emb)
    pqEncodeWith(q, trainPqBooks(q, m, kSub, iters, dim), dim).drop("qv")
  }

  /** Diversity sample: the `n` members closest to their centroid per
    * cluster — the standard "one exemplar per semantic region" pick for
    * dataset curation. Window over the k-means assignment: one shuffle
    * on cluster id (k groups — tiny; the heavy work is the scan). */
  def diverseTopN(emb: DataFrame, k: Int, iters: Int, dim: Int, n: Int): DataFrame = {
    val a = kmeansSq8(emb, k, iters, dim)
    // two-phase top-n: a cluster holds ~corpus/k members — the final
    // per-cluster window must only ever see the ≤ n·buckets bucket
    // winners, never a whole cluster in one task. Identical result
    // (every global top-n survives its bucket's cut); the bucket hash
    // never reaches the output, so the oracle stays direct.
    val wb = Window.partitionBy(col("cluster"), col("__b"))
      .orderBy(col("dist"), col("vec_id"))
    val local = a.withColumn("__b", pmod(xxhash64(col("vec_id")), lit(32L)))
      .withColumn("__rn", row_number().over(wb)).where(col("__rn") <= n)
      .drop("__b", "__rn")
    val w = Window.partitionBy(col("cluster")).orderBy(col("dist"), col("vec_id"))
    local.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= n)
      .select(col("cluster"), col("vec_id"), col("rank"))
  }
}
