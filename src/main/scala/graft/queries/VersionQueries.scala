package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Graft
import graft.core._
import graft.storage.{Eav, LayerStore, Migration, Updates, Validator}

/** Versioning, update, source/sink, and wire-format operators — each
  * driven end-to-end (real commit layers under target/) with a
  * deterministic DuckDB oracle. */
object VersionQueries {

  type Q = (SparkSession, String) => DataFrame

  private def cacheRoot = Graft.cacheRoot
  private def san(dir: String) = dir.replaceAll("[^A-Za-z0-9.]", "_")

  private def emptyEav(spark: SparkSession) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Eav.schema)

  /** n_name triples of a nation subset, built columnar. */
  private def nameTriples(df: DataFrame): DataFrame =
    df.select(lit("instance").as("g"),
      concat(lit("tpch:nation/"), col("n_nationkey").cast(StringType)).as("s"),
      lit("tpch:n_name").as("p"), lit("l").as("o_kind"),
      lit(null).cast(StringType).as("o_iri"), lit("xsd:string").as("o_typ"),
      col("n_name").as("o_str"), lit(null).cast(DoubleType).as("o_dbl"),
      lit(null).cast(LongType).as("o_lng"),
      lit(null).cast(TimestampType).as("o_ts"),
      lit(null).cast(BooleanType).as("o_bool"),
      lit(null).cast(StringType).as("o_lang"),
      lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))

  /** Deterministic two-commit store: base = nations 0–14, delta adds
    * 15–24 and removes nation 0 (idempotent per sf dir). */
  private def deltaStore(spark: SparkSession, dir: String): LayerStore = synchronized {
    val st = LayerStore.open(spark, s"$cacheRoot/store_delta_${san(dir)}")
    if (st.refs.isEmpty) {
      val nation = Graft.table(spark, dir, "nation")
      st.commit("main", nameTriples(nation.where(col("n_nationkey") < 15)),
        emptyEav(spark), "base")
      st.commit("main", nameTriples(nation.where(col("n_nationkey") >= 15)),
        nameTriples(nation.where(col("n_nationkey") === 0)), "delta")
    }
    st
  }

  /** Fixed-content three-commit store (plus a `mid` branch at commit 1)
    * for the HTTP log/diff oracles. Content is literal — independent of
    * the sf dir — so the store path AND the expected log/diff are
    * static; commit ids are content-addressed, hence identical across
    * runs, and the log oracle re-walks them from the on-disk commit
    * catalog itself. */
  private def httpFixedStore(spark: SparkSession): LayerStore = synchronized {
    val st = LayerStore.open(spark, s"$cacheRoot/store_http_fixed")
    if (st.refs.isEmpty) {
      import spark.implicits._
      def t(pairs: (Int, String)*) =
        nameTriples(pairs.toSeq.toDF("n_nationkey", "n_name"))
      st.commit("main", t((0, "HTTP_0"), (1, "HTTP_1"), (2, "HTTP_2")),
        emptyEav(spark), "base")
      st.branch("mid", "main")
      st.commit("main",
        t((1, "HTTP_1_V2"), (10, "HTTP_10"), (11, "HTTP_11")),
        t((0, "HTTP_0"), (1, "HTTP_1")), "delta")
      st.commit("main", t((12, "HTTP_12")), emptyEav(spark), "final")
    }
    // nested named database (the /api/db layout: <root>/dbs/<name>)
    // for the cross-db using() oracle — also fixed-content
    val aux = LayerStore.open(spark, s"${st.root}/dbs/aux")
    if (aux.refs.isEmpty) {
      import spark.implicits._
      def t(pairs: (Int, String)*) =
        nameTriples(pairs.toSeq.toDF("n_nationkey", "n_name"))
      aux.commit("main", t((1, "AUX_1"), (2, "AUX_2"), (3, "AUX_3")),
        emptyEav(spark), "aux base")
    }
    st
  }

  private def httpGet(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  private def httpPost(url: String, body: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Ad-hoc schema-constraint rows for the validator queries, in the
    * column shape `Validator.constraintsFrom` reads: IRI-valued
    * (rdfs:domain / rdfs:range), string-valued (graft:oneOf),
    * bool-valued (graft:subdocument). */
  private def schemaRows(spark: SparkSession,
      iri: Seq[(String, String, String)] = Nil,
      str: Seq[(String, String, String)] = Nil,
      bool: Seq[(String, String, Boolean)] = Nil): DataFrame = {
    import spark.implicits._
    val i = iri.toDF("s", "p", "o_iri")
      .withColumn("o_str", lit(null).cast(StringType))
      .withColumn("o_bool", lit(null).cast(BooleanType))
    val s2 = str.toDF("s", "p", "o_str")
      .withColumn("o_iri", lit(null).cast(StringType))
      .withColumn("o_bool", lit(null).cast(BooleanType))
    val b = bool.toDF("s", "p", "o_bool")
      .withColumn("o_iri", lit(null).cast(StringType))
      .withColumn("o_str", lit(null).cast(StringType))
    i.unionByName(s2).unionByName(b)
      .withColumn("o_lng", lit(null).cast(LongType))
  }

  /** Instance-graph delta row with an IRI object (validator fixtures). */
  private def iriTriples(df: DataFrame, s: Column, p: String, o: Column): DataFrame =
    df.select(lit("instance").as("g"), s.as("s"), lit(p).as("p"),
      lit("i").as("o_kind"), o.as("o_iri"),
      lit(null).cast(StringType).as("o_typ"),
      lit(null).cast(StringType).as("o_str"),
      lit(null).cast(DoubleType).as("o_dbl"),
      lit(null).cast(LongType).as("o_lng"),
      lit(null).cast(TimestampType).as("o_ts"),
      lit(null).cast(BooleanType).as("o_bool"),
      lit(null).cast(StringType).as("o_lang"),
      lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))

  /** Fixed-content two-commit store for the `size` oracle — content is
    * literal (independent of the sf dir) so the store path, and with it
    * the oracle SQL, is static. */
  private def sizeStore(spark: SparkSession): LayerStore = synchronized {
    val st = LayerStore.open(spark, s"$cacheRoot/store_size_fixed")
    if (st.refs.isEmpty) {
      import spark.implicits._
      def t(lo: Int, hi: Int) = nameTriples(
        (lo until hi).map(i => (i, s"SIZE_$i")).toDF("n_nationkey", "n_name"))
      st.commit("main", t(0, 15), emptyEav(spark), "base")
      st.commit("main", t(15, 25), t(0, 1), "delta")
    }
    st
  }

  val queries: Map[String, Q] = Map(

    // the HTTP facade driven END-TO-END: the flagship query serialized
    // to the v10 wire, POSTed over real HTTP (JDK client → JDK server),
    // response bindings parsed back into a frame — oracle identical to
    // woql_flagship, so the whole transport + binding-render path is
    // driver-gated. Server lifecycle is per-call (start/stop around the
    // request): no leaked listener threads in verify runs.
    "ext_http_woql" -> ((s, d) => {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val running = graft.server.HttpApi.start(s, d)
      val resp = try {
        val wire = graft.core.JsonWoqlWrite.write(WoqlQueries.flagship)
        val client = java.net.http.HttpClient.newHttpClient()
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(running.url("/api/woql")))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(wire)).build()
        client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      } finally running.stop()
      val rows = (JsonMethods.parse(resp) \ "bindings") match {
        case JArray(bs) => bs.map { b =>
          val name = (b \ "Name" \ "@value") match {
            case JString(x) => x; case other => sys.error(s"bad Name: $other")
          }
          val bal = (b \ "Bal" \ "@value") match {
            case JDouble(x) => x
            case JInt(x) => x.toDouble
            case other => sys.error(s"bad Bal: $other")
          }
          (name, bal)
        }
        case other => sys.error(s"bad bindings: $other")
      }
      import s.implicits._
      rows.toDF("c_name", "c_acctbal")
    }),

    // the /api/log route end-to-end against a fixed-content store; the
    // oracle RE-WALKS the same on-disk commit catalog (refs + parent
    // links) with a DuckDB recursive CTE, so route, catalog encoding
    // and chain order are all driver-gated
    "ext_http_log" -> ((s, d) => {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val st = httpFixedStore(s)
      val running = graft.server.HttpApi.start(s, d, storeRoot = Some(st.root))
      val resp = try httpGet(running.url("/api/log?branch=main"))
        finally running.stop()
      val rows = (JsonMethods.parse(resp) \ "commits") match {
        case JArray(cs) => cs.zipWithIndex.map { case (c, i) =>
          def str(f: String) = (c \ f) match {
            case JString(x) => x
            case JNull => null
            case other => sys.error(s"bad $f: $other")
          }
          (i.toLong + 1, str("identifier"), str("parent"), str("message"))
        }
        case other => sys.error(s"bad commits: $other")
      }
      import s.implicits._
      rows.toDF("rank", "commit_id", "parent", "message")
    }),

    // the /api/diff route end-to-end: branch-addressed from/to, patch
    // presentation with swap fusion — expected rows are closed-form
    // from the fixed store's construction
    "ext_http_diff" -> ((s, d) => {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val st = httpFixedStore(s)
      val running = graft.server.HttpApi.start(s, d, storeRoot = Some(st.root))
      val resp = try httpGet(running.url("/api/diff?from=mid&to=main"))
        finally running.stop()
      val rows = (JsonMethods.parse(resp) \ "patch") match {
        case JArray(ps) => ps.map { p =>
          def str(f: String) = (p \ f) match {
            case JString(x) => x
            case JNull => null
            case other => sys.error(s"bad $f: $other")
          }
          (str("subject"), str("property"), str("op"), str("old"), str("new"))
        }
        case other => sys.error(s"bad patch: $other")
      }
      import s.implicits._
      rows.toDF("subject", "property", "op", "old_v", "new_v")
    }),

    // the /api/history route end-to-end: per-document commit history
    // with added/removed counts; the oracle re-walks the same commit
    // catalog AND re-counts the same delta-layer parquet files
    "ext_http_history" -> ((s, d) => {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val st = httpFixedStore(s)
      val running = graft.server.HttpApi.start(s, d, storeRoot = Some(st.root))
      val resp = try httpGet(running.url(
        "/api/history?branch=main&id=tpch:nation/1"))
        finally running.stop()
      val rows = (JsonMethods.parse(resp) \ "commits") match {
        case JArray(cs) => cs.zipWithIndex.map { case (c, i) =>
          def str(f: String) = (c \ f) match {
            case JString(x) => x; case other => sys.error(s"bad $f: $other")
          }
          def num(f: String) = (c \ f) match {
            case JInt(x) => x.toLong; case other => sys.error(s"bad $f: $other")
          }
          (i.toLong + 1, str("identifier"), str("message"),
            num("added"), num("removed"))
        }
        case other => sys.error(s"bad commits: $other")
      }
      import s.implicits._
      rows.toDF("seq", "commit_id", "message", "added", "removed")
    }),

    // NETWORK remote transfer end-to-end ([ref:core/api/api_pack.pl]):
    // TWO HttpApi servers over two fresh stores, synced ONLY over real
    // HTTP — clone(B←A) → B commits → push(B→A, refs-negotiated: the
    // layer count assertion proves exactly ONE layer travelled) →
    // A commits → pull(B←A, fast-forward). Result = B's materialized
    // graph, whose expected content is closed-form.
    "ext_http_transfer" -> ((s, d) => {
      import s.implicits._
      def t(pairs: (Int, String)*) =
        nameTriples(pairs.toSeq.toDF("n_nationkey", "n_name"))
      def layerCount(root: String): Int =
        Option(new java.io.File(root, "layers").list()).map(_.length).getOrElse(0)
      def enc(u: String) = java.net.URLEncoder.encode(u, "UTF-8")
      val tmpA = java.nio.file.Files.createTempDirectory("graft-xferA").toString
      val tmpB = java.nio.file.Files.createTempDirectory("graft-xferB").toString
      val stA = LayerStore.open(s, tmpA)
      stA.commit("main", t((0, "XFER_0"), (1, "XFER_1"), (2, "XFER_2")),
        emptyEav(s), "base")
      stA.commit("main", t((3, "XFER_3")), t((0, "XFER_0")), "delta")
      val srvA = graft.server.HttpApi.start(s, d, storeRoot = Some(tmpA))
      val srvB = graft.server.HttpApi.start(s, d, storeRoot = Some(tmpB))
      try {
        val stB = srvB.store
        val base = enc(srvA.url(""))
        httpPost(srvB.url(s"/api/clone?src=$base&branch=main"), "")
        require(stB.refs("main") == stA.refs("main"), "clone head mismatch")
        stB.commit("main", t((4, "XFER_4")), emptyEav(s), "b-extra")
        val layersA0 = layerCount(tmpA)
        httpPost(srvB.url(s"/api/push?remote=$base&branch=main"), "")
        require(stA.refs("main") == stB.refs("main"), "push head mismatch")
        require(layerCount(tmpA) == layersA0 + 1,
          "negotiated push must ship exactly the one missing layer")
        stA.commit("main", t((5, "XFER_5")), emptyEav(s), "a-extra")
        httpPost(srvB.url(s"/api/pull?remote=$base&branch=main"), "")
        require(stB.refs("main") == stA.refs("main"), "pull head mismatch")
        stB.materializeBranch("main")
          .select(col("s"), col("o_str").as("n_name")).orderBy(col("s"))
      } finally { srvA.stop(); srvB.stop() }
    }),

    // storage size (§2.4 size / reference `size(Resource,Bytes)` API):
    // per-layer byte totals of the fixed-content store, measured
    // DISTRIBUTED via the binaryFile source (no driver-side File.walk —
    // at cluster scale the layer listing itself is a dataset). The
    // oracle re-measures the SAME on-disk files with DuckDB read_blob,
    // so the check compares real storage bytes, not a parquet-encoding
    // prediction.
    "woql_size" -> ((s, d) => {
      val _ = sizeStore(s)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(s"$cacheRoot/store_size_fixed/layers")
        .select(regexp_extract(col("path"), "layers/([^/]+)/", 1).as("layer"),
          col("length").as("bytes"))
        .groupBy(col("layer"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
    }),

    // random key (§2.6 idgen random): keys are inherently
    // nondeterministic, so the oracle checks the invariants the
    // reference guarantees — one key per solution row, global
    // uniqueness, UUID-v4 lexical shape — each an exact count the
    // oracle replays from the nation cardinality.
    "woql_random_key" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val uuidRe = "^doc:Nation/[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-" +
        "[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
      Compiler.run(And(Seq(
          TriplePat(V("N"), Node("tpch:n_name"), V("Nm")),
          RandomKey("doc:Nation/", "K"))))
        .select(col("K").getField("iri").as("k"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("k")).as("n_distinct"),
          sum(when(col("k").rlike(uuidRe), 1L).otherwise(0L)).as("n_uuid"))
    }),

    // delta scans against real commit layers (§2.1 added/removed_triple)
    "woql_added_triple" -> ((s, d) => {
      val st = deltaStore(s, d)
      implicit val ctx: Ctx = Updates.ctxFromStore(st, "main")
      Compiler.run(AddedTriple(V("S"), Node("tpch:n_name"), V("O"), st.refs("main")))
        .select(col("S").getField("iri").as("s"), col("O").getField("str").as("o"))
    }),

    "woql_removed_triple" -> ((s, d) => {
      val st = deltaStore(s, d)
      implicit val ctx: Ctx = Updates.ctxFromStore(st, "main")
      Compiler.run(RemovedTriple(V("S"), Node("tpch:n_name"), V("O"), st.refs("main")))
        .select(col("S").getField("iri").as("s"), col("O").getField("str").as("o"))
    }),

    // WOQL-level resource scoping (`using` — the in-query spelling of
    // the HTTP layer's ?branch/?commit time travel): join the branch
    // HEAD against the FIRST commit in ONE query. Shared variable S
    // equi-joins across the two addressed graphs; solutions are the
    // nations present in both (1–14: 0 was removed by the delta,
    // 15–24 didn't exist yet).
    "woql_using_commit" -> ((s, d) => {
      val st = deltaStore(s, d)
      implicit val ctx: Ctx = Updates.ctxFromStore(st, "main")
      val first = st.chain(st.refs("main")).head
      Compiler.run(And(Seq(
          TriplePat(V("S"), Node("tpch:n_name"), V("Now")),
          Using(s"commit/$first",
            TriplePat(V("S"), Node("tpch:n_name"), V("Then"))))))
        .select(col("S").getField("iri").as("s"),
          col("Now").getField("str").as("now_name"),
          col("Then").getField("str").as("then_name"))
    }),

    // cross-DATABASE using (the reference's org/db resource strings):
    // one query joins the fixed store's main head against the nested
    // named database's main branch — heads {1:V2, 2, 10, 11, 12} ∩
    // aux {1, 2, 3} on the shared subject variable
    "woql_using_db" -> ((s, d) => {
      val st = httpFixedStore(s)
      implicit val ctx: Ctx = Updates.ctxFromStore(st, "main")
      Compiler.run(And(Seq(
          TriplePat(V("S"), Node("tpch:n_name"), V("Name")),
          Using("db/aux",
            TriplePat(V("S"), Node("tpch:n_name"), V("Aux"))))))
        .select(col("S").getField("iri").as("s"),
          col("Name").getField("str").as("name"),
          col("Aux").getField("str").as("aux_name"))
    }),

    // WOQL WRITE query over the wire: AddTriple leaves in a v10 JSON
    // body staged per solution of the read part and landed as one
    // commit on the server's main branch — end-to-end through
    // /api/woql, then read back from the engine-written store
    "woql_wire_update" -> ((s, d) => {
      val root = s"$cacheRoot/store_wire_${san(d)}"
      val st = LayerStore.open(s, root)
      if (st.refs.isEmpty) {
        val running = graft.server.HttpApi.start(s, d, storeRoot = Some(root))
        val body =
          """{"@type":"And","and":[
            | {"@type":"Triple","subject":{"variable":"C"},
            |  "predicate":{"node":"tpch:c_mktsegment"},
            |  "object":{"variable":"Seg"}},
            | {"@type":"Equals","left":{"variable":"Seg"},
            |  "right":{"data":{"@type":"xsd:string","@value":"BUILDING"}}},
            | {"@type":"AddTriple","subject":{"variable":"C"},
            |  "predicate":{"node":"tpch:tag"},
            |  "object":{"data":{"@type":"xsd:string","@value":"building"}}}
            |]}""".stripMargin
        val resp = try httpPost(running.url("/api/woql?msg=tag+building"), body)
          finally running.stop()
        require(resp.contains("api:success"), s"wire update failed: $resp")
      }
      st.materializeBranch("main").filter(col("p") === "tpch:tag")
        .select(col("s"), col("o_str").as("tag"))
    }),

    // GraphQL per-link orderBy/limit (the reference's nested-
    // collection paging): top-3 BUILDING customers by acctbal per
    // NATION_1x nation — compiled to a GroupTopKJoin riding the
    // native GroupTopK plan (partial bounded heaps, one clustered
    // exchange), never a full-group window sort; link var tiebreaks
    // so the page is deterministic
    "ext_graphql_topk_links" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Nation(filter: {n_name: {startsWith: "NATION_1"}}) {
          |    n_name
          |    _c_nationkey_of_Customer(filter: {c_mktsegment: {eq: "BUILDING"}},
          |                             orderBy: {c_acctbal: DESC}, limit: 3) {
          |      c_name c_acctbal } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("n_name").getField("str").as("n_name"),
        col("_c_nationkey_of_Customer_c_name").getField("str").as("c_name"),
        col("_c_nationkey_of_Customer_c_acctbal").getField("dbl").as("c_acctbal"))
    }),

    // rebase CONFLICT RESOLUTION (the reference db_rebase fixup /
    // continuation path): dev and main both remove nation 3 — a
    // replay conflict — and dev's second commit removes nations 4
    // and 5 where main already removed 4 (conflict again, with 5
    // still present so the skip is observable). The resolution map
    // lands the first commit with "theirs" (the now-vacuous remove is
    // satisfied, its marker add survives) and skips the second with
    // "ours" (nation 5 stays). Resolutions are consulted ONLY at
    // conflicts — clean commits replay as usual.
    "woql_rebase_res" -> ((s, d) => {
      val root = s"$cacheRoot/store_rebres_${san(d)}"
      val st = LayerStore.open(s, root)
      if (st.refs.isEmpty) {
        val nat = Graft.table(s, d, "nation").where(col("n_nationkey") < 10)
        def byKey(k: Int) = nameTriples(nat.where(col("n_nationkey") === k))
        val marker = s.range(1).select(lit("instance").as("g"),
          lit("tpch:nation/marker").as("s"), lit("tpch:n_name").as("p"),
          lit("l").as("o_kind"), lit(null).cast(StringType).as("o_iri"),
          lit("xsd:string").as("o_typ"), lit("REBASED").as("o_str"),
          lit(null).cast(DoubleType).as("o_dbl"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(TimestampType).as("o_ts"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_lang"),
          lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
        st.commit("main", nameTriples(nat), emptyEav(s), "base")
        st.branch("dev", "main")
        val d1 = st.commit("dev", marker, byKey(3), "dev: rm 3 + marker")
        val d2 = st.commit("dev", emptyEav(s),
          nameTriples(nat.where(col("n_nationkey").isin(4, 5))), "dev: rm 4+5")
        st.commit("main", emptyEav(s), byKey(3), "main: rm 3")
        st.commit("main", emptyEav(s), byKey(4), "main: rm 4")
        // without resolutions this is the abort case (LayersSpec);
        // with them the replay completes
        val res = st.rebase("dev", "main",
          resolutions = Map(d1 -> "theirs", d2 -> "ours"))
        require(res.isRight, s"resolved rebase still aborted: $res")
      }
      st.materializeBranch("dev").select(col("o_str").as("name"))
    }),

    // materialization after the delta (fold of adds/removes)
    "woql_materialized" -> ((s, d) => {
      val st = deltaStore(s, d)
      // GC re-verification (r14 verdict #5): squash onto a detached
      // branch, sweep the debris, and prove the LIVE chain's
      // materialization is byte-identical after the sweep — the
      // driver's oracle IS the post-GC read. Fixpoint-safe: on a
      // pre-GC'd cached store the squash branch already exists, gc
      // finds nothing, the read is the same.
      synchronized {
        if (!st.refs.contains("squashme")) {
          st.branch("squashme", "main")
          st.optimize("squashme") // detach onto a fresh root
        }
        st.deleteBranch("squashme")
        val _ = st.gc() // sweeps the squash root; main's chain survives
      }
      st.materializeBranch("main")
        .select(col("s"), col("o_str").as("o"))
    }),

    // put (CSV sink, §2.1): write then return the written bindings
    "woql_put_csv" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val path = s"$cacheRoot/put_${san(d)}"
      Compiler.run(PutCsv(Seq(("n_name", "N")),
          TriplePat(V("S"), Node("tpch:n_name"), V("N")), path))
        .select(col("N").getField("str").as("n_name"))
    }),

    // with (query-local temp graph, §2.1)
    "woql_with_graph" -> ((s, d) => {
      val path = s"$cacheRoot/withg_${san(d)}"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        Graft.table(s, d, "region")
          .select(concat(lit("r/"), col("r_regionkey").cast(StringType)).as("s"),
            lit("name").as("p"), col("r_name").as("o"))
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
      }
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(WithGraph("tmp", path,
          TriplePat(V("S"), Node("name"), V("O"), g = "tmp")))
        .select(col("S").getField("iri").as("s"), col("O").getField("str").as("o"))
    }),

    "woql_triple_count" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(TripleCount("instance", "N"))
        .select(col("N").getField("lng").as("n"))
    }),

    // staged WOQL update → commit → query back (§2.8 insert/commit protocol)
    "woql_update_staged" -> ((s, d) => {
      val root = s"$cacheRoot/store_upd_${san(d)}"
      val st = LayerStore.open(s, root)
      implicit val ctx: Ctx = Graft.ctx(s, d)
      if (st.refs.isEmpty) {
        val q = And(Seq(
          TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
          Eq(V("Seg"), Str("BUILDING"))))
        val (adds, removes) = Updates.stage(q,
          inserts = Seq((V("C"), Node("tpch:tag"), Str("building"))))
        st.commit("main", adds, removes, "tag building customers")
      }
      st.materializeBranch("main").filter(col("p") === "tpch:tag")
        .select(col("s"), col("o_str").as("tag"))
    }),

    // `into` write-graph scoping (§2 using/from/into): the staged
    // inserts land in the SCHEMA graph; querying them back needs a
    // schema-scoped quad — the instance graph must not see them
    "woql_into_schema" -> ((s, d) => {
      val root = s"$cacheRoot/store_into_${san(d)}"
      val st = LayerStore.open(s, root)
      implicit val ctx: Ctx = Graft.ctx(s, d)
      if (st.refs.isEmpty) {
        val q = And(Seq(
          TriplePat(V("R"), Node("tpch:r_name"), V("N"))))
        val (adds, removes) = Updates.stage(q,
          inserts = Seq((V("R"), Node("rdfs:comment"), V("N"))),
          graph = "schema")
        st.commit("main", adds, removes, "annotate regions in schema graph")
      }
      val mat = st.materializeBranch("main")
      // quad-scoped readback: present in schema, absent from instance
      val inSchema = mat.filter(col("g") === "schema" &&
        col("p") === "rdfs:comment")
        .select(col("s"), col("o_str").as("comment"))
      val leakedToInstance = mat.filter(col("g") === "instance" &&
        col("p") === "rdfs:comment").count()
      require(leakedToInstance == 0, "into(schema) leaked to instance graph")
      inSchema
    }),

    // schema MIGRATION (§2.8 family; the reference's migration API):
    // rename a property (schema + every instance triple rewritten) and
    // retype another (string → integer through the typecast ladder),
    // both as ONE commit — then read the migrated head back
    "woql_migrate" -> ((s, d) => {
      val root = s"$cacheRoot/store_migr_${san(d)}"
      val st = LayerStore.open(s, root)
      if (st.refs.isEmpty) {
        val nation = Graft.table(s, d, "nation")
        val inst = Eav.encodeTable(nation,
          concat(lit("tpch:nation/"), col("n_nationkey").cast(StringType)),
          "tpch:Nation",
          Seq(("tpch:n_name", Eav.PStr, col("n_name")),
            ("tpch:nk_str", Eav.PStr, col("n_nationkey").cast(StringType))))
        st.commit("main", inst, emptyEav(s), "seed")
        Migration.migrate(st, "main", Seq(
          Migration.AddProperty("tpch:n_name", "tpch:Nation", "xsd:string"),
          Migration.RenameProperty("tpch:n_name", "rdfs:label"),
          Migration.CastProperty("tpch:nk_str", "xsd:integer")),
          "rename n_name -> label; nk_str -> integer")
      }
      val mat = st.materializeBranch("main")
      val labels = mat.filter(col("g") === "instance" && col("p") === "rdfs:label")
        .select(col("s"), col("o_str").as("label"))
      val nks = mat.filter(col("g") === "instance" && col("p") === "tpch:nk_str")
        .select(col("s"), col("o_lng").as("nk"), col("o_typ").as("nk_type"))
      // the rename must leave NO tpch:n_name instance rows behind
      require(mat.filter(col("g") === "instance" &&
        col("p") === "tpch:n_name").isEmpty, "rename left old rows")
      // and the renamed schema rows must exist under the new subject
      require(!mat.filter(col("g") === "schema" && col("s") === "rdfs:label" &&
        col("p") === "rdfs:domain").isEmpty, "schema rows not renamed")
      labels.join(nks, "s")
    }),

    // document insert → triples (§2.8 document CRUD; ids are lexical keys)
    "doc_insert" -> ((s, d) => {
      import s.implicits._
      val json = Graft.table(s, d, "nation")
        .select(to_json(struct(col("n_name"), col("n_nationkey"))).as("j"))
        .as[String]
      graft.docs.Documents.insertAll(json, "Nation",
          graft.docs.Documents.LexicalKey(Seq("n_name")))
        .filter(col("p") === "doc:n_name")
        .select(col("s"), col("o_str").as("name"))
    }),

    // JSON-LD framing options ([ref:core/query/frame.pl] unfold/depth
    // control): nested nation docs (geo → detail, two subdocument
    // levels) read at three framings — full unfold resolves the leaf
    // literal, depth=1 folds the level-2 subdocument to its @id
    // string, unfold=false folds the level-1 one; the fold-boundary
    // ids are closed-form (`<root>/geo`, `<root>/geo/detail`) so the
    // oracle replays them relationally
    "doc_frame_opts" -> ((s, d) => {
      import s.implicits._
      import org.json4s._
      def str(j: JValue): String = j match {
        case JString(x) => x
        case other => sys.error(s"expected string, got $other")
      }
      def lng(j: JValue): Long = j match {
        case JInt(x) => x.toLong
        case other => sys.error(s"expected int, got $other")
      }
      val json = Graft.table(s, d, "nation")
        .join(Graft.table(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("n_nationkey") < 8)
        .select(to_json(struct(col("n_name"),
          struct(col("r_name").as("region_name"),
            struct(col("r_regionkey").cast(LongType).as("rk"))
              .as("detail")).as("geo"))).as("j"))
        .as[String]
      val g = graft.docs.Documents.insertAll(json, "Nation",
        graft.docs.Documents.LexicalKey(Seq("n_name")))
      val ids = g.filter(col("p") === "rdf:type")
        .select("s").collect().map(_.getString(0)).sorted
      ids.toSeq.map { id =>
        val full = graft.docs.Documents.read(g, id)
        val d1 = graft.docs.Documents.read(g, id, depth = 1)
        val folded = graft.docs.Documents.read(g, id, unfold = false)
        (id, lng(full \ "geo" \ "detail" \ "rk"),
          str(d1 \ "geo" \ "region_name"), str(d1 \ "geo" \ "detail"),
          str(folded \ "geo"))
      }.toDF("s", "rk", "region_name", "detail_ref", "geo_ref")
    }),

    // document template query ([ref:core/api/api_document.pl] `query`
    // parameter): ALL 25 nations as two-level nested docs with a
    // scalar-array field, matched four ways — a nested subdocument
    // template, a conjunction of set membership + a two-level leaf, a
    // root integer leaf, and the empty template (= plain listing).
    // Every case is closed-form from nation ⋈ region, so the oracle
    // replays the template semantics relationally
    "doc_query_template" -> ((s, d) => {
      import s.implicits._
      val json = Graft.table(s, d, "nation")
        .join(Graft.table(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(to_json(struct(col("n_name"),
          col("n_nationkey").cast(LongType).as("nk"),
          array(lit("all"),
            when(pmod(col("n_nationkey"), lit(2)) === 0, "even")
              .otherwise("odd")).as("tags"),
          struct(col("r_name").as("region_name"),
            struct(col("r_regionkey").cast(LongType).as("rk"))
              .as("detail")).as("geo"))).as("j"))
        .as[String]
      val g = graft.docs.Documents.insertAll(json, "Nation",
        graft.docs.Documents.LexicalKey(Seq("n_name"))).cache()
      import org.json4s.jackson.JsonMethods.{parse => pj}
      def run(qcase: String, tpl: String) =
        graft.docs.Documents.queryIds(g, "Nation", pj(tpl))
          .map(id => (qcase, id))
      (run("nested", """{"geo":{"region_name":"ASIA"}}""") ++
       run("conj", """{"tags":"even","geo":{"detail":{"rk":0}}}""") ++
       run("int", """{"nk":7}""") ++
       run("empty", "{}")).toDF("qcase", "s")
    }),

    // document update + delete through the commit protocol (§2.8):
    // insert all nation docs, replace NATION_0's subgraph with a new
    // shape, delete NATION_1's — then read the surviving doc fields
    "doc_update" -> ((s, d) => {
      import s.implicits._
      val root = s"$cacheRoot/store_docupd_${san(d)}"
      val st = LayerStore.open(s, root)
      implicit val ctx: Ctx = Graft.ctx(s, d)
      if (st.refs.isEmpty) {
        val json = Graft.table(s, d, "nation")
          .select(to_json(struct(col("n_name"), col("n_nationkey"))).as("j"))
          .as[String]
        val adds = graft.docs.Documents.insertAll(json, "Nation",
          graft.docs.Documents.LexicalKey(Seq("n_name")))
        st.commit("main", adds, emptyEav(s), "insert docs")
        val (a2, r2) = Updates.stageDocUpdate(st.materializeBranch("main"),
          "doc:Nation/NATION_0", """{"n_name":"NATION_0","flag":"updated"}""",
          "Nation")
        st.commit("main", a2, r2, "update NATION_0")
        val r3 = graft.docs.Documents.delete(
          st.materializeBranch("main"), "doc:Nation/NATION_1")
        st.commit("main", emptyEav(s), r3, "delete NATION_1")
      }
      st.materializeBranch("main")
        .filter(col("p").startsWith("doc:"))
        .select(col("s"), col("p"),
          coalesce(col("o_str"), col("o_lng").cast(StringType)).as("v"))
    }),

    // DeleteDocument as a WOQL op (§2.8): document ids selected by a
    // WOQL query over the branch, their subgraphs staged as removes
    // through the commit protocol — then the survivors read back
    "woql_delete_doc" -> ((s, d) => {
      import s.implicits._
      val st = LayerStore.open(s, s"$cacheRoot/store_docdel_${san(d)}")
      synchronized { if (st.refs.isEmpty) {
        val json = Graft.table(s, d, "nation")
          .select(to_json(struct(col("n_name"), col("n_nationkey"))).as("j"))
          .as[String]
        val adds = graft.docs.Documents.insertAll(json, "Nation",
          graft.docs.Documents.LexicalKey(Seq("n_name")))
        st.commit("main", adds, emptyEav(s), "insert docs")
        implicit val sctx: Ctx = Updates.ctxFromStore(st, "main")
        val removes = Updates.stageDocDelete(st.materializeBranch("main"),
          And(Seq(TriplePat(V("D"), Node("doc:n_nationkey"), V("K")),
            Cmp("<", V("K"), Lng(10)))), "D")
        st.commit("main", emptyEav(s), removes, "delete nations < 10")
      }}
      st.materializeBranch("main").filter(col("p") === "doc:n_name")
        .select(col("s"), col("o_str").as("name"))
    }),

    // turtle load round-trip (§2.1 bulk RDF)
    "turtle_load" -> ((s, d) => {
      val regions = Graft.table(s, d, "region")
        .select(col("r_regionkey"), col("r_name")).collect()
        .sortBy(_.getInt(0))
      val ttl = "@prefix r: <tpch:region/> .\n" + regions.map { r =>
        s"""r:${r.getInt(0)} <name> "${r.getString(1)}" ."""
      }.mkString("\n")
      graft.sources.Turtle.load(s, ttl)
        .select(col("s"), col("o_str").as("o"))
    }),

    // ReadDocument inside WOQL (flat doc view; §2.8)
    // document diff/patch (reference: v10 /api/diff): diff the customer
    // slice against an edited state — re-segmented BUILDING customers
    // (swap), dropped names for custkey % 97 (delete), a vip flag for
    // high balances (insert) — and present the patch
    "doc_diff" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val old = ctx.triples.filter(col("g") === "instance" &&
        col("p").isin("tpch:c_mktsegment", "tpch:c_name"))
      val cust = Graft.table(s, d, "customer")
      val dropIds = cust.filter(col("c_custkey") % 97 === 0)
        .select(concat(lit("tpch:customer/"),
          col("c_custkey").cast(StringType)).as("s"))
      val seg = old.filter(col("p") === "tpch:c_mktsegment")
        .withColumn("o_str",
          when(col("o_str") === "BUILDING", "PROMO").otherwise(col("o_str")))
      val names = old.filter(col("p") === "tpch:c_name")
        .join(dropIds, Seq("s"), "left_anti")
      val vips = cust.filter(col("c_acctbal") > 9900)
        .select(lit("instance").as("g"),
          concat(lit("tpch:customer/"),
            col("c_custkey").cast(StringType)).as("s"),
          lit("tpch:c_flag").as("p"), lit("l").as("o_kind"),
          lit(null).cast(StringType).as("o_iri"),
          lit("xsd:string").as("o_typ"), lit("vip").as("o_str"),
          lit(null).cast(DoubleType).as("o_dbl"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(TimestampType).as("o_ts"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_lang"),
          lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
      val neu = seg.unionByName(names).unionByName(vips)
      graft.docs.Diff.patchView(graft.docs.Diff.diffTriples(old, neu))
    }),

    "woql_read_doc" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(And(Seq(
        TriplePat(V("S"), Node("rdf:type"), Node("tpch:Region")),
        ReadDocQ(V("S"), "D"))))
        .select(col("S").getField("iri").as("s"), col("D").getField("str").as("doc"))
    }),

    // DEEP dot: one Dot walks a nested path ("meta.source") and
    // indexes arrays ("meta.tags.1"); proven alongside the equivalent
    // CHAINED two-Dot walk so both spellings bind identical values
    "woql_dot_deep" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val nested =
        """{"meta":{"source":"tpch","tags":["a","b","c"]},"kind":"region"}"""
      Compiler.run(And(Seq(
        TriplePat(V("S"), Node("rdf:type"), Node("tpch:Region")),
        ReadDocQ(V("S"), "D"),
        DotQ(V("D"), "r_name", "Name"),
        Eq(V("J"), Str(nested)),
        DotQ(V("J"), "meta.source", "Src"),
        DotQ(V("J"), "meta.tags.1", "Tag"),
        DotQ(V("J"), "meta", "M"),
        DotQ(V("M"), "source", "Src2"))))
        .select(col("S").getField("iri").as("s"),
          col("Name").getField("str").as("r_name"),
          col("Src").getField("str").as("src"),
          col("Tag").getField("str").as("tag"),
          col("Src2").getField("str").as("src2"))
    }),

    // WOQL JSON wire format → compile → run (reference's query transport)
    "woql_json_parse" -> ((s, d) => {
      val json =
        """{"@type":"Select","variables":["Name","Bal"],"query":{"@type":"And","and":[
          |{"@type":"Triple","subject":{"variable":"C"},"predicate":{"node":"rdf:type"},"object":{"node":"tpch:Customer"}},
          |{"@type":"Triple","subject":{"variable":"C"},"predicate":{"node":"tpch:c_nationkey"},"object":{"variable":"N"}},
          |{"@type":"Triple","subject":{"variable":"N"},"predicate":{"node":"tpch:n_name"},"object":{"data":{"@type":"xsd:string","@value":"NATION_7"}}},
          |{"@type":"Triple","subject":{"variable":"C"},"predicate":{"node":"tpch:c_acctbal"},"object":{"variable":"Bal"}},
          |{"@type":"Greater","left":{"variable":"Bal"},"right":{"data":{"@type":"xsd:decimal","@value":500.0}}},
          |{"@type":"Triple","subject":{"variable":"C"},"predicate":{"node":"tpch:c_name"},"object":{"variable":"Name"}}
          |]}}""".stripMargin
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(JsonWoql.parse(json))
        .select(col("Name").getField("str").as("c_name"),
          col("Bal").getField("dbl").as("c_acctbal"))
    }),

    // class frame from the schema graph: own + inherited (via subclass
    // closure) property declarations (§2.8 frames; core/query/frame.pl)
    "woql_frame" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val schema = ctx.triples.filter(col("g") === "schema")
      graft.docs.Frames.classFrame(schema, ctx.subclass, "tpch:Customer")
        .select(col("property"), col("range").as("rng"),
          col("maxCard").as("max_card"))
    }),

    // commit-time validation, violation-producing: declare
    // tpch:c_mktsegment as a graft:unique key (it is not one) — the
    // validator must report every shared segment value (§2.8)
    "woql_validate_unique" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      import s.implicits._
      val schema = Seq(("tpch:c_mktsegment", true)).toDF("s", "o_bool")
        .select(col("s"), lit("graft:unique").as("p"), col("o_bool"),
          lit(null).cast(StringType).as("o_iri"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(StringType).as("o_str"))
      val c = graft.storage.Validator.constraintsFrom(schema)
      val slice = ctx.triples
        .filter(col("g") === "instance" && col("p") === "tpch:c_mktsegment")
      graft.storage.Validator.uniqueViolations(slice, slice, c)
    }),

    // cardinality check: graft:maxCard 0 on tpch:r_name → every region
    // violates with cnt 1 (deterministic violation set)
    "woql_validate_card" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      import s.implicits._
      val schema = Seq(("tpch:r_name", 0L)).toDF("s", "o_lng")
        .select(col("s"), lit("graft:maxCard").as("p"), col("o_lng"),
          lit(null).cast(StringType).as("o_iri"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_str"))
      val c = graft.storage.Validator.constraintsFrom(schema)
      val slice = ctx.triples
        .filter(col("g") === "instance" && col("p") === "tpch:r_name")
      graft.storage.Validator.cardinalityViolations(slice, slice, c)
    }),

    // v10 type-family validation ([ref:core/document/schema.pl]):
    // Optional (card ≤ 1), Set (no duplicate members), Array
    // (graft:idx contiguous 0..n-1) declarations enforced over a
    // crafted delta built from the nation table — doc:capital gives
    // every region 5 values (Optional violations), doc:initial
    // duplicates first letters inside most regions (Set), doc:member
    // indexes elements by raw nationkey (non-contiguous per region —
    // Array violations) while doc:memberok indexes by dense rank
    // (contiguous — MUST yield no rows, the no-overfire arm)
    "woql_validate_family" -> ((s, d) => {
      import s.implicits._
      val nation = s.read.parquet(s"$d/nation.parquet")
      def eav(src: DataFrame, subj: Column, p: String,
              iri: Column = lit(null).cast(StringType),
              str: Column = lit(null).cast(StringType),
              lng: Column = lit(null).cast(LongType)) =
        src.select(lit("instance").as("g"), subj.as("s"), lit(p).as("p"),
          when(iri.isNotNull, "i").otherwise("l").as("o_kind"),
          iri.as("o_iri"),
          when(iri.isNotNull, lit(null).cast(StringType))
            .when(str.isNotNull, "xsd:string").otherwise("xsd:integer").as("o_typ"),
          str.as("o_str"), lit(null).cast(DoubleType).as("o_dbl"),
          lng.as("o_lng"), lit(null).cast(TimestampType).as("o_ts"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_lang"),
          lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
      val subj = concat(lit("fam:r"), col("n_regionkey").cast(StringType))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("n_regionkey").orderBy("n_nationkey")
      val ranked = nation.withColumn("ix", row_number().over(w) - 1)
      val delta = eav(nation, subj, "doc:capital", str = col("n_name"))
        .unionByName(eav(nation, subj, "doc:initial",
          str = substring(col("n_name"), 1, 1)))
        .unionByName(eav(nation, subj, "doc:member",
          iri = concat(lit("fam:el"), col("n_nationkey").cast(StringType))))
        .unionByName(eav(nation,
          concat(lit("fam:el"), col("n_nationkey").cast(StringType)),
          "graft:idx", lng = col("n_nationkey").cast(LongType)))
        .unionByName(eav(nation, subj, "doc:memberok",
          iri = concat(lit("fam:ok"), col("n_nationkey").cast(StringType))))
        .unionByName(eav(ranked,
          concat(lit("fam:ok"), col("n_nationkey").cast(StringType)),
          "graft:idx", lng = col("ix").cast(LongType)))
      val schema = Seq(("doc:capital", "Optional"), ("doc:initial", "Set"),
          ("doc:member", "Array"), ("doc:memberok", "Array"))
        .toDF("s", "o_str")
        .select(col("s"), lit("graft:family").as("p"), col("o_str"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(StringType).as("o_iri"),
          lit(null).cast(BooleanType).as("o_bool"))
      val c = graft.storage.Validator.constraintsFrom(schema)
      graft.storage.Validator.familyViolations(delta, delta, c)
        .orderBy(col("s"), col("p"))
    }),

    // rdf:List document round trip ([ref:core/document/json.pl] list
    // handling): a turtle COLLECTION (blank-node cons cells, outside
    // the document's subject prefix) reassembles to a JSON array in
    // order; re-inserting that array as a List field emits prefix-
    // owned cons cells that read back identically and satisfy the
    // List family shape check
    "doc_list_roundtrip" -> ((s, d) => {
      import s.implicits._
      import org.json4s._
      val ttl =
        """@prefix ex: <http://ex.org/> .
          |ex:doc1 ex:name 'listdoc' ;
          |  ex:tags ("alpha" "beta" "gamma" "delta") .""".stripMargin
      val g = graft.sources.Turtle.load(s, ttl)
      val j = graft.docs.Documents.read(g, "http://ex.org/doc1")
      val tags = (j \ "//ex.org/tags") match {
        case JArray(xs) => xs
        case other => sys.error(s"tags did not reassemble as array: $other")
      }
      val obj = JObject(List("name" -> (j \ "//ex.org/name"), "tags" -> JArray(tags)))
      val rows2 = graft.docs.Documents.expand("RT", "doc:RT/x", obj,
        listFields = Set("tags"))
      val g2 = s.createDataFrame(
        s.sparkContext.parallelize(rows2, 1), graft.storage.Eav.schema)
      val j2 = graft.docs.Documents.read(g2, "doc:RT/x")
      require((j2 \ "tags") == JArray(tags),
        s"re-inserted list reads differently: ${j2 \ "tags"} vs $tags")
      val famSchema = Seq(("doc:tags", "List")).toDF("s", "o_str")
        .select(col("s"), lit("graft:family").as("p"), col("o_str"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(StringType).as("o_iri"),
          lit(null).cast(BooleanType).as("o_bool"))
      val famOk = graft.storage.Validator.familyViolations(
        g2, g2, graft.storage.Validator.constraintsFrom(famSchema))
      require(famOk.isEmpty, "re-inserted cons chain violates List shape")
      tags.zipWithIndex.map {
        case (JString(t), i) => (i.toLong, t)
        case (other, i) => sys.error(s"non-string tag at $i: $other")
      }.toDF("pos", "tag").orderBy(col("pos"))
    }),

    // GraphQL surface driven end-to-end: filter + orderBy + limit + a
    // link traversal parse into the SAME WOQL engine (server/GraphQL
    // compiles to the WOQL AST — no second execution path); the oracle
    // replays the query relationally. c_name joins the sort as a
    // unique tiebreak so the LIMIT boundary is deterministic.
    "ext_graphql" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Customer(filter: {c_mktsegment: {eq: "BUILDING"},
          |                    c_acctbal: {gt: 9000.0}},
          |           orderBy: {c_acctbal: DESC, c_name: ASC},
          |           limit: 10) {
          |    c_name c_acctbal c_nationkey { n_name } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("c_name").getField("str").as("c_name"),
        col("c_acctbal").getField("dbl").as("c_acctbal"),
        col("c_nationkey_n_name").getField("str").as("nation"))
    }),

    // GraphQL advanced surface: _or/_not combinators (with an
    // OVERLAPPING _or pair — NATION_13 matches both branches, so the
    // frame-wide dedup is load-bearing), regex + startsWith + ne ops,
    // _id projection, a forward link and a BACK-LINK traversal
    // (customers of each nation) with its own filter — all compiled
    // onto the one WOQL engine and replayed relationally
    "ext_graphql_adv" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Nation(filter: {_or: [{n_name: {regex: "NATION_[0-9]?3$"}},
          |                        {n_name: {startsWith: "NATION_1"}}],
          |                  _not: {n_name: {eq: "NATION_19"}}}) {
          |    _id
          |    n_name
          |    n_regionkey { r_name }
          |    _c_nationkey_of_Customer(filter: {c_acctbal: {ge: 9900.0},
          |                                      c_mktsegment: {ne: "BUILDING"}}) {
          |      c_name c_acctbal } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("_id").getField("iri").as("id"),
        col("n_name").getField("str").as("n_name"),
        col("n_regionkey_r_name").getField("str").as("r_name"),
        col("_c_nationkey_of_Customer_c_name").getField("str").as("c_name"),
        col("_c_nationkey_of_Customer_c_acctbal").getField("dbl").as("c_acctbal"))
    }),

    // GraphQL PATH argument (reference v10 GraphQL regular-path
    // traversal): from a filtered Lineitem root set, traverse
    // (l_orderkey|o_custkey)+ — a PLUS over an alternation — and keep
    // targets that have c_name (the selection binding narrows the
    // mixed-type reachable set to customers). Compiles onto the same
    // path engine as WOQL path(); per lineitem exactly its order's
    // customer survives.
    "ext_graphql_path" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Lineitem(filter: {l_quantity: {eq: 50.0}, l_returnflag: {eq: "R"}}) {
          |    l_linenumber
          |    reached(path: "(l_orderkey|o_custkey)+") { c_name } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("l_linenumber").getField("lng").as("l_linenumber"),
        col("reached_c_name").getField("str").as("c_name"))
    }),

    // GraphQL INTROSPECTION (read-only by design, like the reference —
    // document mutation goes through the document API): __schema lists
    // the schema graph's classes, __type a class's frame with range +
    // cardinality, both prefix-stripped to query-form names
    "ext_graphql_introspect" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      graft.server.GraphQL.run("{ __schema { types { name } } }")._2
    }),
    "ext_graphql_type" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      graft.server.GraphQL.run(
        """{ __type(name: "Customer") { fields { name type max_card } } }""")._2
    }),

    // GraphQL deep traversal: lineitem → orders → customer, two link
    // hops, with an exact-equality filter on a DOUBLE field (struct
    // equality against the canonical value representation)
    "ext_graphql_deep" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Lineitem(filter: {l_quantity: {eq: 50.0}, l_returnflag: {eq: "R"}}) {
          |    l_linenumber
          |    l_orderkey { o_orderpriority o_custkey { c_name } } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("l_linenumber").getField("lng").as("l_linenumber"),
        col("l_orderkey_o_orderpriority").getField("str").as("o_orderpriority"),
        col("l_orderkey_o_custkey_c_name").getField("str").as("c_name"))
    }),

    // GraphQL _or over an OPTIONAL field: tpch:n_note exists only for
    // nations with n_nationkey % 7 == 3 (extra triples unioned into a
    // derived Ctx — the other 21 nations genuinely lack the predicate).
    // A nation lacking n_note must still match the OTHER branch; the
    // pre-round-8 hoisted binding made n_note implicitly required and
    // silently dropped every note-less NATION_1x from the result.
    "ext_graphql_optional" -> ((s, d) => {
      val base = Graft.ctx(s, d)
      val notes = graft.storage.Eav.encodeTable(
        Graft.table(s, d, "nation").filter(col("n_nationkey") % 7 === 3),
        concat(lit("tpch:nation/"), col("n_nationkey").cast(StringType)),
        "tpch:Nation",
        Seq(("tpch:n_note", graft.storage.Eav.PStr, lit("flagged"))))
        .filter(col("p") =!= "rdf:type") // type triples already in base
      implicit val ctx: Ctx = base.copy(
        triples = base.triples.unionByName(notes), graphKey = None)
      val q =
        """{ Nation(filter: {_or: [{n_note: {eq: "flagged"}},
          |                        {n_name: {startsWith: "NATION_1"}}]}) {
          |    n_nationkey n_name } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("n_nationkey").getField("lng").as("n_nationkey"),
        col("n_name").getField("str").as("n_name"))
    }),

    // GraphQL COUNT aggregation (reference v10 GraphQL `_count` on
    // collection queries): the filter uses an OVERLAPPING _or pair —
    // BUILDING customers with acctbal > 9000 match both branches — so
    // the distinct-documents-then-count order is load-bearing; a
    // count over raw _or derivations would double-count the overlap.
    // Compiled onto the WOQL CountQ aggregate: one partial-aggregated
    // count over the filtered class scan, no page fetch.
    "ext_graphql_count" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Customer(filter: {_or: [{c_mktsegment: {eq: "BUILDING"}},
          |                          {c_acctbal: {gt: 9000.0}}]}) {
          |    _count } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("_count").getField("lng").as("n"))
    }),

    // GraphQL PER-LINK count: back-link `{ _count }` compiles to a
    // GroupCount conjunct — customers counted per nation under the
    // link filter, joined back so the parent's row-level fields
    // survive (one aggregate + one broadcast-able join, never a
    // fetch-and-count page per parent)
    "ext_graphql_count_links" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Nation(filter: {n_name: {startsWith: "NATION_1"}}) {
          |    n_name
          |    _c_nationkey_of_Customer(filter: {c_acctbal: {gt: 5000.0}}) {
          |      _count } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("n_name").getField("str").as("n_name"),
        col("_c_nationkey_of_Customer__count").getField("lng").as("n_customers"))
    }),

    // GraphQL PER-LINK numeric aggregates: _count/_min/_max in ONE
    // GroupStats conjunct — a single per-parent aggregate + a single
    // broadcast-able join back (never a fetch-and-fold page per
    // parent); min/max are order-independent value picks, so the
    // doubles replay exactly
    "ext_graphql_agg_links" -> ((s, d) => {
      implicit val ctx: Ctx = Graft.ctx(s, d)
      val q =
        """{ Nation(filter: {n_name: {startsWith: "NATION_1"}}) {
          |    n_name
          |    _c_nationkey_of_Customer(filter: {c_mktsegment: {eq: "BUILDING"}}) {
          |      _count
          |      _min(field: "c_acctbal")
          |      _max(field: "c_acctbal") } } }""".stripMargin
      val (_, df) = graft.server.GraphQL.run(q)
      df.select(col("n_name").getField("str").as("n_name"),
        col("_c_nationkey_of_Customer__count").getField("lng").as("n_customers"),
        col("_c_nationkey_of_Customer__min_c_acctbal").getField("dbl").as("min_bal"),
        col("_c_nationkey_of_Customer__max_c_acctbal").getField("dbl").as("max_bal"))
    }),

    // referential integrity (§2.8 validation; reference
    // validate_instance.pl dangling-reference check): a delta adding
    // ghost references (targets that exist nowhere as subjects) plus
    // valid references — only the ghosts must be reported, and only
    // for commit-touched subjects (incremental scope)
    "woql_validate_refs" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val inst = ctx.triples.filter(col("g") === "instance")
      val region = Graft.table(s, d, "region")
      val rIri = concat(lit("tpch:region/"), col("r_regionkey").cast(StringType))
      val ghosts = iriTriples(region.filter(col("r_regionkey") < 3), rIri,
        "tpch:r_ghost", concat(lit("tpch:ghost/"), col("r_regionkey").cast(StringType)))
      val valid = iriTriples(region, rIri,
        "tpch:r_sees", concat(lit("tpch:nation/"), col("r_regionkey").cast(StringType)))
      val delta = ghosts.unionByName(valid)
      val merged = inst.unionByName(delta)
      Validator.danglingRefs(merged, Validator.touched(merged, delta))
    }),

    // rdfs:domain check THROUGH the subclass closure: n_name misdeclared
    // with domain tpch:Region flags every nation; n_regionkey declared
    // with domain tpch:Entity (two closure hops above tpch:Nation) is
    // satisfied and must stay silent
    "woql_validate_domain" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val inst = ctx.triples.filter(col("g") === "instance")
      val c = Validator.constraintsFrom(schemaRows(s, iri = Seq(
        ("tpch:n_name", "rdfs:domain", "tpch:Region"),
        ("tpch:n_regionkey", "rdfs:domain", "tpch:Entity"))))
      val delta = inst.filter(col("p").isin("tpch:n_name", "tpch:n_regionkey"))
      Validator.domainViolations(inst, delta, c, ctx.subclass)
    }),

    // rdfs:range literal-type check: c_acctbal misdeclared xsd:string
    // (stored xsd:double) flags every customer; the correctly declared
    // c_mktsegment range stays silent
    "woql_validate_range" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val c = Validator.constraintsFrom(schemaRows(s, iri = Seq(
        ("tpch:c_acctbal", "rdfs:range", "xsd:string"),
        ("tpch:c_mktsegment", "rdfs:range", "xsd:string"))))
      val scope = ctx.triples.filter(col("g") === "instance" &&
        col("p").isin("tpch:c_acctbal", "tpch:c_mktsegment"))
      Validator.rangeViolations(scope, c)
    }),

    // graft:oneOf enum membership: restrict c_mktsegment to two allowed
    // values — every customer in another segment is a violation
    "woql_validate_enum" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val c = Validator.constraintsFrom(schemaRows(s, str = Seq(
        ("tpch:c_mktsegment", "graft:oneOf", "BUILDING"),
        ("tpch:c_mktsegment", "graft:oneOf", "AUTOMOBILE"))))
      val scope = ctx.triples.filter(col("g") === "instance" &&
        col("p") === "tpch:c_mktsegment")
      Validator.enumViolations(scope, c)
    }),

    // graft:subdocument ownership: declaring tpch:Nation a subdocument
    // class demands exactly one incoming reference per nation — the
    // customer+supplier fan-in makes every owner count deterministic
    "woql_validate_subdoc" -> ((s, d) => {
      val ctx = Graft.ctx(s, d)
      val inst = ctx.triples.filter(col("g") === "instance")
      val c = Validator.constraintsFrom(schemaRows(s, bool = Seq(
        ("tpch:Nation", "graft:subdocument", true))))
      val delta = inst.filter(col("p") === "rdf:type" &&
        col("o_iri") === "tpch:Nation")
      Validator.subdocViolations(inst, delta, c)
    }),

    // push to a second store (pack transport) then materialize THERE —
    // the clone/fetch/push/pull machinery end-to-end (§2.8)
    "woql_push_pull" -> ((s, d) => {
      val src = deltaStore(s, d)
      val dst = LayerStore.open(s, s"$cacheRoot/store_pull_${san(d)}")
      synchronized { if (dst.refs.isEmpty) src.push(dst, "main") }
      dst.materializeBranch("main").select(col("s"), col("o_str").as("o"))
    }),

    // distributed turtle DUMP → parse back → bindings (round-trips the
    // column-expression formatter, not just the loader)
    "turtle_dump" -> ((s, d) => {
      val regions = Graft.table(s, d, "region")
        .select(lit("instance").as("g"),
          concat(lit("tpch:region/"), col("r_regionkey").cast(StringType)).as("s"),
          lit("name").as("p"), lit("l").as("o_kind"),
          lit(null).cast(StringType).as("o_iri"), lit("xsd:string").as("o_typ"),
          col("r_name").as("o_str"), lit(null).cast(DoubleType).as("o_dbl"),
          lit(null).cast(LongType).as("o_lng"),
          lit(null).cast(TimestampType).as("o_ts"),
          lit(null).cast(BooleanType).as("o_bool"),
          lit(null).cast(StringType).as("o_lang"),
          lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
      val path = s"$cacheRoot/ttl_dump_${san(d)}"
      graft.sources.Turtle.dumpTo(regions, path)
      val text = s.read.text(path).collect().map(_.getString(0)).mkString("\n")
      graft.sources.Turtle.load(s, text)
        .select(col("s"), col("o_str").as("o"))
    }),

    // the same flagship-class query serialized in the PRE-v10 JSON-LD
    // wire format (indexed query lists, woql:-prefixed types, @value
    // wrappers) plus a v3 Eval — must hash-match the v10-parsed result
    // serializer round-trip through the REAL wire: write the flagship
    // AST to v10 JSON, re-parse, compile — must equal running the AST
    // directly (same oracle as woql_flagship/woql_json_parse)
    "woql_json_write" -> ((s, d) => {
      val ast = WoqlQueries.flagship
      val wire = graft.core.JsonWoqlWrite.write(ast)
      val reparsed = JsonWoql.parse(wire)
      require(reparsed == ast, "v10 JSON round-trip changed the AST")
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(reparsed)
        .select(col("Name").getField("str").as("c_name"),
          col("Bal").getField("dbl").as("c_acctbal"))
    }),

    // v3 serializer round-trip through the REAL pre-v10 wire: write the
    // flagship AST with JsonWoqlWriteV3, re-parse with the v3 reader,
    // compile — must equal direct compilation (same oracle as
    // woql_flagship/woql_json_write)
    "woql_json_v3_write" -> ((s, d) => {
      val ast = WoqlQueries.flagship
      val wire = graft.core.JsonWoqlWriteV3.write(ast)
      val reparsed = JsonWoqlV3.parse(wire)
      require(reparsed == ast, "v3 JSON round-trip changed the AST")
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(reparsed)
        .select(col("Name").getField("str").as("c_name"),
          col("Bal").getField("dbl").as("c_acctbal"))
    }),

    "woql_json_v3" -> ((s, d) => {
      def vr(n: String) =
        s"""{"@type":"woql:Variable","woql:variable_name":{"@value":"$n","@type":"xsd:string"}}"""
      def nd(i: String) = s"""{"@type":"woql:Node","woql:node":"$i"}"""
      def li(i: Int, q: String) =
        s"""{"@type":"woql:QueryListElement","woql:index":{"@value":$i},"woql:query":$q}"""
      def tp(sj: String, p: String, o: String) =
        s"""{"@type":"woql:Triple","woql:subject":$sj,"woql:predicate":$p,"woql:object":$o}"""
      def av(t: String) =
        s"""{"@type":"woql:ArithmeticValue","woql:arithmetic_value":$t}"""
      val nation7 =
        """{"@type":"woql:Datatype","woql:datatype":{"@value":"NATION_7","@type":"xsd:string"}}"""
      val json =
        s"""{"@type":"woql:Select","woql:variable_list":[
           |{"@type":"woql:VariableListElement","woql:index":{"@value":0},"woql:variable_name":{"@value":"Name","@type":"xsd:string"}},
           |{"@type":"woql:VariableListElement","woql:index":{"@value":1},"woql:variable_name":{"@value":"Bal","@type":"xsd:string"}},
           |{"@type":"woql:VariableListElement","woql:index":{"@value":2},"woql:variable_name":{"@value":"R","@type":"xsd:string"}}],
           |"woql:query":{"@type":"woql:And","woql:query_list":[
           |${li(0, tp(vr("C"), nd("rdf:type"), nd("tpch:Customer")))},
           |${li(1, tp(vr("C"), nd("tpch:c_nationkey"), vr("N")))},
           |${li(2, tp(vr("N"), nd("tpch:n_name"), nation7))},
           |${li(3, tp(vr("C"), nd("tpch:c_acctbal"), vr("Bal")))},
           |${li(4, s"""{"@type":"woql:Greater","woql:left":${vr("Bal")},"woql:right":{"@type":"woql:Datatype","woql:datatype":{"@value":500.0,"@type":"xsd:double"}}}""")},
           |${li(5, tp(vr("C"), nd("tpch:c_name"), vr("Name")))},
           |${li(6, s"""{"@type":"woql:Eval","woql:expression":{"@type":"woql:Plus","woql:first":${av(vr("Bal"))},"woql:second":${av("""{"@type":"woql:Datatype","woql:datatype":{"@value":10,"@type":"xsd:integer"}}""")}},"woql:result":${vr("R")}}""")}
           |]}}""".stripMargin
      implicit val ctx: Ctx = Graft.ctx(s, d)
      Compiler.run(JsonWoqlV3.parse(json))
        .select(col("Name").getField("str").as("c_name"),
          col("Bal").getField("dbl").as("c_acctbal"),
          col("R").getField("dbl").as("r"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ext_http_woql" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,
    "ext_graphql" ->
      """SELECT c_name, c_acctbal, n_name AS nation
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000.0
        | ORDER BY c_acctbal DESC, c_name LIMIT 10""".stripMargin,
    "ext_graphql_adv" ->
      """SELECT 'tpch:nation/'||n_nationkey AS id, n_name, r_name,
        | c_name, c_acctbal
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | JOIN customer ON c_nationkey = n_nationkey
        | WHERE (regexp_matches(n_name, 'NATION_[0-9]?3$')
        |        OR starts_with(n_name, 'NATION_1'))
        | AND NOT n_name = 'NATION_19'
        | AND c_acctbal >= 9900.0 AND c_mktsegment <> 'BUILDING'""".stripMargin,
    // branch-1 membership (n_note = 'flagged') is exactly the %7==3
    // nations by construction of the derived Ctx in the engine query;
    // note-less nations must still reach the result via branch 2.
    "ext_graphql_optional" ->
      """SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        | FROM nation
        | WHERE n_nationkey % 7 = 3 OR starts_with(n_name, 'NATION_1')""".stripMargin,
    // reachable-through-(l_orderkey|o_custkey)+ targets with c_name
    // are exactly each filtered lineitem's order's customer
    "ext_graphql_path" ->
      """SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber, c_name
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE l_quantity = 50.0 AND l_returnflag = 'R'""".stripMargin,
    // the declared schema classes (rdfs:domain owners + subClassOf
    // endpoints), short-form
    "ext_graphql_introspect" ->
      """SELECT * FROM (VALUES ('Agent'),('Customer'),('Entity'),
        | ('Lineitem'),('Nation'),('Orders'),('Part'),('Region'),
        | ('Supplier')) AS t(name)""".stripMargin,
    // Customer frame: own properties + rdfs:label inherited from
    // Entity via Agent, with ranges and cardinality bounds
    "ext_graphql_type" ->
      """SELECT * FROM (VALUES
        | ('c_acctbal', 'xsd:double', CAST(1 AS BIGINT)),
        | ('c_mktsegment', 'xsd:string', CAST(NULL AS BIGINT)),
        | ('c_name', 'xsd:string', CAST(1 AS BIGINT)),
        | ('c_nationkey', 'Nation', CAST(NULL AS BIGINT)),
        | ('rdfs:label', 'xsd:string', CAST(NULL AS BIGINT)))
        | AS t(name, type, max_card)""".stripMargin,
    "ext_graphql_deep" ->
      """SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | o_orderpriority, c_name
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE l_quantity = 50.0 AND l_returnflag = 'R'""".stripMargin,
    // distinct matching documents, not _or derivations: plain OR in
    // SQL is already boolean per row
    "ext_graphql_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        | WHERE c_mktsegment = 'BUILDING' OR c_acctbal > 9000.0""".stripMargin,
    // inner semantics: a nation with zero matching customers is
    // absent (SQL inner join + GROUP BY does the same)
    "ext_graphql_count_links" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
        | FROM nation JOIN customer ON c_nationkey = n_nationkey
        | WHERE starts_with(n_name, 'NATION_1') AND c_acctbal > 5000.0
        | GROUP BY n_name""".stripMargin,
    // per-link aggregates: inner-join + GROUP BY restates the single
    // GroupStats aggregate; min/max are value picks (exact doubles)
    "ext_graphql_agg_links" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        | min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        | FROM nation JOIN customer ON c_nationkey = n_nationkey
        | WHERE starts_with(n_name, 'NATION_1') AND c_mktsegment = 'BUILDING'
        | GROUP BY n_name""".stripMargin,
    // per-parent top-k replayed as a row_number window; the engine's
    // tiebreak is the customer IRI ascending
    "ext_graphql_topk_links" ->
      """SELECT n_name, c_name, c_acctbal FROM (
        | SELECT n_name, c_name, c_acctbal,
        |   row_number() OVER (PARTITION BY n_nationkey
        |     ORDER BY c_acctbal DESC, 'tpch:customer/'||c_custkey) AS rk
        | FROM nation JOIN customer ON c_nationkey = n_nationkey
        | WHERE starts_with(n_name, 'NATION_1')
        |   AND c_mktsegment = 'BUILDING') t
        | WHERE rk <= 3""".stripMargin,

    // resolved rebase: dev head = main's state (nations minus the two
    // main-side removes) + the replayed marker; the "ours"-skipped
    // remove of nation 5 must NOT apply
    "woql_rebase_res" ->
      """SELECT n_name AS name FROM nation
        | WHERE n_nationkey < 10 AND n_nationkey NOT IN (3, 4)
        | UNION ALL SELECT 'REBASED' AS name""".stripMargin,
    // independent re-walk of the engine-written commit catalog: head
    // ref → parent chain, newest first (recursive CTE over the same
    // parquet files the store maintains)
    "ext_http_log" ->
      (s"""WITH RECURSIVE walk(commit_id, parent, message, rank) AS (
        | SELECT c.commit_id, c.parent, c.message, CAST(1 AS BIGINT)
        |  FROM read_parquet('$cacheRoot/store_http_fixed/_catalog/commits/*.parquet') c
        |  JOIN read_parquet('$cacheRoot/store_http_fixed/_catalog/refs/*.parquet') r
        |    ON r.ref = 'main' AND r.commit_id = c.commit_id
        | UNION ALL
        | SELECT c.commit_id, c.parent, c.message, w.rank + 1
        |  FROM read_parquet('$cacheRoot/store_http_fixed/_catalog/commits/*.parquet') c
        |  JOIN walk w ON c.commit_id = w.parent)
        | SELECT rank, commit_id, parent, message FROM walk""".stripMargin),
    // closed-form from the fixed store: mid = {0,1,2}, main head =
    // {1→V2, 2, 10, 11, 12} ⇒ one delete, one swap, three inserts
    // independent replay of the family checks from the nation parquet:
    // Optional = >1 value per region; Set = regions with duplicated
    // first letters; Array = nationkey indexes fail 0..n-1 contiguity;
    // the rank-indexed memberok arm contributes no rows by the same
    // HAVING (proving the check does not overfire)
    "woql_validate_family" ->
      """WITH n AS (SELECT n_regionkey AS r, n_nationkey AS k, n_name FROM nation),
        | opt AS (SELECT 'fam:r' || r AS s, 'doc:capital' AS p,
        |   'Optional' AS fam, CAST(count(*) AS BIGINT) AS n
        |  FROM n GROUP BY r HAVING count(*) > 1),
        | ini AS (SELECT 'fam:r' || r AS s, 'doc:initial' AS p,
        |   'Set' AS fam, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT r, substr(n_name, 1, 1) AS v FROM n
        |        GROUP BY r, v HAVING count(*) > 1) GROUP BY r),
        | arr AS (SELECT 'fam:r' || r AS s, 'doc:member' AS p,
        |   'Array' AS fam, CAST(count(*) AS BIGINT) AS n
        |  FROM n GROUP BY r
        |  HAVING count(DISTINCT k) <> count(*) OR min(k) <> 0
        |      OR max(k) <> count(*) - 1),
        | arrok AS (SELECT 'fam:r' || r AS s, 'doc:memberok' AS p,
        |   'Array' AS fam, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT r, row_number() OVER (PARTITION BY r ORDER BY k) - 1 AS ix
        |        FROM n) GROUP BY r
        |  HAVING count(DISTINCT ix) <> count(*) OR min(ix) <> 0
        |      OR max(ix) <> count(*) - 1)
        | SELECT s, p, fam, n FROM (SELECT * FROM opt UNION ALL
        |   SELECT * FROM ini UNION ALL SELECT * FROM arr UNION ALL
        |   SELECT * FROM arrok) ORDER BY s, p""".stripMargin,

    // closed-form: the fixed turtle collection's members in order
    "doc_list_roundtrip" ->
      """SELECT * FROM (VALUES
        | (CAST(0 AS BIGINT),'alpha'), (CAST(1 AS BIGINT),'beta'),
        | (CAST(2 AS BIGINT),'gamma'), (CAST(3 AS BIGINT),'delta'))
        | AS t(pos, tag) ORDER BY pos""".stripMargin,

    // the template semantics replayed relationally: ids are the
    // LexicalKey form 'doc:Nation/' || urlencode(n_name) (space → '+';
    // nation names are otherwise URL-safe)
    "doc_query_template" ->
      """WITH n AS (SELECT 'doc:Nation/' || replace(n_name, ' ', '+') AS s,
        |   n_nationkey AS nk, n_regionkey AS rk, r_name
        | FROM nation JOIN region ON n_regionkey = r_regionkey)
        | SELECT qcase, s FROM (
        |  SELECT 'nested' AS qcase, s FROM n WHERE r_name = 'ASIA'
        |  UNION ALL
        |  SELECT 'conj', s FROM n WHERE nk % 2 = 0 AND rk = 0
        |  UNION ALL
        |  SELECT 'int', s FROM n WHERE nk = 7
        |  UNION ALL
        |  SELECT 'empty', s FROM n)
        | ORDER BY qcase, s""".stripMargin,

    // closed-form from the transfer scenario's construction: base
    // {0,1,2} − 0 + 3 (A), + 4 (pushed from B), + 5 (pulled from A)
    "ext_http_transfer" ->
      """SELECT * FROM (VALUES
        | ('tpch:nation/1','XFER_1'), ('tpch:nation/2','XFER_2'),
        | ('tpch:nation/3','XFER_3'), ('tpch:nation/4','XFER_4'),
        | ('tpch:nation/5','XFER_5')) AS t(s, n_name) ORDER BY s""".stripMargin,

    "ext_http_diff" ->
      """SELECT * FROM (VALUES
        | ('tpch:nation/0','tpch:n_name','delete','HTTP_0',CAST(NULL AS VARCHAR)),
        | ('tpch:nation/1','tpch:n_name','swap','HTTP_1','HTTP_1_V2'),
        | ('tpch:nation/10','tpch:n_name','insert',CAST(NULL AS VARCHAR),'HTTP_10'),
        | ('tpch:nation/11','tpch:n_name','insert',CAST(NULL AS VARCHAR),'HTTP_11'),
        | ('tpch:nation/12','tpch:n_name','insert',CAST(NULL AS VARCHAR),'HTTP_12'))
        | AS t(subject, property, op, old_v, new_v)""".stripMargin,
    // independent re-walk + re-count: chain order from the commit
    // catalog, per-commit added/removed for the one subject re-counted
    // from the delta-layer parquet files themselves
    "ext_http_history" ->
      (s"""WITH RECURSIVE walk(commit_id, parent, message, rank) AS (
        | SELECT c.commit_id, c.parent, c.message, CAST(1 AS BIGINT)
        |  FROM read_parquet('$cacheRoot/store_http_fixed/_catalog/commits/*.parquet') c
        |  JOIN read_parquet('$cacheRoot/store_http_fixed/_catalog/refs/*.parquet') r
        |    ON r.ref = 'main' AND r.commit_id = c.commit_id
        | UNION ALL
        | SELECT c.commit_id, c.parent, c.message, w.rank + 1
        |  FROM read_parquet('$cacheRoot/store_http_fixed/_catalog/commits/*.parquet') c
        |  JOIN walk w ON c.commit_id = w.parent),
        | touches AS (
        |  SELECT regexp_extract(filename, 'layers/([^/]+)/', 1) AS commit_id,
        |    CAST(1 AS BIGINT) AS add_n, CAST(0 AS BIGINT) AS rem_n
        |  FROM read_parquet('$cacheRoot/store_http_fixed/layers/*/adds/*.parquet',
        |    filename=true) WHERE s = 'tpch:nation/1'
        |  UNION ALL
        |  SELECT regexp_extract(filename, 'layers/([^/]+)/', 1),
        |    CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  FROM read_parquet('$cacheRoot/store_http_fixed/layers/*/removes/*.parquet',
        |    filename=true) WHERE s = 'tpch:nation/1'),
        | agg AS (SELECT commit_id, sum(add_n) AS added, sum(rem_n) AS removed
        |  FROM touches GROUP BY 1)
        | SELECT CAST(row_number() OVER (ORDER BY w.rank) AS BIGINT) AS seq,
        |  w.commit_id, w.message, CAST(a.added AS BIGINT) AS added,
        |  CAST(a.removed AS BIGINT) AS removed
        | FROM walk w JOIN agg a USING (commit_id)""".stripMargin),
    // re-measure the engine-written layer files byte-for-byte
    "woql_size" ->
      (s"""SELECT regexp_extract(filename, 'layers/([^/]+)/', 1) AS layer,
        | CAST(count(*) AS BIGINT) AS n_files,
        | CAST(sum(size) AS BIGINT) AS bytes
        | FROM read_blob('$cacheRoot/store_size_fixed/layers/**/*.parquet')
        | GROUP BY 1""".stripMargin),
    // invariants: 25 nation rows → 25 keys, all distinct, all UUID-v4
    "woql_random_key" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(count(*) AS BIGINT) AS n_uuid FROM nation""".stripMargin,
    "woql_added_triple" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS o FROM nation
        | WHERE n_nationkey >= 15""".stripMargin,
    "woql_removed_triple" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS o FROM nation
        | WHERE n_nationkey = 0""".stripMargin,
    "woql_materialized" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS o FROM nation
        | WHERE n_nationkey >= 1""".stripMargin,
    "woql_using_commit" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS now_name,
        | n_name AS then_name FROM nation
        | WHERE n_nationkey BETWEEN 1 AND 14""".stripMargin,
    // closed-form from the two fixed stores' construction: head ∩ aux
    "woql_using_db" ->
      """SELECT * FROM (VALUES
        | ('tpch:nation/1', 'HTTP_1_V2', 'AUX_1'),
        | ('tpch:nation/2', 'HTTP_2', 'AUX_2'))
        | AS t(s, name, aux_name)""".stripMargin,
    "woql_put_csv" ->
      "SELECT n_name FROM nation",
    "woql_with_graph" ->
      "SELECT 'r/'||r_regionkey AS s, r_name AS o FROM region",
    "woql_triple_count" ->
      """SELECT (SELECT count(*)*3 FROM region) + (SELECT count(*)*4 FROM nation)
        | + (SELECT count(*)*6 FROM customer) + (SELECT count(*)*5 FROM supplier)
        | + (SELECT count(*)*7 FROM part) + (SELECT count(*)*8 FROM orders)
        | + (SELECT count(*)*12 FROM lineitem) AS n""".stripMargin,
    "woql_update_staged" ->
      """SELECT 'tpch:customer/'||c_custkey AS s, 'building' AS tag
        | FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "woql_wire_update" ->
      """SELECT 'tpch:customer/'||c_custkey AS s, 'building' AS tag
        | FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "woql_into_schema" ->
      """SELECT 'tpch:region/'||r_regionkey AS s, r_name AS comment
        | FROM region""".stripMargin,
    "woql_migrate" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS label,
        | CAST(n_nationkey AS BIGINT) AS nk, 'xsd:integer' AS nk_type
        | FROM nation""".stripMargin,
    "doc_insert" ->
      "SELECT 'doc:Nation/'||n_name AS s, n_name AS name FROM nation",
    // closed form: the framing fold boundaries are deterministic
    // subject ids (`<root>/geo`, `<root>/geo/detail`), the unfolded
    // leaves replay from the nation ⋈ region join
    "doc_frame_opts" ->
      """SELECT 'doc:Nation/'||n_name AS s,
        | CAST(n_regionkey AS BIGINT) AS rk, r_name AS region_name,
        | 'doc:Nation/'||n_name||'/geo/detail' AS detail_ref,
        | 'doc:Nation/'||n_name||'/geo' AS geo_ref
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | WHERE n_nationkey < 8""".stripMargin,
    "doc_update" ->
      """SELECT 'doc:Nation/'||n_name AS s, 'doc:n_name' AS p, n_name AS v
        | FROM nation WHERE n_name != 'NATION_1'
        | UNION ALL
        | SELECT 'doc:Nation/'||n_name, 'doc:n_nationkey',
        |   CAST(n_nationkey AS VARCHAR) FROM nation
        | WHERE n_name NOT IN ('NATION_0','NATION_1')
        | UNION ALL
        | SELECT 'doc:Nation/NATION_0', 'doc:flag', 'updated'""".stripMargin,
    "doc_diff" ->
      """SELECT 'tpch:customer/'||c_custkey AS s, 'tpch:c_mktsegment' AS p,
        |   'swap' AS op, c_mktsegment AS old_v, 'PROMO' AS new_v
        | FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION ALL
        | SELECT 'tpch:customer/'||c_custkey, 'tpch:c_name', 'delete',
        |   c_name, NULL
        | FROM customer WHERE c_custkey % 97 = 0
        | UNION ALL
        | SELECT 'tpch:customer/'||c_custkey, 'tpch:c_flag', 'insert',
        |   NULL, 'vip'
        | FROM customer WHERE c_acctbal > 9900""".stripMargin,

    "woql_delete_doc" ->
      """SELECT 'doc:Nation/'||n_name AS s, n_name AS name FROM nation
        | WHERE n_nationkey >= 10""".stripMargin,
    "turtle_load" ->
      "SELECT 'tpch:region/'||r_regionkey AS s, r_name AS o FROM region",
    "woql_read_doc" ->
      """SELECT 'tpch:region/'||r_regionkey AS s,
        | '{"r_name":"'||r_name||'","r_regionkey":"'||r_regionkey||'"}' AS doc
        | FROM region""".stripMargin,
    // closed-form: the deep-path and chained-dot walks of the FIXED
    // nested JSON literal, alongside the real per-region field
    "woql_dot_deep" ->
      """SELECT 'tpch:region/'||r_regionkey AS s, r_name,
        | 'tpch' AS src, 'b' AS tag, 'tpch' AS src2
        | FROM region""".stripMargin,
    "woql_json_parse" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,
    "woql_json_write" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,
    "woql_json_v3_write" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,
    "woql_json_v3" ->
      """SELECT c_name, c_acctbal, c_acctbal + 10 AS r FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,
    // the declared schema: own tpch:c_* properties + rdfs:label inherited
    // from tpch:Entity two levels up the class hierarchy
    "woql_frame" ->
      """SELECT * FROM (VALUES
        | ('tpch:c_name', 'xsd:string', CAST(1 AS BIGINT)),
        | ('tpch:c_acctbal', 'xsd:double', CAST(1 AS BIGINT)),
        | ('tpch:c_mktsegment', 'xsd:string', CAST(NULL AS BIGINT)),
        | ('tpch:c_nationkey', 'tpch:Nation', CAST(NULL AS BIGINT)),
        | ('rdfs:label', 'xsd:string', CAST(NULL AS BIGINT)))
        | AS t(property, rng, max_card)""".stripMargin,
    "woql_validate_unique" ->
      """SELECT 'tpch:c_mktsegment' AS p, c_mktsegment AS v,
        | count(DISTINCT c_custkey) AS cnt FROM customer
        | GROUP BY 2 HAVING count(DISTINCT c_custkey) > 1""".stripMargin,
    "woql_validate_card" ->
      """SELECT 'tpch:region/'||r_regionkey AS s, 'tpch:r_name' AS p,
        | CAST(1 AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS n FROM region""".stripMargin,
    "woql_validate_refs" ->
      """SELECT 'tpch:region/'||r_regionkey AS s, 'tpch:r_ghost' AS p,
        | 'tpch:ghost/'||r_regionkey AS o_iri
        | FROM region WHERE r_regionkey < 3""".stripMargin,
    "woql_validate_domain" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, 'tpch:n_name' AS p,
        | 'tpch:Region' AS cls FROM nation""".stripMargin,
    "woql_validate_range" ->
      """SELECT 'tpch:customer/'||c_custkey AS s, 'tpch:c_acctbal' AS p,
        | 'xsd:double' AS o_typ, 'xsd:string' AS typ FROM customer""".stripMargin,
    "woql_validate_enum" ->
      """SELECT 'tpch:customer/'||c_custkey AS s, 'tpch:c_mktsegment' AS p,
        | c_mktsegment AS o_str FROM customer
        | WHERE c_mktsegment NOT IN ('BUILDING','AUTOMOBILE')""".stripMargin,
    "woql_validate_subdoc" ->
      """WITH own AS (SELECT c_nationkey AS k FROM customer
        |   UNION ALL SELECT s_nationkey FROM supplier)
        | SELECT 'tpch:nation/'||n_nationkey AS s,
        |  CAST(count(k) AS BIGINT) AS owners
        | FROM nation LEFT JOIN own ON k = n_nationkey
        | GROUP BY n_nationkey HAVING count(k) != 1""".stripMargin,
    "woql_push_pull" ->
      """SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS o FROM nation
        | WHERE n_nationkey >= 1""".stripMargin,
    "turtle_dump" ->
      "SELECT 'tpch:region/'||r_regionkey AS s, r_name AS o FROM region"
  )
}
