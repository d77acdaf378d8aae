package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** WOQL update staging (SURVEY §2.8: `insert/delete` per solution of the
  * surrounding query; reference: woql_compile.pl AddTriple/DeleteTriple +
  * the transaction builder). The query's binding frame drives triple
  * templates; staged sets then flow through the commit protocol
  * (validation gate → new layer → ref advance). */
object Updates {

  /** Project a triple template over a binding frame into EAV rows. */
  private def project(df: DataFrame, vars: Set[String],
                      t: (Term, Term, Term), graph: String): DataFrame = {
    def valOf(term: Term): Column = term match {
      case V(n) if vars(n) => col(n)
      case V(n) => throw new IllegalArgumentException(s"unbound var $n in template")
      case other => Vals.ofTerm(other)
    }
    val (s, p, o) = t
    val sv = valOf(s); val pv = valOf(p); val ov = valOf(o)
    df.select(
      lit(graph).as("g"),
      sv.getField("iri").as("s"),
      pv.getField("iri").as("p"),
      ov.getField("k").as("o_kind"),
      ov.getField("iri").as("o_iri"),
      ov.getField("typ").as("o_typ"),
      ov.getField("str").as("o_str"),
      ov.getField("dbl").as("o_dbl"),
      ov.getField("lng").as("o_lng"),
      ov.getField("ts").as("o_ts"),
      ov.getField("bool").as("o_bool"),
      ov.getField("lang").as("o_lang"),
      ov.getField("dec").as("o_dec"))
  }

  /** Run `q`, stage one add/remove set per template per solution.
    * Solutions with an unbound (null) template slot are skipped — this is
    * what makes `when(Cond, Insert)` a conditional update: rows Cond
    * rejected carry null Then-vars and stage nothing. `graph` is the
    * WOQL `into` write-graph scope ([ref:core/query/woql_compile.pl]
    * into clauses): staged rows land in that graph — "schema" writes
    * schema triples, the default is the instance graph. */
  def stage(q: Woql, inserts: Seq[(Term, Term, Term)],
            deletes: Seq[(Term, Term, Term)] = Nil,
            graph: String = "instance")(
      implicit ctx: Ctx): (DataFrame, DataFrame) = {
    val bf = Compiler.compile(q, Compiler.unit(ctx))
    val none = ctx.spark.createDataFrame(
      ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Eav.schema)
    def build(ts: Seq[(Term, Term, Term)]): DataFrame =
      if (ts.isEmpty) none
      else ts.map(project(bf.df, bf.vars, _, graph)).reduce(_ unionByName _)
        .where(col("s").isNotNull && col("p").isNotNull && col("o_kind").isNotNull)
        .distinct()
    (build(inserts), build(deletes))
  }

  /** Full commit protocol: stage → validate → layer → advance ref.
    * Returns Left(violations) if the validation gate fails. */
  def commitStaged(store: LayerStore, branch: String, q: Woql,
                   inserts: Seq[(Term, Term, Term)],
                   deletes: Seq[(Term, Term, Term)], message: String,
                   schema: DataFrame = null, subclass: DataFrame = null)(
      implicit ctx: Ctx): Either[Map[String, Long], String] = {
    val (adds, removes) = stage(q, inserts, deletes)
    if (schema != null) {
      val graph = store.refs.get(branch).map(store.materialize)
        .getOrElse(adds.limit(0))
      val results = Validator.validate(graph, adds, schema, subclass)
      val counts = results.map { case (k, v) => k -> v.count() }.filter(_._2 > 0)
      if (counts.nonEmpty) return Left(counts)
    }
    Right(store.commit(branch, adds, removes, message))
  }

  /** InsertDocument: stage document subgraphs from a bound JSON-string
    * variable, one document per query solution — parsing/expansion runs
    * distributed via Documents.insertAll (mapPartitions). */
  def stageDocs(q: Woql, jsonVar: String, docType: String,
                key: graft.docs.Documents.KeyStrategy)(
      implicit ctx: Ctx): DataFrame = {
    import ctx.spark.implicits._
    val bf = Compiler.compile(q, Compiler.unit(ctx))
    val jsons = bf.df.select(Vals.text(org.apache.spark.sql.functions.col(jsonVar)))
      .as[String]
    graft.docs.Documents.insertAll(jsons, docType, key)
  }

  /** UpdateDocument: replace the subgraph rooted at `id` with the new
    * JSON — staged as (adds of the new expansion, removes of the old
    * subgraph), exactly the reference's diff-then-commit shape. */
  def stageDocUpdate(graph: DataFrame, id: String, newJson: String,
                     docType: String)(implicit ctx: Ctx): (DataFrame, DataFrame) = {
    import ctx.spark.implicits._
    val removes = graft.docs.Documents.delete(graph, id)
    val adds = graft.docs.Documents
      .insertAll(Seq(newJson).toDS(), docType, graft.docs.Documents.FixedKey(id))
    (adds, removes)
  }

  /** DeleteDocument: stage removal of every document subgraph whose
    * root id is bound by `idVar` in a solution of `q` (the reference's
    * delete_document driven by a WOQL-selected id set). Subgraph
    * membership is an EQUI-join on the extracted document root — ids
    * are `doc:Type/key` (key segments are url-encoded, so they never
    * contain `/`) and subdocument subjects extend the root with
    * `/...` — not a prefix OR-join, so it stays hash-partitionable at
    * scale. */
  def stageDocDelete(graph: DataFrame, q: Woql, idVar: String)(
      implicit ctx: Ctx): DataFrame = {
    val bf = Compiler.compile(q, Compiler.unit(ctx))
    val ids = bf.df.select(col(idVar).getField("iri").as("__doc_id")).distinct()
    graph.join(ids,
      regexp_extract(col("s"), "^([^/]+/[^/]+)", 1) === col("__doc_id"),
      "left_semi")
  }

  /** Compile context reading a store branch (enables added_triple /
    * removed_triple against real commit deltas, and `using`-scoped
    * subqueries addressing any branch/commit of the store). */
  def ctxFromStore(store: LayerStore, branch: String): Ctx = {
    val triples = store.materializeBranch(branch)
    val closure = Eav.subclassClosure(store.spark, triples)
    Ctx(store.spark, triples, closure,
      adds = c => store.adds(c), removes = c => store.removes(c),
      resolve = resolver(store),
      // commit ids are content-addressed: root@head is immutable
      graphKey = store.refs.get(branch).map(h => s"${store.root}@$h"))
  }

  /** `using` resource resolver over a store: `branch/<name>` reads a
    * branch head, `commit/<id>` any commit (time travel). The resolved
    * context re-derives the subsumption closure from the ADDRESSED
    * graph — a branch's own schema triples drive isa there — and
    * carries the same resolver, so Using nests. */
  def resolver(store: LayerStore): String => Ctx = {
    case s if s.startsWith("db/") =>
      // cross-DATABASE addressing (the reference's org/db resource
      // strings, e.g. using("db/aux/branch/dev")): named stores live
      // under <root>/dbs/<name> — the same convention the HTTP db
      // admin routes create. Bare "db/<name>" means its main branch.
      val rest = s.stripPrefix("db/")
      val (name, sub) = rest.indexOf('/') match {
        case -1 => (rest, "branch/main")
        case i => (rest.substring(0, i), rest.substring(i + 1))
      }
      require(name.matches("[A-Za-z0-9_][A-Za-z0-9._-]*"),
        s"invalid database name in using: $name")
      resolver(LayerStore.open(store.spark, s"${store.root}/dbs/$name"))(sub)
    case resource =>
      val commitId = resource match {
        case s if s.startsWith("branch/") =>
          store.refs.getOrElse(s.stripPrefix("branch/"),
            throw new IllegalArgumentException(
              s"no such branch ${s.stripPrefix("branch/")}"))
        case s if s.startsWith("commit/") => s.stripPrefix("commit/")
        case other => sys.error(
          s"using('$other'): expected branch/<name>, commit/<id>, " +
            "or db/<name>[/branch/<b>|/commit/<c>]")
      }
      val graph = store.materialize(commitId)
      Ctx(store.spark, graph, Eav.subclassClosure(store.spark, graph),
        adds = c => store.adds(c), removes = c => store.removes(c),
        resolve = resolver(store),
        graphKey = Some(s"${store.root}@$commitId"))
  }
}
