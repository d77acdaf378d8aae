package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema migration operations ([ref:core/api/api_migration.pl] — the
  * reference's migration API: change the schema AND rewrite the
  * affected instance data in one commit, so the database never holds
  * data its schema doesn't describe).
  *
  * Spark-first shape: every operation compiles to an `(adds, removes)`
  * EAV delta over the branch head — schema rows in graph `schema`,
  * instance rewrites as distributed transforms of the materialized
  * graph (predicate-filtered scans, narrow maps; never a driver loop)
  * — and the whole operation list lands as ONE commit through the
  * ordinary layer protocol. Dry information (how many instance rows
  * each op touches) is a by-product of the same frames.
  *
  * Supported operations (the reference's core set):
  *  - [[AddClass]] / [[DeleteClass]] (delete refuses while instances
  *    remain unless `force` — then their subgraphs are removed)
  *  - [[AddProperty]] / [[DeleteProperty]] (delete drops the schema
  *    rows AND every instance triple using the predicate)
  *  - [[RenameProperty]] (schema + instance rewrite, p → p')
  *  - [[CastProperty]] (retype: instance objects re-cast to the new
  *    range via the same XsdCast matrix as WOQL `typecast`; rows that
  *    cannot cast are REPORTED and the migration refuses, mirroring
  *    the reference's schema-checking failure) */
object Migration {

  sealed trait Op
  final case class AddClass(cls: String, sup: Option[String] = None) extends Op
  final case class DeleteClass(cls: String, force: Boolean = false) extends Op
  final case class AddProperty(p: String, domain: String, range: String) extends Op
  final case class DeleteProperty(p: String) extends Op
  final case class RenameProperty(from: String, to: String) extends Op
  final case class CastProperty(p: String, newRange: String) extends Op

  private def emptyEav(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Eav.schema)

  private def schemaRow(spark: org.apache.spark.sql.SparkSession,
                        s: String, p: String, o: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    Seq((s, p, o)).toDF("s", "p", "o")
      .select(lit("schema").as("g"), col("s"), col("p"),
        lit("i").as("o_kind"), col("o").as("o_iri"),
        lit(null).cast(StringType).as("o_typ"),
        lit(null).cast(StringType).as("o_str"),
        lit(null).cast(DoubleType).as("o_dbl"),
        lit(null).cast(LongType).as("o_lng"),
        lit(null).cast(TimestampType).as("o_ts"),
        lit(null).cast(BooleanType).as("o_bool"),
        lit(null).cast(StringType).as("o_lang"),
        lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
      .select(Eav.schema.fieldNames.map(col): _*)
  }

  /** One op → `(adds, removes)` over the current graph. Throws on a
    * refused migration (instances of a deleted class without `force`,
    * uncastable values) with a message naming the offenders. */
  def delta(graph: DataFrame, op: Op): (DataFrame, DataFrame) = {
    val spark = graph.sparkSession
    val none = emptyEav(spark)
    op match {
      case AddClass(cls, sup) =>
        val self = schemaRow(spark, cls, "rdf:type", "owl:Class")
        val adds = sup.fold(self)(s =>
          self.unionByName(schemaRow(spark, cls, "rdfs:subClassOf", s)))
        (adds, none)

      case DeleteClass(cls, force) =>
        val instances = graph.filter(col("g") === "instance" &&
          col("p") === "rdf:type" && col("o_iri") === cls)
        val n = instances.limit(21).count()
        if (!force) require(n == 0,
          s"delete_class $cls: ${if (n > 20) ">20" else n.toString} " +
            "instances remain — migrate or force to drop their subgraphs")
        // the class's schema rows (as subject or as an object of
        // subClassOf/domain/range) + with force, every instance subgraph
        val schemaGone = graph.filter(col("g") === "schema" &&
          (col("s") === cls || col("o_iri") === cls))
        val instGone =
          if (!force) none
          else {
            val roots = instances.select(col("s").as("__root"))
            // whole-subtree match by ROOT PREFIX (`root` or `root/...`):
            // a parent-extraction regex would only climb one level and —
            // with a greedy `(.*)` — to the WRONG level for depth ≥ 2
            // subjects (root/sub/leaf extracts root/sub), orphaning
            // grandchildren. Prefix match removes the whole subgraph.
            graph.filter(col("g") === "instance").join(roots,
              col("s") === col("__root") ||
                col("s").startsWith(concat(col("__root"), lit("/"))),
              "left_semi")
          }
        (none, schemaGone.unionByName(instGone))

      case AddProperty(p, domain, range) =>
        (schemaRow(spark, p, "rdfs:domain", domain)
          .unionByName(schemaRow(spark, p, "rdfs:range", range)), none)

      case DeleteProperty(p) =>
        val schemaGone = graph.filter(col("g") === "schema" && col("s") === p)
        val instGone = graph.filter(col("g") === "instance" && col("p") === p)
        (none, schemaGone.unionByName(instGone))

      case RenameProperty(from, to) =>
        val schemaOld = graph.filter(col("g") === "schema" && col("s") === from)
        val instOld = graph.filter(col("g") === "instance" && col("p") === from)
        val adds = schemaOld.withColumn("s", lit(to))
          .unionByName(instOld.withColumn("p", lit(to)))
        (adds, schemaOld.unionByName(instOld))

      case CastProperty(p, newRange) =>
        val old = graph.filter(col("g") === "instance" && col("p") === p)
        val casted = castEav(old, newRange)
        val bad = casted.filter(col("o_kind").isNull)
          .select(col("s")).limit(5).collect().map(_.getString(0))
        require(bad.isEmpty,
          s"cast_property $p -> $newRange: uncastable values at " +
            bad.mkString(", "))
        val rangeOld = graph.filter(col("g") === "schema" &&
          col("s") === p && col("p") === "rdfs:range")
        (casted.unionByName(schemaRow(spark, p, "rdfs:range", newRange)),
          old.unionByName(rangeOld))
    }
  }

  /** EAV-level retype for [[CastProperty]] — the same coercion ladder
    * as the WOQL `typecast` compiler case (exact targets first, string
    * parse last), but over raw EAV columns so the rewrite is one
    * narrow, codegen'd map over the predicate-filtered scan. Rows that
    * cannot cast come back with `o_kind` NULL (the caller's refusal
    * marker). */
  private def castEav(rows: DataFrame, typ: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Column
    def nul(t: DataType) = lit(null).cast(t)
    // (o_kind, o_typ, str, dbl, lng, bool, dec) for the target type
    val (value: Column, out: Seq[(String, Column)]) = typ match {
      case "xsd:string" =>
        val v = coalesce(col("o_str"), col("o_lng").try_cast(StringType),
          col("o_dec").try_cast(StringType), col("o_dbl").try_cast(StringType),
          col("o_bool").try_cast(StringType), col("o_ts").try_cast(StringType),
          col("o_iri"))
        (v, Seq("o_str" -> v))
      case "xsd:integer" =>
        val v = coalesce(col("o_lng"), col("o_dec").try_cast(LongType),
          col("o_dbl").try_cast(LongType), col("o_str").try_cast(LongType),
          col("o_bool").try_cast(LongType))
        (v, Seq("o_lng" -> v))
      case "xsd:double" =>
        val v = coalesce(col("o_dbl"), col("o_dec").try_cast(DoubleType),
          col("o_lng").try_cast(DoubleType), col("o_str").try_cast(DoubleType))
        (v, Seq("o_dbl" -> v))
      case "xsd:decimal" =>
        val v = coalesce(col("o_dec"), col("o_lng").try_cast(graft.core.Vals.Dec38),
          col("o_str").try_cast(graft.core.Vals.Dec38),
          col("o_dbl").try_cast(graft.core.Vals.Dec38))
        (v, Seq("o_dec" -> v))
      case "xsd:boolean" =>
        val v = coalesce(col("o_bool"),
          when(lower(col("o_str")).isin("true", "1"), lit(true))
            .when(lower(col("o_str")).isin("false", "0"), lit(false)))
        (v, Seq("o_bool" -> v))
      case "xsd:dateTime" =>
        val v = coalesce(col("o_ts"), graft.functions.XsdTimestampCast
          .xsdTs(rows.sparkSession, col("o_str")))
        (v, Seq("o_ts" -> v))
      case other => throw new IllegalArgumentException(
        s"cast_property: unsupported target range $other")
    }
    val keep = Map(
      "o_iri" -> nul(StringType), "o_str" -> nul(StringType),
      "o_dbl" -> nul(DoubleType), "o_lng" -> nul(LongType),
      "o_ts" -> nul(TimestampType), "o_bool" -> nul(BooleanType),
      "o_lang" -> nul(StringType), "o_dec" -> nul(graft.core.Vals.Dec38)
    ) ++ out.toMap
    rows.select(
      col("g"), col("s"), col("p"),
      when(value.isNull, nul(StringType)).otherwise(lit("l")).as("o_kind"),
      keep("o_iri").as("o_iri"), lit(typ).as("o_typ"),
      keep("o_str").as("o_str"), keep("o_dbl").as("o_dbl"),
      keep("o_lng").as("o_lng"), keep("o_ts").as("o_ts"),
      keep("o_bool").as("o_bool"), keep("o_lang").as("o_lang"),
      keep("o_dec").as("o_dec"))
      .select(Eav.schema.fieldNames.map(col): _*)
  }

  /** Apply an operation list as ONE commit on `branch`; returns the new
    * commit id. Ops fold left over a VIEW of the evolving graph (each
    * op's delta applies to head ∘ previous ops), so e.g. rename-then-
    * cast composes. */
  def migrate(store: LayerStore, branch: String, ops: Seq[Op],
              message: String = "migration"): String = {
    val head = store.materializeBranch(branch)
    var graph = head
    ops.foreach { op =>
      val (a, r) = delta(graph, op)
      // evolve the view: (graph ∖ r) ∪ a — exceptAll/union keeps the
      // fold declarative; materialization happens once, in commit()
      graph = graph.exceptAll(r).unionByName(a)
    }
    // Commit the NET delta (finalGraph vs head), not the accumulated
    // per-op adds/removes: when a later op removes a row an earlier op
    // in the same migration added (rename a→b then b→c, or the
    // documented rename-then-cast), the commit's add-wins materialize
    // order (add seq > remove seq within one commit) would resurrect
    // the stale intermediate rows. Netting cancels them exactly, and
    // multiset exceptAll keeps multiplicity honest in both directions.
    store.commit(branch, graph.exceptAll(head), head.exceptAll(graph), message)
  }
}
