package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commit-time schema validation (SURVEY §2.8; reference:
  * core/validation/validate_instance.pl — referential integrity, literal
  * range checks, cardinality, domain/range).
  *
  * Each check is one declarative DataFrame query returning violations
  * (empty = valid). Checks run over (materialized graph + staged delta)
  * restricted to commit-touched subjects — the incremental trick the
  * reference's v10 validator uses — so validation cost scales with the
  * delta, not the database. */
object Validator {

  /** Schema constraint table, derived from schema-graph triples:
    * rdfs:domain / rdfs:range / graft:maxCard per predicate. */
  final case class Constraints(
      domain: DataFrame,  // (p, cls)
      range: DataFrame,   // (p, typ)  — xsd type for literals, class for IRIs
      maxCard: DataFrame, // (p, n)
      oneOf: DataFrame,   // (p, v)    — allowed literal values (enum)
      unique: DataFrame,  // (p)       — key predicates: value ↦ ≤1 subject
      subdoc: DataFrame,  // (cls)     — subdocument classes: exactly 1 owner
      family: DataFrame   // (p, fam)  — v10 type family: Optional/Set/List/Array
  )

  def constraintsFrom(schema: DataFrame): Constraints = Constraints(
    domain = schema.filter(col("p") === "rdfs:domain")
      .select(col("s").as("cp"), col("o_iri").as("cls")),
    range = schema.filter(col("p") === "rdfs:range")
      .select(col("s").as("cp"), col("o_iri").as("typ")),
    maxCard = schema.filter(col("p") === "graft:maxCard")
      .select(col("s").as("cp"), col("o_lng").as("n")),
    oneOf = schema.filter(col("p") === "graft:oneOf")
      .select(col("s").as("cp"), col("o_str").as("v")),
    unique = schema.filter(col("p") === "graft:unique" && col("o_bool") === true)
      .select(col("s").as("cp")),
    subdoc = schema.filter(col("p") === "graft:subdocument" && col("o_bool") === true)
      .select(col("s").as("cls")),
    family = schema.filter(col("p") === "graft:family")
      .select(col("s").as("cp"), col("o_str").as("fam")))

  /** Restrict graph to subjects touched by the delta (incremental). */
  def touched(graph: DataFrame, delta: DataFrame): DataFrame =
    graph.join(delta.select(col("s")).distinct(), Seq("s"), "left_semi")

  /** IRI objects must exist as subjects (referential integrity). */
  def danglingRefs(graph: DataFrame, checkScope: DataFrame): DataFrame = {
    val subjects = graph.select(col("s")).distinct()
    checkScope.filter(col("o_kind") === "i" &&
        !col("p").isin("rdf:type", "rdfs:subClassOf"))
      .join(subjects.withColumnRenamed("s", "o_iri"), Seq("o_iri"), "left_anti")
      .select(col("s"), col("p"), col("o_iri"))
  }

  /** Literal type must match rdfs:range of the predicate. */
  def rangeViolations(checkScope: DataFrame, c: Constraints): DataFrame =
    checkScope.filter(col("o_kind") === "l")
      .join(broadcast(c.range), col("p") === col("cp"), "inner")
      .where(col("o_typ") =!= col("typ"))
      .select(col("s"), col("p"), col("o_typ"), col("typ"))

  /** (s, p) cardinality must not exceed graft:maxCard. */
  def cardinalityViolations(graph: DataFrame, delta: DataFrame,
                            c: Constraints): DataFrame =
    touched(graph, delta)
      .groupBy(col("s"), col("p")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(c.maxCard), col("p") === col("cp"), "inner")
      .where(col("cnt") > col("n"))
      .select(col("s"), col("p"), col("cnt"), col("n"))

  /** Typed subjects must satisfy rdfs:domain of used predicates. */
  def domainViolations(graph: DataFrame, delta: DataFrame,
                       c: Constraints, subclass: DataFrame): DataFrame = {
    val types = graph.filter(col("p") === "rdf:type")
      .select(col("s"), col("o_iri").as("cls0"))
    val withSup = types.join(broadcast(subclass), col("cls0") === col("sub"))
      .select(col("s"), col("sup"))
    touched(delta, delta)
      .join(broadcast(c.domain), col("p") === col("cp"), "inner")
      .join(withSup.withColumnRenamed("sup", "cls"), Seq("s", "cls"), "left_anti")
      .select(col("s"), col("p"), col("cls"))
  }

  /** Enum membership: literal values of a graft:oneOf-constrained
    * predicate must be among the allowed set. */
  def enumViolations(checkScope: DataFrame, c: Constraints): DataFrame =
    checkScope.filter(col("o_kind") === "l")
      .join(broadcast(c.oneOf.select(col("cp")).distinct()),
        col("p") === col("cp"), "left_semi")
      .join(broadcast(c.oneOf),
        col("p") === col("cp") && col("o_str") === col("v"), "left_anti")
      .select(col("s"), col("p"), col("o_str"))

  /** Key uniqueness: a graft:unique predicate's value identifies at most
    * one subject. Incremental: only (p, value) keys the delta touches are
    * re-grouped — cost ∝ delta, not database. */
  def uniqueViolations(graph: DataFrame, delta: DataFrame,
                       c: Constraints): DataFrame = {
    // canonical lexical view: a graft:unique value can live in ANY typed
    // slot — keying on o_str alone silently never checked non-string keys
    // (their null o_str never matched the delta's keys). The slot tag
    // joins the grouping key so cross-type lexical collisions stay apart:
    // o_str "123" and o_lng 123 (or o_str "true" vs o_bool true) are
    // DIFFERENT keys — distinct types never alias into a false
    // uniqueness violation. The reported `v` stays the bare lexical.
    val litTag = when(col("o_str").isNotNull, lit("s"))
      .when(col("o_lng").isNotNull, lit("l"))
      .when(col("o_dbl").isNotNull, lit("d"))
      .when(col("o_dec").isNotNull, lit("c"))
      .when(col("o_ts").isNotNull, lit("t"))
      .when(col("o_bool").isNotNull, lit("b"))
    val litKey = coalesce(col("o_str"),
      col("o_lng").cast("string"), col("o_dbl").cast("string"),
      col("o_dec").cast("string"), col("o_ts").cast("string"),
      col("o_bool").cast("string"))
    val all = graph.unionByName(delta).filter(col("o_kind") === "l")
      .join(broadcast(c.unique), col("p") === col("cp"), "left_semi")
      .withColumn("vt", litTag).withColumn("v", litKey)
    val deltaKeys = delta.filter(col("o_kind") === "l")
      .join(broadcast(c.unique), col("p") === col("cp"), "left_semi")
      .select(col("p"), litTag.as("vt"), litKey.as("v")).distinct()
    all.join(deltaKeys, Seq("p", "vt", "v"), "left_semi")
      .groupBy(col("p"), col("vt"), col("v"))
      .agg(countDistinct(col("s")).as("cnt"))
      .where(col("cnt") > 1)
      .select(col("p"), col("v"), col("cnt"))
  }

  /** Subdocument ownership: an instance of a graft:subdocument class must
    * have exactly one incoming reference (its owner). Incremental over
    * subjects the delta touches. */
  def subdocViolations(graph: DataFrame, delta: DataFrame,
                       c: Constraints): DataFrame = {
    val subs = graph.filter(col("p") === "rdf:type")
      .join(broadcast(c.subdoc), col("o_iri") === col("cls"), "left_semi")
      .select(col("s")).distinct()
    val touchedSubs = subs.join(delta.select(col("s")).distinct(), Seq("s"), "left_semi")
    val owners = graph.filter(col("o_kind") === "i" && col("p") =!= "rdf:type")
      .groupBy(col("o_iri")).agg(count(lit(1)).as("cnt"))
    touchedSubs.join(owners, col("s") === col("o_iri"), "left_outer")
      .select(col("s"), coalesce(col("cnt"), lit(0L)).as("owners"))
      .where(col("owners") =!= 1)
  }

  /** v10 type-family shapes ([ref:core/document/schema.pl] — the
    * reference's `Optional`/`Set`/`List`/`Array` field declarations),
    * enforced at commit over delta-touched subjects like every other
    * check. One violations frame `(s, p, fam, n)`:
    *  - Optional: more than one value for the field (`n` = value count);
    *  - Set: duplicate members (`n` = how many distinct values repeat —
    *    the slot-tagged key logic of [[uniqueViolations]] keeps
    *    cross-type lexical collisions apart);
    *  - Array: element subdocuments must carry `graft:idx` values that
    *    are exactly 0..n-1 — no gaps, no duplicates, no missing index
    *    (`n` = element count);
    *  - List: the field must point at `rdf:nil` or a cons cell, and
    *    every delta-touched cons node must have exactly one
    *    `rdf:first` and one `rdf:rest` (local well-formedness; chain
    *    TERMINATION is a read-side concern — a cycle is still
    *    reachable only through these nodes, and the reader's
    *    min-position dedup refuses to loop).
    * All shapes are one aggregation over the predicate-filtered scope
    * joined to the broadcast family table — cost ∝ delta. */
  def familyViolations(graph: DataFrame, delta: DataFrame,
                       c: Constraints): DataFrame = {
    val scope = touched(graph, delta)
    val bySP = scope
      .filter(!col("p").isin("rdf:type", "graft:idx", "rdf:first", "rdf:rest"))
      .join(broadcast(c.family), col("p") === col("cp"), "inner")
    val opt = bySP.filter(col("fam") === "Optional")
      .groupBy(col("s"), col("p"), col("fam"))
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
    val setKey = concat_ws("#",
      coalesce(col("o_iri"), lit("")),
      coalesce(col("o_str"), col("o_lng").cast("string"),
        col("o_dbl").cast("string"), col("o_dec").cast("string"),
        col("o_ts").cast("string"), col("o_bool").cast("string"), lit("")),
      coalesce(col("o_typ"), lit("")))
    val setDup = bySP.filter(col("fam") === "Set")
      .groupBy(col("s"), col("p"), col("fam"), setKey.as("v"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)
      .groupBy(col("s"), col("p"), col("fam"))
      .agg(count(lit(1)).as("n"))
    val idx = graph.filter(col("p") === "graft:idx")
      .select(col("s").as("el"), col("o_lng").as("idx"))
    val arr = bySP.filter(col("fam") === "Array" && col("o_kind") === "i")
      .join(idx, col("o_iri") === col("el"), "left_outer")
      .groupBy(col("s"), col("p"), col("fam"))
      .agg(count(lit(1)).as("n"), count(col("idx")).as("nidx"),
        countDistinct(col("idx")).as("nd"),
        min(col("idx")).as("mn"), max(col("idx")).as("mx"))
      .where(col("nidx") =!= col("n") || col("nd") =!= col("n") ||
        col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .select(col("s"), col("p"), col("fam"), col("n"))
    // List heads: field value must be an IRI (nil or a cons cell) —
    // a literal in a List field is a shape violation outright
    val listLit = bySP.filter(col("fam") === "List" && col("o_kind") =!= "i")
      .groupBy(col("s"), col("p"), col("fam")).agg(count(lit(1)).as("n"))
    // cons-node local shape over delta-touched nodes
    val consNodes = touched(
      graph.filter(col("p").isin("rdf:first", "rdf:rest")), delta)
    val consBad = consNodes.groupBy(col("s"))
      .agg(sum(when(col("p") === "rdf:first", 1L).otherwise(0L)).as("nf"),
        sum(when(col("p") === "rdf:rest", 1L).otherwise(0L)).as("nr"))
      .where(col("nf") =!= 1 || col("nr") =!= 1)
      .select(col("s"), lit("rdf:first").as("p"), lit("List").as("fam"),
        (col("nf") + col("nr")).as("n"))
    opt.unionByName(setDup).unionByName(arr)
      .unionByName(listLit).unionByName(consBad)
  }

  /** Run all checks; returns (checkName -> violations). */
  def validate(graph: DataFrame, delta: DataFrame, schema: DataFrame,
               subclass: DataFrame): Map[String, DataFrame] = {
    val c = constraintsFrom(schema)
    val merged = graph.unionByName(delta)
    val scope = touched(merged, delta)
    Map(
      "dangling_refs" -> danglingRefs(merged, scope),
      "range" -> rangeViolations(scope, c),
      "cardinality" -> cardinalityViolations(merged, delta, c),
      "domain" -> domainViolations(merged, delta, c, subclass),
      "enum" -> enumViolations(scope, c),
      "unique" -> uniqueViolations(graph, delta, c),
      "subdoc_ownership" -> subdocViolations(merged, delta, c),
      "family" -> familyViolations(merged, delta, c))
  }

  def isValid(results: Map[String, DataFrame]): Boolean =
    results.values.forall(_.isEmpty)
}
