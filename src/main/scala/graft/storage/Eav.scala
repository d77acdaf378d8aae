package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EAV (triple) encoding of the relational testdata.
  *
  * Physical layout follows SURVEY.md §7.2: one wide typed EAV table,
  * written as parquet **partitioned by predicate `p`** — the Spark
  * analogue of the reference store's predicate-first access paths
  * (terminusdb-store succinct per-predicate indexes,
  * reference: terminusdb-store/src/layer/). Bound-predicate triple
  * patterns then hit parquet partition pruning instead of a full scan,
  * which is the property that keeps EAV self-joins viable at 100 TB.
  */
object Eav {

  /** Flat storage schema for one triple. */
  val schema: StructType = StructType(Seq(
    StructField("g", StringType),       // graph: instance | schema
    StructField("s", StringType),       // subject IRI
    StructField("p", StringType),       // predicate IRI
    StructField("o_kind", StringType),  // "i" (iri) | "l" (literal)
    StructField("o_iri", StringType),
    StructField("o_typ", StringType),
    StructField("o_str", StringType),
    StructField("o_dbl", DoubleType),
    StructField("o_lng", LongType),
    StructField("o_ts", TimestampType),
    StructField("o_bool", BooleanType),
    StructField("o_lang", StringType),
    StructField("o_dec", graft.core.Vals.Dec38)
  ))

  sealed trait PropKind
  case object PStr extends PropKind
  case object PDbl extends PropKind
  case object PLng extends PropKind
  case object PTs extends PropKind
  /** Exact xsd:decimal column. The source parquet holds doubles, so the
    * encode narrows at scale 2 first (both Spark and DuckDB land on the
    * intended cent value — the doubles are cents ± ulp, never at a
    * half-cent tie) and then widens exactly to (38,18). */
  case object PDec extends PropKind
  /** FK column: object is an IRI `prefix + value`. */
  final case class PFk(prefix: String) extends PropKind

  private def objStruct(p: String, kind: PropKind, c: Column): Column = {
    val ns = lit(null).cast(StringType); val nd = lit(null).cast(DoubleType)
    val nl = lit(null).cast(LongType); val nt = lit(null).cast(TimestampType)
    val nb = lit(null).cast(BooleanType)
    val nx = lit(null).cast(graft.core.Vals.Dec38)
    def mk(oKind: Column, oIri: Column, typ: Column, s: Column, d: Column,
           l: Column, t: Column, b: Column,
           x: Column = nx): Column =
      struct(lit(p).as("p"), oKind.as("o_kind"), oIri.as("o_iri"), typ.as("o_typ"),
        s.as("o_str"), d.as("o_dbl"), l.as("o_lng"), t.as("o_ts"), b.as("o_bool"),
        ns.as("o_lang"), x.as("o_dec"))
    kind match {
      case PStr    => mk(lit("l"), ns, lit("xsd:string"), c.cast(StringType), nd, nl, nt, nb)
      case PDbl    => mk(lit("l"), ns, lit("xsd:double"), ns, c.cast(DoubleType), nl, nt, nb)
      case PLng    => mk(lit("l"), ns, lit("xsd:integer"), ns, nd, c.cast(LongType), nt, nb)
      case PTs     => mk(lit("l"), ns, lit("xsd:dateTime"), ns, nd, nl, c.cast(TimestampType), nb)
      case PDec    => mk(lit("l"), ns, lit("xsd:decimal"), ns, nd, nl, nt, nb,
        c.cast(DecimalType(12, 2)).cast(graft.core.Vals.Dec38))
      case PFk(pr) => mk(lit("i"), concat(lit(pr), c.cast(StringType)), ns, ns, nd, nl, nt, nb)
    }
  }

  private def typeStruct(cls: String): Column = {
    val ns = lit(null).cast(StringType); val nd = lit(null).cast(DoubleType)
    val nl = lit(null).cast(LongType); val nt = lit(null).cast(TimestampType)
    val nb = lit(null).cast(BooleanType)
    val nx = lit(null).cast(graft.core.Vals.Dec38)
    struct(lit("rdf:type").as("p"), lit("i").as("o_kind"), lit(cls).as("o_iri"),
      ns.as("o_typ"), ns.as("o_str"), nd.as("o_dbl"), nl.as("o_lng"), nt.as("o_ts"),
      nb.as("o_bool"), ns.as("o_lang"), nx.as("o_dec"))
  }

  /** One pass per table: rows → array of (p, typed object) structs → explode.
    * Single scan, no per-column union. */
  def encodeTable(df: DataFrame, subject: Column, typeIri: String,
                  props: Seq[(String, PropKind, Column)]): DataFrame = {
    val objs = typeStruct(typeIri) +: props.map { case (p, k, c) => objStruct(p, k, c) }
    df.select(subject.as("s"), explode(array(objs: _*)).as("t"))
      .select(lit("instance").as("g"), col("s"), col("t.p").as("p"),
        col("t.o_kind"), col("t.o_iri"), col("t.o_typ"), col("t.o_str"),
        col("t.o_dbl"), col("t.o_lng"), col("t.o_ts"), col("t.o_bool"), col("t.o_lang"),
        col("t.o_dec"))
      // FK columns can be null-keyed in principle; a triple never has a null object
      .filter(col("t.o_kind") === "i" && col("t.o_iri").isNotNull ||
              col("t.o_kind") === "l")
  }

  /** Encode all TPC-H-ish tables of one scale-factor dir into triples.
    * Subject/property IRI scheme matches FIXTURES.md (oracle SQL
    * reconstructs subjects as e.g. `'tpch:customer/' || c_custkey`). */
  def encodeAll(spark: SparkSession, sfDir: String): DataFrame = {
    def rd(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def iri(prefix: String, c: Column) = concat(lit(prefix), c.cast(StringType))

    val region = encodeTable(rd("region"), iri("tpch:region/", col("r_regionkey")),
      "tpch:Region", Seq(
        ("tpch:r_regionkey", PLng, col("r_regionkey")),
        ("tpch:r_name", PStr, col("r_name"))))

    val nation = encodeTable(rd("nation"), iri("tpch:nation/", col("n_nationkey")),
      "tpch:Nation", Seq(
        ("tpch:n_nationkey", PLng, col("n_nationkey")),
        ("tpch:n_name", PStr, col("n_name")),
        ("tpch:n_regionkey", PFk("tpch:region/"), col("n_regionkey"))))

    val customer = encodeTable(rd("customer"), iri("tpch:customer/", col("c_custkey")),
      "tpch:Customer", Seq(
        ("tpch:c_custkey", PLng, col("c_custkey")),
        ("tpch:c_name", PStr, col("c_name")),
        ("tpch:c_nationkey", PFk("tpch:nation/"), col("c_nationkey")),
        ("tpch:c_acctbal", PDbl, col("c_acctbal")),
        ("tpch:c_mktsegment", PStr, col("c_mktsegment"))))

    val supplier = encodeTable(rd("supplier"), iri("tpch:supplier/", col("s_suppkey")),
      "tpch:Supplier", Seq(
        ("tpch:s_suppkey", PLng, col("s_suppkey")),
        ("tpch:s_name", PStr, col("s_name")),
        ("tpch:s_nationkey", PFk("tpch:nation/"), col("s_nationkey")),
        ("tpch:s_acctbal", PDbl, col("s_acctbal"))))

    val part = encodeTable(rd("part"), iri("tpch:part/", col("p_partkey")),
      "tpch:Part", Seq(
        ("tpch:p_partkey", PLng, col("p_partkey")),
        ("tpch:p_name", PStr, col("p_name")),
        ("tpch:p_brand", PStr, col("p_brand")),
        ("tpch:p_type", PStr, col("p_type")),
        ("tpch:p_size", PLng, col("p_size")),
        ("tpch:p_retailprice", PDbl, col("p_retailprice"))))

    val orders = encodeTable(rd("orders"), iri("tpch:orders/", col("o_orderkey")),
      "tpch:Orders", Seq(
        ("tpch:o_orderkey", PLng, col("o_orderkey")),
        ("tpch:o_custkey", PFk("tpch:customer/"), col("o_custkey")),
        ("tpch:o_orderstatus", PStr, col("o_orderstatus")),
        ("tpch:o_totalprice", PDbl, col("o_totalprice")),
        // money-typed mirror: exact xsd:decimal semantics (SURVEY §2.6)
        ("tpch:o_totalprice_dec", PDec, col("o_totalprice")),
        ("tpch:o_orderdate", PTs, col("o_orderdate")),
        ("tpch:o_orderpriority", PStr, col("o_orderpriority"))))

    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data; the
    // 5-tuple below is (verified at every sf). md5 keeps subject derivation
    // embarrassingly parallel — no global row_number sort at 100 TB.
    val lineitem = encodeTable(rd("lineitem"),
      concat(lit("tpch:lineitem/"), md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity")))),
      "tpch:Lineitem", Seq(
        ("tpch:l_orderkey", PFk("tpch:orders/"), col("l_orderkey")),
        ("tpch:l_partkey", PFk("tpch:part/"), col("l_partkey")),
        ("tpch:l_suppkey", PFk("tpch:supplier/"), col("l_suppkey")),
        ("tpch:l_linenumber", PLng, col("l_linenumber")),
        ("tpch:l_quantity", PDbl, col("l_quantity")),
        ("tpch:l_extendedprice", PDbl, col("l_extendedprice")),
        ("tpch:l_discount", PDbl, col("l_discount")),
        ("tpch:l_tax", PDbl, col("l_tax")),
        ("tpch:l_returnflag", PStr, col("l_returnflag")),
        ("tpch:l_linestatus", PStr, col("l_linestatus")),
        ("tpch:l_shipdate", PTs, col("l_shipdate"))))

    val instance = Seq(region, nation, customer, supplier, part, orders, lineitem)
      .reduce(_ unionByName _)
    instance.unionByName(schemaGraph(spark))
  }

  /** Schema graph: the class hierarchy (isa/subsumption) plus
    * property declarations (rdfs:domain / rdfs:range / graft:maxCard)
    * that drive frames and commit-time validation — the class-frame
    * metadata the reference keeps in its schema graph
    * (core/query/frame.pl). Customer and Supplier subclass a shared
    * tpch:Agent; rdfs:label is declared on the root tpch:Entity so
    * every class frame inherits it through the subclass closure. */
  def schemaGraph(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      ("tpch:Customer", "rdfs:subClassOf", "tpch:Agent"),
      ("tpch:Supplier", "rdfs:subClassOf", "tpch:Agent"),
      ("tpch:Agent", "rdfs:subClassOf", "tpch:Entity"),
      ("tpch:Orders", "rdfs:subClassOf", "tpch:Entity"),
      ("tpch:Lineitem", "rdfs:subClassOf", "tpch:Entity"),
      ("tpch:Part", "rdfs:subClassOf", "tpch:Entity"),
      ("tpch:Nation", "rdfs:subClassOf", "tpch:Entity"),
      ("tpch:Region", "rdfs:subClassOf", "tpch:Entity"))
    val iriTriples = rows ++ Seq(
      // property declarations: domain (owning class) + range
      ("tpch:c_name", "rdfs:domain", "tpch:Customer"),
      ("tpch:c_name", "rdfs:range", "xsd:string"),
      ("tpch:c_acctbal", "rdfs:domain", "tpch:Customer"),
      ("tpch:c_acctbal", "rdfs:range", "xsd:double"),
      ("tpch:c_mktsegment", "rdfs:domain", "tpch:Customer"),
      ("tpch:c_mktsegment", "rdfs:range", "xsd:string"),
      ("tpch:c_nationkey", "rdfs:domain", "tpch:Customer"),
      ("tpch:c_nationkey", "rdfs:range", "tpch:Nation"),
      ("tpch:n_name", "rdfs:domain", "tpch:Nation"),
      ("tpch:n_name", "rdfs:range", "xsd:string"),
      ("rdfs:label", "rdfs:domain", "tpch:Entity"),
      ("rdfs:label", "rdfs:range", "xsd:string"))
    val iriDf = iriTriples.toDF("s", "p", "o_iri")
      .select(lit("schema").as("g"), col("s"), col("p"), lit("i").as("o_kind"),
        col("o_iri"), lit(null).cast(StringType).as("o_typ"),
        lit(null).cast(StringType).as("o_str"),
        lit(null).cast(DoubleType).as("o_dbl"),
        lit(null).cast(LongType).as("o_lng"),
        lit(null).cast(TimestampType).as("o_ts"),
        lit(null).cast(BooleanType).as("o_bool"),
        lit(null).cast(StringType).as("o_lang"),
        lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
    val cardDf = Seq(
      ("tpch:c_name", 1L), ("tpch:c_acctbal", 1L), ("tpch:n_name", 1L))
      .toDF("s", "o_lng")
      .select(lit("schema").as("g"), col("s"), lit("graft:maxCard").as("p"),
        lit("l").as("o_kind"), lit(null).cast(StringType).as("o_iri"),
        lit("xsd:integer").as("o_typ"),
        lit(null).cast(StringType).as("o_str"),
        lit(null).cast(DoubleType).as("o_dbl"),
        col("o_lng"),
        lit(null).cast(TimestampType).as("o_ts"),
        lit(null).cast(BooleanType).as("o_bool"),
        lit(null).cast(StringType).as("o_lang"),
        lit(null).cast(graft.core.Vals.Dec38).as("o_dec"))
    iriDf.unionByName(cardDf)
  }

  /** Reflexive-transitive subclass closure (sub, sup) — computed by
    * iterative self-join; the schema graph is tiny so this is a handful
    * of driver-side iterations, and the result is broadcast into isa
    * joins (SURVEY §2.2). */
  def subclassClosure(spark: SparkSession, triples: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = triples.filter(col("g") === "schema" && col("p") === "rdfs:subClassOf")
      .select(col("s").as("sub"), col("o_iri").as("sup"))
    val classes = edges.select(col("sub").as("c"))
      .union(edges.select(col("sup").as("c")))
      .union(triples.filter(col("p") === "rdf:type").select(col("o_iri").as("c")))
      .distinct()
    // schema DAGs are tiny: close on the driver, broadcast the result
    val e = edges.collect().map(r => (r.getString(0), r.getString(1)))
    val closed = scala.collection.mutable.Set[(String, String)]()
    classes.as[String].collect().foreach(c => closed += ((c, c)))
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- closed.toSeq; (x, y) <- e if b == x && !closed.contains((a, y))) {
        closed += ((a, y)); changed = true
      }
    }
    closed.toSeq.toDF("sub", "sup")
  }
}
