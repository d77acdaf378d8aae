package graft.docs

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.storage.Eav

/** Document layer: JSON documents as subgraphs rooted at an IRI
  * (SURVEY §2.8 / E2; reference: core/document/json.pl — id generation
  * per @key strategy, recursive subdocument expansion, JSON
  * reconstruction from SP-indexed reads).
  *
  * Spark-first: bulk insert parses+expands JSON inside `mapPartitions`
  * (pure function per document, embarrassingly parallel); bulk read is
  * a groupBy(subject) assembly. Single-document read/delete are
  * driver-side conveniences over the same triples.
  */
object Documents {

  sealed trait KeyStrategy
  final case class LexicalKey(fields: Seq[String]) extends KeyStrategy
  final case class HashKey(fields: Seq[String]) extends KeyStrategy
  case object ValueHash extends KeyStrategy
  case object RandomKey extends KeyStrategy
  /** Pin a known id (document update replaces in place). */
  final case class FixedKey(id: String) extends KeyStrategy

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def urlEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Canonical rendering used by ValueHash (sorted keys, no spaces). */
  def canonical(j: JValue): String = j match {
    case JObject(fs) => fs.sortBy(_._1)
      .map { case (k, v) => s""""$k":${canonical(v)}""" }.mkString("{", ",", "}")
    case JArray(xs) => xs.map(canonical).mkString("[", ",", "]")
    case JString(s) => s""""$s""""
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case JDecimal(d) => d.toString
    case JBool(b) => b.toString
    case JNull => "null"
    case _ => "null"
  }

  def genId(docType: String, j: JObject, key: KeyStrategy): String = key match {
    case LexicalKey(fs) =>
      s"doc:$docType/" + urlEncode(fs.map(f => render(j \ f)).mkString("_"))
    case HashKey(fs) =>
      s"doc:$docType/" + sha256(fs.map(f => render(j \ f)).mkString("_"))
    case ValueHash => s"doc:$docType/" + sha256(canonical(j))
    case RandomKey => s"doc:$docType/" + java.util.UUID.randomUUID().toString
    case FixedKey(id) => id
  }

  private def render(v: JValue): String = v match {
    case JString(s) => s
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case JBool(b) => b.toString
    case _ => ""
  }

  /** Expand one parsed document into EAV rows (g = "instance").
    * Nested objects become subdocuments with `parent/field` subjects;
    * arrays expand to one triple per element plus a graft:idx triple on
    * subdocument elements (v10 array-index style). */
  def expand(docType: String, subject: String, j: JObject): Seq[Row] = {
    val typeRow = row(subject, "rdf:type", iri = Some(s"doc:$docType"))
    val fieldRows = j.obj.flatMap { case (field, v) => value(subject, field, v) }
    typeRow +: fieldRows
  }

  private def value(subject: String, field: String, v: JValue): Seq[Row] = v match {
    case JString(s)  => Seq(row(subject, s"doc:$field", str = Some(s)))
    case JInt(i)     => Seq(row(subject, s"doc:$field", lng = Some(i.toLong)))
    case JDouble(d)  => Seq(row(subject, s"doc:$field", dbl = Some(d)))
    case JDecimal(d) => Seq(row(subject, s"doc:$field", dbl = Some(d.toDouble)))
    case JBool(b)    => Seq(row(subject, s"doc:$field", bool = Some(b)))
    case JNull       => Seq.empty
    case o: JObject  =>
      val sub = s"$subject/$field"
      row(subject, s"doc:$field", iri = Some(sub)) +: expandSub(sub, o)
    case JArray(xs)  => xs.zipWithIndex.flatMap {
      case (o: JObject, i) =>
        val sub = s"$subject/$field/$i"
        Seq(row(subject, s"doc:$field", iri = Some(sub)),
          row(sub, "graft:idx", lng = Some(i.toLong))) ++ expandSub(sub, o)
      case (JString(s), _) => Seq(row(subject, s"doc:$field", str = Some(s)))
      case (JInt(n), _)    => Seq(row(subject, s"doc:$field", lng = Some(n.toLong)))
      case (JDouble(d), _) => Seq(row(subject, s"doc:$field", dbl = Some(d)))
      case (JBool(b), _)   => Seq(row(subject, s"doc:$field", bool = Some(b)))
      case _ => Seq.empty
    }
    case _ => Seq.empty
  }

  private def expandSub(subject: String, o: JObject): Seq[Row] =
    o.obj.flatMap { case (f, v) => value(subject, f, v) }

  private def row(s: String, p: String, iri: Option[String] = None,
                  str: Option[String] = None, dbl: Option[Double] = None,
                  lng: Option[Long] = None, bool: Option[Boolean] = None): Row =
    Row("instance", s, p,
      if (iri.isDefined) "i" else "l",
      iri.orNull,
      if (iri.isDefined) null
      else if (str.isDefined) "xsd:string"
      else if (dbl.isDefined) "xsd:double"
      else if (lng.isDefined) "xsd:integer"
      else if (bool.isDefined) "xsd:boolean" else null,
      str.orNull,
      dbl.map(java.lang.Double.valueOf).orNull,
      lng.map(java.lang.Long.valueOf).orNull,
      null,
      bool.map(java.lang.Boolean.valueOf).orNull,
      null,
      null)

  /** Bulk insert: Dataset of JSON strings → EAV triples DataFrame.
    * Parsing + id-gen + expansion run inside mapPartitions (scales out;
    * no driver round-trip). */
  def insertAll(docs: Dataset[String], docType: String, key: KeyStrategy): DataFrame = {
    val spark = docs.sparkSession
    val rows = docs.mapPartitions { it =>
      it.flatMap { s =>
        JsonMethods.parse(s) match {
          case o: JObject => expand(docType, genId(docType, o, key), o)
          case _ => Seq.empty
        }
      }
    }(Encoders.row(Eav.schema))
    spark.createDataFrame(rows.rdd, Eav.schema)
  }

  /** Reassemble one document (recursive over subdocument edges). */
  def read(graph: DataFrame, id: String): JValue = {
    val triples = graph
      .filter(col("s") === id || col("s").startsWith(id + "/"))
      .select("s", "p", "o_kind", "o_iri", "o_typ", "o_str", "o_dbl", "o_lng", "o_bool")
      .collect()
    def assemble(subject: String): JValue = {
      val mine = triples.filter(_.getString(0) == subject)
      val fields: List[(String, JValue)] = mine.toList.flatMap { r =>
        val p = r.getString(1)
        if (p == "rdf:type" || p == "graft:idx") None
        else {
          // any-prefix strip (doc:, tpch:, …) — same field naming as
          // the WOQL ReadDocument projection, so a document reads the
          // same through both surfaces
          val field = p.replaceFirst("^[^:]*:", "")
          val v: JValue =
            if (r.getString(2) == "i") assemble(r.getString(3))
            else if (r.getString(5) != null) JString(r.getString(5))
            else if (!r.isNullAt(6)) JDouble(r.getDouble(6))
            else if (!r.isNullAt(7)) JInt(BigInt(r.getLong(7)))
            else if (!r.isNullAt(8)) JBool(r.getBoolean(8))
            else JNull
          Some(field -> v)
        }
      }
      // collapse repeated fields (arrays) back into JArray
      val grouped = fields.groupBy(_._1)
      JObject(fields.map(_._1).distinct.map { f =>
        grouped(f) match {
          case List((_, v)) => f -> v
          case many => f -> JArray(many.map(_._2))
        }
      })
    }
    assemble(id)
  }

  def readJson(graph: DataFrame, id: String): String =
    JsonMethods.compact(JsonMethods.render(read(graph, id)))

  /** Paged root-id listing for a document type — id-ordered so paging
    * is DETERMINISTIC across requests (the reference's
    * GET-documents-by-type skip/count contract). Subdocument subjects
    * (`root/...`) never carry the type triple, so only roots list. */
  def listIds(graph: DataFrame, docType: String,
              skip: Int, count: Int): Seq[String] =
    graph.filter(col("p") === "rdf:type" && col("o_kind") === "i" &&
        col("o_iri") === s"doc:$docType")
      .select(col("s")).distinct().orderBy(col("s"))
      .offset(skip).limit(count)
      .collect().map(_.getString(0)).toSeq

  /** Staged removal of a document subgraph. */
  def delete(graph: DataFrame, id: String): DataFrame =
    graph.filter(col("s") === id || col("s").startsWith(id + "/"))

  /** Bulk flat view: one row per document with a map of scalar fields —
    * the analytical "document table" projection. */
  def flatView(graph: DataFrame): DataFrame =
    graph.filter(col("o_kind") === "l")
      // repeated predicates (arrays) first collapse per (s, p) — a map
      // must not see duplicate keys
      .groupBy(col("s"), col("p"))
      .agg(concat_ws(",", sort_array(collect_list(
        coalesce(col("o_str"), col("o_lng").cast("string"),
          col("o_dbl").cast("string"), col("o_bool").cast("string"))))).as("v"))
      .groupBy(col("s"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("v")))).as("fields"))
}
