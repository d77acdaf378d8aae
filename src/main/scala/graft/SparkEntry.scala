package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises one operator of the SURVEY §2
  * inventory through the WOQL→DataFrame compiler (or, for the
  * LLM-pipeline extensions, through the relational operator library);
  * `oracleSql` holds the DuckDB-equivalent SQL over the raw parquet. */
object SparkEntry {

  private def wctx(spark: SparkSession, dir: String): Ctx = Graft.ctx(spark, dir)

  /** Run a WOQL query and project binding variables to plain typed
    * columns (varName -> (outName, extractor)). */
  private def woql(spark: SparkSession, dir: String, q: Woql)(
      out: (String, org.apache.spark.sql.Column)*): DataFrame = {
    implicit val ctx: Ctx = wctx(spark, dir)
    Compiler.run(q).select(out.map { case (n, c) => c.as(n) }: _*)
  }

  private def vStr(v: String) = col(v).getField("str")
  private def vDbl(v: String) = col(v).getField("dbl")
  private def vLng(v: String) = col(v).getField("lng")
  private def vIri(v: String) = col(v).getField("iri")
  private def vTs(v: String)  = col(v).getField("ts")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY §7.4 minimum slice: storage → EAV → compiler core → join → filter. */
  def entry(spark: SparkSession): DataFrame =
    queries("woql_flagship")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- WOQL ---

  private val flagshipAst: Woql =
    Select(Seq("Name", "Bal"), And(Seq(
      TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer")),
      TriplePat(V("C"), Node("tpch:c_nationkey"), V("N")),
      TriplePat(V("N"), Node("tpch:n_name"), Str("NATION_7")),
      TriplePat(V("C"), Node("tpch:c_acctbal"), V("Bal")),
      Cmp(">", V("Bal"), Dbl(500.0)),
      TriplePat(V("C"), Node("tpch:c_name"), V("Name")))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "woql_flagship" -> ((s, d) => woql(s, d, flagshipAst)(
      "c_name" -> vStr("Name"), "c_acctbal" -> vDbl("Bal")))
  )

  def oracleSql: Map[String, String] = Map(
    "woql_flagship" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin
  )
}
