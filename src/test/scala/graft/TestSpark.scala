package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.Ctx
import graft.storage.Eav

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Triples DF from simple tuples (instance graph, IRI or string objects). */
  def triples(rows: (String, String, Any)*): DataFrame = {
    val data = rows.map { case (s, p, o) =>
      o match {
        case i: String if i.startsWith(":") => // IRI convention: ":x"
          Row("instance", s, p, "i", i, null, null, null, null, null, null, null, null)
        case str: String =>
          Row("instance", s, p, "l", null, "xsd:string", str, null, null, null, null, null, null)
        case d: Double =>
          Row("instance", s, p, "l", null, "xsd:double", null, java.lang.Double.valueOf(d), null, null, null, null, null)
        case l: Int =>
          Row("instance", s, p, "l", null, "xsd:integer", null, null, java.lang.Long.valueOf(l.toLong), null, null, null, null)
        case l: Long =>
          Row("instance", s, p, "l", null, "xsd:integer", null, null, java.lang.Long.valueOf(l), null, null, null, null)
        case b: Boolean =>
          Row("instance", s, p, "l", null, "xsd:boolean", null, null, null, null, java.lang.Boolean.valueOf(b), null, null)
        case d: java.math.BigDecimal =>
          Row("instance", s, p, "l", null, "xsd:decimal", null, null, null, null, null, null, d.setScale(18))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), Eav.schema)
  }

  def ctxOf(t: DataFrame): Ctx = {
    import spark.implicits._
    Ctx(spark, t, Seq.empty[(String, String)].toDF("sub", "sup"))
  }
}
