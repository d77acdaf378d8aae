package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resolution of `get`/`put` tabular resources (SURVEY §2.1; reference:
  * core/query/resource.pl — remote URLs, posted files, local paths).
  *
  * Spark-first shapes:
  *  - plain path / `file://` → distributed `spark.read.csv` (the bulk
  *    path — at 100 TB the resource lives in object storage and every
  *    executor reads its split);
  *  - `inline:<content>` → the reference's POST-body file: the content
  *    arrived with the request, so it is parallelized from the driver
  *    (requests are small by construction);
  *  - `http(s)://` → driver-side fetch, then distributed parse. A remote
  *    CSV endpoint is not splittable — for big remote data, land it in
  *    shared storage first (documented; same trade the reference makes
  *    by streaming the URL through one loader process).
  */
object Resources {

  def csv(spark: SparkSession, resource: String, header: Boolean): DataFrame =
    resource match {
      case r if r.startsWith("inline:") =>
        fromString(spark, r.stripPrefix("inline:"), header)
      case r if r.startsWith("http://") || r.startsWith("https://") =>
        val src = scala.io.Source.fromURL(r, "UTF-8")
        try fromString(spark, src.mkString, header) finally src.close()
      case r if r.startsWith("file://") =>
        spark.read.option("header", header.toString).csv(r.stripPrefix("file://"))
      case r =>
        spark.read.option("header", header.toString).csv(r)
    }

  private def fromString(spark: SparkSession, content: String,
                         header: Boolean): DataFrame = {
    import spark.implicits._
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    spark.read.option("header", header.toString).csv(lines.toDS())
  }
}
