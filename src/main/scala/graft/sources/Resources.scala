package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Resolution of `get`/`put` tabular resources (SURVEY §2.1; reference:
  * core/query/resource.pl — remote URLs, posted files, local paths).
  *
  * Spark-first shapes:
  *  - plain path / `file://` → distributed `spark.read.csv` (the bulk
  *    path — at 100 TB the resource lives in object storage and every
  *    executor reads its split);
  *  - `inline:<content>` → the reference's POST-body file: the content
  *    arrived with the request; it is LANDED in shared storage and read
  *    back with the full RFC-4180 parser (multiLine), so quoted fields
  *    with embedded newlines survive;
  *  - `http(s)://` → the response body is STREAMED byte-for-byte into
  *    shared storage (hadoop FileSystem — never a driver String, so a
  *    multi-GB remote file costs O(buffer) driver heap, not O(file)),
  *    with connect/read timeouts, then parsed distributed from there.
  *
  * Landed files are parsed with `multiLine=true`: an RFC-4180 file with
  * quoted newlines is inherently not line-splittable, so per-file parse
  * is the correct (and only correct) shape; big landed files can be
  * re-landed as many files upstream when splittability matters.
  */
object Resources {

  /** Where fetched/inline resources land. Any hadoop-visible scheme
    * works (hdfs://, s3a://, local path); defaults under the EAV cache. */
  def landingDir: String =
    sys.env.getOrElse("GRAFT_LANDING_DIR", graft.Graft.cacheRoot + "/landed")

  private val ConnectTimeoutMs = 10000
  private val ReadTimeoutMs = 60000

  def csv(spark: SparkSession, resource: String, header: Boolean): DataFrame =
    resource match {
      case r if r.startsWith("inline:") =>
        val content = r.stripPrefix("inline:")
        val landed = land(spark, "inline",
          () => new java.io.ByteArrayInputStream(
            content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        readLanded(spark, landed, header)
      case r if r.startsWith("http://") || r.startsWith("https://") =>
        val landed = land(spark, "http", () => {
          val conn = new java.net.URL(r).openConnection()
          conn.setConnectTimeout(ConnectTimeoutMs)
          conn.setReadTimeout(ReadTimeoutMs)
          conn.getInputStream
        })
        readLanded(spark, landed, header)
      case r if r.startsWith("file://") =>
        spark.read.option("header", header.toString).csv(r.stripPrefix("file://"))
      case r =>
        spark.read.option("header", header.toString).csv(r)
    }

  /** Stream a resource body into shared storage; returns the landed path.
    * Content-addressed-ish name (nanoTime) under `landingDir`. */
  private def land(spark: SparkSession, tag: String,
                   open: () => java.io.InputStream): String = {
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val dest = new Path(dir, s"res_${tag}_${System.nanoTime()}.csv")
    val in = open()
    val out = fs.create(dest, true)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally { try in.close() finally out.close() }
    dest.toString
  }

  private def readLanded(spark: SparkSession, path: String,
                         header: Boolean): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("multiLine", "true") // RFC-4180 quoted newlines
      .option("escape", "\"")      // standard CSV "" escaping
      .csv(path)
}
