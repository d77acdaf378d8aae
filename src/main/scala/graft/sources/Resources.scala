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
        val landed = land(spark, "inline", md5Hex(content),
          () => new java.io.ByteArrayInputStream(
            content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        readLanded(spark, landed, header)
      case r if r.startsWith("http://") || r.startsWith("https://") =>
        val landed = land(spark, "http", md5Hex(r), () => {
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
    * Content-addressed: `key` is md5 of the inline content / the URL, so a
    * repeated `get` of the same resource reuses the landed file instead of
    * growing the landing dir without bound. (URL-keyed caching trades
    * freshness for idempotence: a changed remote body re-fetches only after
    * the landing dir is cleared — same trade a layer cache makes.) The copy
    * goes through a
    * process-unique temp name and an atomic rename, so a concurrent lander
    * of the same key never exposes a half-written file. */
  private def land(spark: SparkSession, tag: String, key: String,
                   open: () => java.io.InputStream,
                   ext: String = "csv"): String = {
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val dest = new Path(dir, s"res_${tag}_$key.$ext")
    if (fs.exists(dest)) return dest.toString
    val tmp = new Path(dir, s".res_${tag}_${key}_${System.nanoTime()}.tmp")
    val in = open()
    val out = fs.create(tmp, true)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally { try in.close() finally out.close() }
    if (!fs.rename(tmp, dest) && !fs.exists(dest))
      throw new java.io.IOException(s"failed to land resource at $dest")
    dest.toString
  }

  /** JSON-lines resource (the reference's panda_json family) — same
    * resolution forms as [[csv]]; a JSON-lines file IS line-splittable,
    * so the path/file form reads fully distributed. */
  def jsonLines(spark: SparkSession, resource: String): DataFrame =
    resource match {
      case r if r.startsWith("inline:") =>
        val content = r.stripPrefix("inline:")
        val landed = land(spark, "inlinej", md5Hex(content),
          () => new java.io.ByteArrayInputStream(
            content.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          ext = "json")
        spark.read.json(landed)
      case r if r.startsWith("http://") || r.startsWith("https://") =>
        val landed = land(spark, "httpj", md5Hex(r), () => {
          val conn = new java.net.URL(r).openConnection()
          conn.setConnectTimeout(ConnectTimeoutMs)
          conn.setReadTimeout(ReadTimeoutMs)
          conn.getInputStream
        }, ext = "json")
        spark.read.json(landed)
      case r => spark.read.json(r.stripPrefix("file://"))
    }

  /** XML resource — same resolution forms as [[csv]]. Spark 4 ships the
    * XML data source built-in (spark-sql); reads are distributed and
    * split per `rowTag` element, so a large landed/object-store XML
    * file still parallelizes across executors. */
  def xml(spark: SparkSession, resource: String, rowTag: String): DataFrame = {
    def rd(p: String): DataFrame =
      spark.read.format("xml").option("rowTag", rowTag).load(p)
    resource match {
      case r if r.startsWith("inline:") =>
        val content = r.stripPrefix("inline:")
        rd(land(spark, "inlinex", md5Hex(content),
          () => new java.io.ByteArrayInputStream(
            content.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          ext = "xml"))
      case r if r.startsWith("http://") || r.startsWith("https://") =>
        rd(land(spark, "httpx", md5Hex(r), () => {
          val conn = new java.net.URL(r).openConnection()
          conn.setConnectTimeout(ConnectTimeoutMs)
          conn.setReadTimeout(ReadTimeoutMs)
          conn.getInputStream
        }, ext = "xml"))
      case r => rd(r.stripPrefix("file://"))
    }
  }

  /** Whole resource body as a driver string (turtle `get` — the parser
    * is a driver tokenizer; bulk loads use the EAV encode path). Same
    * resource forms as [[csv]]; http bodies land content-addressed
    * first, so repeats don't re-fetch. */
  def text(spark: SparkSession, resource: String): String = resource match {
    case r if r.startsWith("inline:") => r.stripPrefix("inline:")
    case r if r.startsWith("http://") || r.startsWith("https://") =>
      val landed = land(spark, "http", md5Hex(r), () => {
        val conn = new java.net.URL(r).openConnection()
        conn.setConnectTimeout(ConnectTimeoutMs)
        conn.setReadTimeout(ReadTimeoutMs)
        conn.getInputStream
      })
      readText(spark, landed)
    case r => readText(spark, r.stripPrefix("file://"))
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def readLanded(spark: SparkSession, path: String,
                         header: Boolean): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("multiLine", "true") // RFC-4180 quoted newlines
      .option("escape", "\"")      // standard CSV "" escaping
      .csv(path)
}
