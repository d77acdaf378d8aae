package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.12): image/audio/video payloads
  * ride as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract run per-partition over iterator batches (the Scala
  * analogue of a pandas-batch UDF).
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic "dimensions" from an
  * md5 of the payload bytes. The Spark-side plumbing — binary schema,
  * partition batching, metadata struct shape — is real and tested, and
  * the stub is the only thing to swap for a real codec. */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("format", StringType)))

  /** Attach a binary payload column (here: utf-8 of text — a stand-in
    * for real image bytes living in parquet `binary`). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))

  /** STUB decoder: deterministic pseudo-dimensions from payload md5.
    * Swap this function for a real image decode; the pipeline shape
    * (Iterator[Row] => Iterator[Row] per partition) stays. */
  def fakeDecode(payload: Array[Byte]): (Long, Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hv = java.lang.Long.parseLong(
      md.take(4).map("%02x".format(_)).mkString, 16)
    (640 + hv % 1280, 480 + (hv / 1280) % 720, "fake/rgb8")
  }

  /** Per-partition batch "decode": the mapPartitions shape a real codec
    * would use (amortized library init per partition, streaming rows). */
  def decodeMeta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        // per-partition init happens here (codec handles, buffers, …)
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, fmt) = fakeDecode(bytes)
          Row(id, bytes.length.toLong, w, h, fmt)
        }
      }(Encoders.row(metaSchema))
    spark.createDataFrame(rows.rdd, metaSchema)
  }

  val featSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("j", LongType),
    StructField("v", DoubleType)))

  /** Deterministic per-payload FEATURE VECTOR stub — the
    * media-embedding slot (image/audio → float features feeding the
    * similarity / embedding-dedup operators downstream). Same
    * mapPartitions batch shape as [[decodeMeta]] (per-partition codec
    * init, streaming rows); emitted exploded as (doc_id, j, v) so the
    * oracle compares scalars, not array renderings. Feature j derives
    * from md5(payload ++ ":j") — replayable bit-for-bit in SQL. */
  def extractFeatures(withBytes: DataFrame, dims: Int = 8): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          (0 until dims).iterator.map { j =>
            md.reset()
            md.update(bytes)
            md.update(s":$j".getBytes("UTF-8"))
            val hv = java.lang.Long.parseLong(
              md.digest().take(4).map("%02x".format(_)).mkString, 16)
            Row(id, j.toLong, hv.toDouble / 4294967296.0)
          }
        }
      }(Encoders.row(featSchema))
    spark.createDataFrame(rows.rdd, featSchema)
      .select(col("doc_id"), col("j"), round(col("v"), 6).as("v"))
  }

  /** Media embeddings → ANN: assemble [[extractFeatures]]' exploded
    * (doc_id, j, v) rows into ordered vectors and run exact cosine
    * top-k over them — the image/audio-similarity composition
    * (media → embedding → nearest-neighbors) end to end. Swapping
    * `fakeDecode`/the feature stub for a real encoder changes ONLY the
    * per-partition batch body; this plan — one groupBy to build
    * vectors, then the broadcast-query corpus scan of bruteTopK (and
    * the IVF/PQ tiers beyond it) — is the production shape. Features
    * are rounded once (6 dp) BEFORE vector assembly so both engines
    * dot identical doubles. */
  def embedTopK(docs: DataFrame, isQuery: org.apache.spark.sql.Column,
                k: Int, dims: Int = 8): DataFrame = {
    val vecs = extractFeatures(withPayload(docs), dims)
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("v")))),
        s => s.getField("v")).as("embedding"))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    Similarity.bruteTopK(vecs, isQuery, k)
  }

  /** Deterministic frame-sampling stub: pick every `stride`-th byte
    * offset as a "frame" index (shape of video frame sampling). */
  def sampleFrames(withBytes: DataFrame, stride: Int): DataFrame =
    withBytes.select(col("doc_id"),
      explode(sequence(lit(0), length(col("payload")).cast(LongType) - 1,
        lit(stride.toLong))).as("frame_offset"))
}
