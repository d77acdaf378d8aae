package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.12): image/audio/video payloads
  * ride as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract run per-partition over iterator batches (the Scala
  * analogue of a pandas-batch UDF).
  *
  * IMAGE decode is REAL: [[ImageIoCodec]] parses PNG/BMP/GIF/JPEG byte
  * streams with the JDK's own `javax.imageio` readers. AUDIO decode is
  * REAL too: [[WavCodec]] parses WAV/AIFF/AU with `javax.sound.sampled`
  * (frame count + sample rate — no native libraries either way). Only
  * VIDEO remains STUBBED (`fakeDecode` derives deterministic
  * "dimensions" from an md5 of the payload — no pure-JDK video reader
  * exists); the [[Codec]] trait is the swap point, and the Spark-side
  * plumbing — binary schema, partition batching, metadata struct
  * shape — is identical for all of them. */
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

  /** Pluggable media codec: Some((width, height, format)) when the
    * payload is a container this codec understands, None otherwise
    * (the caller decides the fallback). Serializable — instances ship
    * to executors inside the mapPartitions closure. */
  trait Codec extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Long, Long, String)]
  }

  /** REAL pure-JVM image codec over `javax.imageio` — the readers the
    * JDK ships (PNG, BMP, GIF, JPEG), no native libraries. Payloads
    * are magic-sniffed first so non-image bytes never enter the
    * reader; a sniff hit that still fails to parse (e.g. text that
    * happens to start with "BM") returns None and falls through to
    * the caller's fallback. */
  object ImageIoCodec extends Codec {
    private def sniff(b: Array[Byte]): Option[String] =
      if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') Some("image/png")
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') Some("image/bmp")
      else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8) Some("image/jpeg")
      else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8') Some("image/gif")
      else None
    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      sniff(bytes).flatMap { fmt =>
        try {
          javax.imageio.ImageIO.setUseCache(false) // no temp-file cache
          Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            .map(i => (i.getWidth.toLong, i.getHeight.toLong, fmt))
        } catch { case _: Exception => None }
      }
  }

  /** REAL pure-JVM AUDIO codec over `javax.sound.sampled` — the
    * JDK's own WAV/AIFF/AU readers, no native libraries. For audio the
    * generic (width, height) dimension slots carry (frame count,
    * sample rate in Hz): the two numbers every audio pipeline filter
    * keys on (duration = frames / rate). RIFF/AIFF/AU magic-sniffed
    * first, parse failures fall through to the caller's fallback. */
  object WavCodec extends Codec {
    private def sniff(b: Array[Byte]): Option[String] =
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') Some("audio/wav")
      else if (b.length >= 4 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M') Some("audio/aiff")
      else if (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
        b(3) == 'd') Some("audio/basic")
      else None
    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      sniff(bytes).flatMap { fmt =>
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          val frames = aff.getFrameLength.toLong
          val rate = aff.getFormat.getSampleRate.toLong
          if (frames >= 0 && rate > 0) Some((frames, rate, fmt)) else None
        } catch { case _: Exception => None }
      }
  }

  /** First-match codec chain — the production default tries every real
    * decoder before the caller falls back to the stub. */
  final case class ChainCodec(codecs: Seq[Codec]) extends Codec {
    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      codecs.iterator.flatMap(_.decode(bytes)).nextOption()
  }

  /** Images then audio, both pure-JDK real decoders. */
  val DefaultCodec: Codec = ChainCodec(Seq(ImageIoCodec, WavCodec))

  /** STUB decoder for non-decodable media: deterministic
    * pseudo-dimensions from payload md5 (VIDEO has no pure-JDK
    * reader — images and audio are real via [[ImageIoCodec]] /
    * [[WavCodec]]). */
  def fakeDecode(payload: Array[Byte]): (Long, Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hv = java.lang.Long.parseLong(
      md.take(4).map("%02x".format(_)).mkString, 16)
    (640 + hv % 1280, 480 + (hv / 1280) % 720, "fake/rgb8")
  }

  /** Per-partition decode as a STREAM-SAFE transform (no RDD
    * round-trip): works identically on a batch frame or a streaming
    * micro-batch — the codec slot is stateless and narrow. */
  def decodeMetaDs(withBytes: DataFrame,
                   codec: Codec = DefaultCodec): DataFrame =
    withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        // per-partition init happens here (codec handles, buffers, …)
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, fmt) = codec.decode(bytes).getOrElse(fakeDecode(bytes))
          Row(id, bytes.length.toLong, w, h, fmt)
        }
      }(Encoders.row(metaSchema))

  /** Per-partition batch decode: real codec first, md5 stub for
    * payloads no codec claims (mapPartitions amortizes codec init per
    * partition, rows stream through). */
  def decodeMeta(withBytes: DataFrame,
                 codec: Codec = DefaultCodec): DataFrame = {
    val spark = withBytes.sparkSession
    spark.createDataFrame(decodeMetaDs(withBytes, codec).rdd, metaSchema)
  }

  /** REAL image payloads: one deterministic RGB PNG per document,
    * dimensions closed-form in doc_id (width 1+id%64, height 1+id%48)
    * so an oracle can predict them without touching the bytes. The
    * encode runs ON THE EXECUTORS through the same mapPartitions slot
    * a production ingest would use; the payload is a genuine PNG byte
    * stream that [[ImageIoCodec]] (or any other reader) parses. */
  def withPngPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = (1 + id % 64).toInt
        val h = (1 + id % 48).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 2654435761L + x * 31 + y) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  /** REAL audio payloads: one deterministic 16-bit PCM WAV per
    * document, parameters closed-form in doc_id (rate 8000 Hz,
    * channels 1 + id%2, frames 100 + id%400) so an oracle predicts
    * frame count / rate / byte size without touching the bytes
    * (n_bytes = 44-byte RIFF header + frames·channels·2). Hand-rolled
    * canonical RIFF header on the executors — and [[WavCodec]]
    * (javax.sound.sampled) genuinely parses the result. */
  def withWavPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val channels = (1 + id % 2).toInt
        val frames = (100 + id % 400).toInt
        val rate = 8000
        val dataLen = frames * channels * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1.toShort)                   // PCM
          .putShort(channels.toShort)
          .putInt(rate)
          .putInt(rate * channels * 2)           // byte rate
          .putShort((channels * 2).toShort)      // block align
          .putShort(16.toShort)                  // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < frames * channels) {
          bb.putShort(((id * 31 + i * 7) % 32768).toShort)
          i += 1
        }
        Row(id, bb.array())
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
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
