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
  * (frame count + sample rate — no native libraries either way).
  * VIDEO container METADATA is real as well: [[Mp4Codec]] walks the
  * ISO-BMFF/MP4 box structure (duration, timescale, track dimensions)
  * pure-JDK. Only video FRAME decode remains STUBBED (`fakeDecode`
  * derives deterministic "dimensions" from an md5 of the payload — no
  * pure-JDK frame decoder exists); the [[Codec]] trait is the swap
  * point, and the Spark-side plumbing — binary schema, partition
  * batching, metadata struct shape — is identical for all of them. */
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

  /** REAL pure-JDK VIDEO CONTAINER metadata codec: walks the
    * ISO-BMFF/MP4 box structure (moov → mvhd for presentation
    * duration/timescale, trak → tkhd for track dimensions, trak →
    * mdia → mdhd for the media clock) with plain ByteBuffer reads —
    * no frame decoding (no pure-JDK frame decoder exists; the frame
    * path stays behind the stub), but duration and dimensions are the
    * two things a pipeline filter keys on and they live entirely in
    * the box headers. Handles 32-bit and `size==1` 64-bit boxes,
    * version-0 and version-1 mvhd/tkhd/mdhd, and picks the first
    * track with nonzero tkhd dimensions (audio tracks carry 0×0). */
  object Mp4Codec extends Codec {

    final case class Mp4Meta(timescale: Long, duration: Long,
                             width: Long, height: Long,
                             mediaTimescale: Long, mediaDuration: Long)

    private def isBmff(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    /** All direct child boxes of [from, to) as (type, bodyStart, end)
      * — bodyStart is AFTER the size+type (+largesize) header. */
    private def boxes(bytes: Array[Byte], from: Int, to: Int)
        : List[(String, Int, Int)] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val out = List.newBuilder[(String, Int, Int)]
      var p = from
      var ok = true
      while (ok && p + 8 <= to) {
        val sz32 = bb.getInt(p).toLong & 0xffffffffL
        val tp = new String(bytes, p + 4, 4, "US-ASCII")
        val (end, body) =
          if (sz32 == 0) (to.toLong, p + 8L) // box extends to EOF
          else if (sz32 == 1 && p + 16 <= to) (p + bb.getLong(p + 8), p + 16L)
          else (p + sz32, p + 8L)
        if (end <= body || end > to) ok = false // corrupt — stop the walk
        else {
          out += ((tp, body.toInt, end.toInt))
          p = end.toInt
        }
      }
      out.result()
    }

    private def find(bs: List[(String, Int, Int)], tp: String) =
      bs.find(_._1 == tp)

    def meta(bytes: Array[Byte]): Option[Mp4Meta] =
      if (!isBmff(bytes)) None
      else try {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        def u32(p: Int): Long = bb.getInt(p).toLong & 0xffffffffL
        for {
          (_, ms, me) <- find(boxes(bytes, 0, bytes.length), "moov")
          moovKids = boxes(bytes, ms, me)
          (_, vs, _) <- find(moovKids, "mvhd")
          // first trak whose tkhd has nonzero dims (the video track)
          vtrak <- moovKids.iterator.filter(_._1 == "trak").flatMap {
            case (_, ts, te) =>
              val kids = boxes(bytes, ts, te)
              for {
                (_, ks, ke) <- find(kids, "tkhd")
                // width/height are the LAST 8 bytes of tkhd in both
                // versions, 16.16 fixed point
                w = u32(ke - 8) >> 16
                h = u32(ke - 4) >> 16
                if w > 0 && h > 0
                (_, ds, de) <- find(kids, "mdia")
                (_, hs, _) <- find(boxes(bytes, ds, de), "mdhd")
              } yield (w, h, hs)
          }.nextOption()
        } yield {
          val (w, h, hs) = vtrak
          // mvhd v0: verflags ctime(4) mtime(4) timescale duration(4);
          // v1 widens the times to 8 bytes
          val (ts, dur) =
            if ((bytes(vs) & 0xff) == 1) (u32(vs + 20), bb.getLong(vs + 24))
            else (u32(vs + 12), u32(vs + 16))
          val (mts, mdur) =
            if ((bytes(hs) & 0xff) == 1) (u32(hs + 20), bb.getLong(hs + 24))
            else (u32(hs + 12), u32(hs + 16))
          Mp4Meta(ts, dur, w, h, mts, mdur)
        }
      } catch { case _: Exception => None }

    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      meta(bytes).map(m => (m.width, m.height, "video/mp4"))
  }

  /** REAL pure-JDK EBML (Matroska/WebM) container metadata codec —
    * the second video container next to [[Mp4Codec]]: walks EBML
    * elements (variable-length IDs and sizes), reading the Segment's
    * Info (TimestampScale, Duration) and the first VIDEO TrackEntry's
    * PixelWidth/PixelHeight; the EBML header's DocType distinguishes
    * webm from matroska. No frame decoding — same contract as MP4. */
  object MkvCodec extends Codec {

    final case class MkvMeta(timescaleNs: Long, durationUnits: Long,
                             width: Long, height: Long, docType: String)

    private def isEbml(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

    /** (value, bytesRead) of the vint at `p`; for IDs the marker bits
      * stay in the value (the on-disk class-ID convention), for sizes
      * they are stripped. */
    private def vint(b: Array[Byte], p: Int, keepMarker: Boolean): (Long, Int) = {
      val first = b(p) & 0xff
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      require(len >= 1 && len <= 8 && p + len <= b.length, "bad EBML vint")
      var v = if (keepMarker) first.toLong
        else (first & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
      (v, len)
    }

    /** Direct child elements of [from, to) as (id, bodyStart, end). */
    private def kids(b: Array[Byte], from: Int, to: Int)
        : List[(Long, Int, Int)] = {
      val out = List.newBuilder[(Long, Int, Int)]
      var p = from
      var ok = true
      while (ok && p < to) {
        try {
          val (id, il) = vint(b, p, keepMarker = true)
          val (sz, sl) = vint(b, p + il, keepMarker = false)
          val body = p + il + sl
          val end = body + sz.toInt
          if (end > to || sz < 0) ok = false
          else { out += ((id, body, end)); p = end }
        } catch { case _: Exception => ok = false }
      }
      out.result()
    }

    private def uint(b: Array[Byte], from: Int, to: Int): Long = {
      var v = 0L; var p = from
      while (p < to) { v = (v << 8) | (b(p) & 0xff); p += 1 }
      v
    }

    private def float(b: Array[Byte], from: Int, to: Int): Double =
      (to - from) match {
        case 4 => java.lang.Float.intBitsToFloat(uint(b, from, to).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(uint(b, from, to))
        case _ => Double.NaN
      }

    def meta(bytes: Array[Byte]): Option[MkvMeta] =
      if (!isEbml(bytes)) None
      else try {
        val top = kids(bytes, 0, bytes.length)
        for {
          (_, hs, he) <- top.find(_._1 == 0x1a45dfa3L)
          (_, ss, se) <- top.find(_._1 == 0x18538067L) // Segment
          segKids = kids(bytes, ss, se)
          (_, is, ie) <- segKids.find(_._1 == 0x1549a966L) // Info
          (_, ts, te) <- segKids.find(_._1 == 0x1654ae6bL) // Tracks
          video <- kids(bytes, ts, te).iterator
            .filter(_._1 == 0xaeL).flatMap { case (_, es, ee) => // TrackEntry
              val ek = kids(bytes, es, ee)
              val isVideo = ek.find(_._1 == 0x83L) // TrackType
                .exists { case (_, f, t) => uint(bytes, f, t) == 1L }
              if (!isVideo) None
              else for {
                (_, vs, ve) <- ek.find(_._1 == 0xe0L) // Video
                vk = kids(bytes, vs, ve)
                (_, wf, wt) <- vk.find(_._1 == 0xb0L) // PixelWidth
                (_, hf, ht) <- vk.find(_._1 == 0xbaL) // PixelHeight
              } yield (uint(bytes, wf, wt), uint(bytes, hf, ht))
            }.nextOption()
        } yield {
          val infoKids = kids(bytes, is, ie)
          val scale = infoKids.find(_._1 == 0x2ad7b1L)
            .map { case (_, f, t) => uint(bytes, f, t) }.getOrElse(1000000L)
          val dur = infoKids.find(_._1 == 0x4489L)
            .map { case (_, f, t) => math.round(float(bytes, f, t)) }
            .getOrElse(0L)
          val docType = kids(bytes, hs, he).find(_._1 == 0x4282L)
            .map { case (_, f, t) =>
              new String(bytes, f, t - f, "US-ASCII") }.getOrElse("matroska")
          MkvMeta(scale, dur, video._1, video._2, docType)
        }
      } catch { case _: Exception => None }

    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      meta(bytes).map(m => (m.width, m.height, s"video/${m.docType}"))
  }

  /** RIFF/AVI container with MJPEG frames — the first video codec in
    * the chain whose FRAMES actually decode (per-frame JPEG via
    * javax.imageio), retiring `fakeDecode` for the AVI video story.
    * Walker shares [[WavCodec]]'s RIFF family: little-endian fourcc
    * chunks, LIST nesting, even-byte padding. */
  object AviCodec extends Codec {

    final case class AviMeta(microSecPerFrame: Long, totalFrames: Long,
                             width: Long, height: Long, moviFrames: Long,
                             framesDecoded: Long, frameW: Long, frameH: Long)

    private def sniff(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "AVI "

    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

    /** Direct chunks of [from, to): (fourcc, bodyStart, bodyEnd).
      * For LIST chunks the fourcc is the LIST TYPE and the body starts
      * after it — callers never see the generic "LIST" id. */
    private def chunks(b: Array[Byte], from: Int, to: Int)
        : List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var p = from
      while (p + 8 <= to) {
        val id = new String(b, p, 4, "US-ASCII")
        val size = u32(b, p + 4).toInt
        val body = p + 8
        val end = math.min(body + size, to)
        if (id == "LIST" && size >= 4)
          out += ((new String(b, body, 4, "US-ASCII"), body + 4, end))
        else out += ((id, body, end))
        p = body + size + (size & 1) // chunks pad to even offsets
      }
      out.result()
    }

    /** The MJPEG frame payloads (movi `00dc` chunk bodies), in order. */
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      if (!sniff(bytes)) Nil
      else chunks(bytes, 12, bytes.length).find(_._1 == "movi").toSeq
        .flatMap { case (_, ms, me) =>
          chunks(bytes, ms, me).collect { case ("00dc", f, t) =>
            java.util.Arrays.copyOfRange(bytes, f, t)
          }
        }

    def meta(bytes: Array[Byte]): Option[AviMeta] =
      if (!sniff(bytes)) None
      else try {
        val top = chunks(bytes, 12, bytes.length)
        for {
          (_, hs, he) <- top.find(_._1 == "hdrl")
          (_, as_, _) <- chunks(bytes, hs, he).find(_._1 == "avih")
        } yield {
          val fs = frames(bytes)
          // REAL per-frame decode: every 00dc body through ImageIO
          javax.imageio.ImageIO.setUseCache(false)
          val decoded = fs.flatMap { f =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f)))
          }
          AviMeta(
            microSecPerFrame = u32(bytes, as_),
            totalFrames = u32(bytes, as_ + 16),
            width = u32(bytes, as_ + 32),
            height = u32(bytes, as_ + 36),
            moviFrames = fs.size.toLong,
            framesDecoded = decoded.size.toLong,
            frameW = decoded.headOption.map(_.getWidth.toLong).getOrElse(0L),
            frameH = decoded.headOption.map(_.getHeight.toLong).getOrElse(0L))
        }
      } catch { case _: Exception => None }

    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      meta(bytes).map(m => (m.width, m.height, "video/avi"))
  }

  /** First-match codec chain — the production default tries every real
    * decoder before the caller falls back to the stub. */
  final case class ChainCodec(codecs: Seq[Codec]) extends Codec {
    def decode(bytes: Array[Byte]): Option[(Long, Long, String)] =
      codecs.iterator.flatMap(_.decode(bytes)).nextOption()
  }

  /** Images, audio, then video containers (MP4 + Matroska/WebM) — all
    * pure-JDK real decoders (video = container metadata; frames stay
    * stubbed). */
  val DefaultCodec: Codec =
    ChainCodec(Seq(ImageIoCodec, WavCodec, AviCodec, Mp4Codec, MkvCodec))

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

  /** REAL decode → nearest-neighbor thumbnail over a binary image
    * column: ImageIO parses the actual PNG/BMP/GIF bytes on the
    * executors, the resample maps thumb pixel (X,Y) to source pixel
    * (⌊X·w/tw⌋, ⌊Y·h/th⌋) — an exact integer mapping an oracle can
    * replay — and each thumbnail is summarized as the order-weighted
    * pixel checksum Σ rgb(X,Y)·(X + tw·Y + 1), so every resampled
    * pixel is verified without shipping rasters. Same mapPartitions
    * batch slot as [[decodeMeta]] (per-partition codec init, rows
    * stream through — the production decode/resize shape for binary
    * multimodal columns; the driver never sees a pixel). */
  def resizeThumb(withBytes: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw >= 1 && th >= 1)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("src_w", LongType),
      StructField("src_h", LongType), StructField("thumb_w", LongType),
      StructField("thumb_h", LongType), StructField("checksum", LongType)))
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val w = img.getWidth; val h = img.getHeight
          var cs = 0L
          var y = 0
          while (y < th) {
            val sy = (y.toLong * h / th).toInt
            var x = 0
            while (x < tw) {
              val sx = (x.toLong * w / tw).toInt
              cs += (img.getRGB(sx, sy) & 0xffffff).toLong * (x + tw * y + 1)
              x += 1
            }
            y += 1
          }
          Row(id, w.toLong, h.toLong, tw.toLong, th.toLong, cs)
        }
      }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
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

  /** REAL video-container payloads: one minimal ISO-BMFF/MP4 box
    * structure per document, every field closed-form in doc_id —
    * ftyp(16) + moov(8 + mvhd(108) + trak(8 + tkhd(92) + mdia(8 +
    * mdhd(32)))) = 272 bytes exactly, so even n_bytes is
    * oracle-predictable. Presentation clock: timescale 1000, duration
    * 1000 + id%9000 (so duration_ms = duration); media clock: 48000,
    * duration·48; track dims (320 + id%1280) × (240 + id%720). The
    * boxes are written programmatically ON THE EXECUTORS and
    * [[Mp4Codec]] genuinely walks the result. */
  def withMp4Payload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val duration = (1000 + id % 9000).toInt
        val w = (320 + id % 1280).toInt
        val h = (240 + id % 720).toInt
        val bb = java.nio.ByteBuffer.allocate(272) // big-endian default
        def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
        bb.putInt(16); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
        bb.putInt(256); fourcc("moov")
        bb.putInt(108); fourcc("mvhd")
        bb.putInt(0)                       // version 0 + flags
        bb.putInt(0).putInt(0)             // ctime, mtime
        bb.putInt(1000).putInt(duration)   // timescale, duration
        bb.putInt(0x00010000)              // rate 1.0
        bb.putShort(0x0100.toShort)        // volume 1.0
        bb.put(new Array[Byte](10))        // reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)              // identity matrix
        bb.put(new Array[Byte](24))        // pre_defined
        bb.putInt(2)                       // next_track_ID
        bb.putInt(140); fourcc("trak")
        bb.putInt(92); fourcc("tkhd")
        bb.putInt(0x000007)                // v0, enabled|in-movie|in-preview
        bb.putInt(0).putInt(0)             // ctime, mtime
        bb.putInt(1)                       // track_ID
        bb.putInt(0)                       // reserved
        bb.putInt(duration)                // duration (movie timescale)
        bb.put(new Array[Byte](8))         // reserved
        bb.putShort(0).putShort(0)         // layer, alternate_group
        bb.putShort(0).putShort(0)         // volume (video=0), reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)              // identity matrix
        bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed-point dims
        bb.putInt(40); fourcc("mdia")
        bb.putInt(32); fourcc("mdhd")
        bb.putInt(0)                       // version 0 + flags
        bb.putInt(0).putInt(0)             // ctime, mtime
        bb.putInt(48000)                   // media timescale
        bb.putInt(duration * 48)           // media duration
        bb.putShort(0x55C4.toShort)        // language "und"
        bb.putShort(0)                     // pre_defined
        Row(id, bb.array())
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  /** REAL WebM/Matroska payloads: one minimal EBML structure per
    * document, every field closed-form in doc_id — EBML(DocType webm)
    * + Segment(Info(TimestampScale 1e6, Duration float64 =
    * 1000 + id%9000 ms) + Tracks(video TrackEntry with PixelWidth
    * (320 + id%1280) × PixelHeight (240 + id%720))) = 61 bytes
    * exactly, so n_bytes is oracle-predictable too. Written
    * programmatically ON THE EXECUTORS; [[MkvCodec]] genuinely walks
    * the vint-framed elements back. */
  def withMkvPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val duration = (1000 + id % 9000).toDouble
        val w = (320 + id % 1280).toInt
        val h = (240 + id % 720).toInt
        val bb = java.nio.ByteBuffer.allocate(61) // big-endian default
        def eid(bytes: Int*): Unit = bytes.foreach(b => bb.put(b.toByte))
        def sz(n: Int): Unit = bb.put((0x80 | n).toByte)
        eid(0x1a, 0x45, 0xdf, 0xa3); sz(7)        // EBML header
        eid(0x42, 0x82); sz(4)                    // DocType
        bb.put("webm".getBytes("US-ASCII"))
        eid(0x18, 0x53, 0x80, 0x67); sz(44)       // Segment
        eid(0x15, 0x49, 0xa9, 0x66); sz(19)       // Info
        eid(0x2a, 0xd7, 0xb1); sz(4); bb.putInt(1000000) // TimestampScale
        eid(0x44, 0x89); sz(8); bb.putDouble(duration)   // Duration
        eid(0x16, 0x54, 0xae, 0x6b); sz(15)       // Tracks
        eid(0xae); sz(13)                         // TrackEntry
        eid(0x83); sz(1); bb.put(1.toByte)        // TrackType = video
        eid(0xe0); sz(8)                          // Video
        eid(0xb0); sz(2); bb.putShort(w.toShort)  // PixelWidth
        eid(0xba); sz(2); bb.putShort(h.toShort)  // PixelHeight
        Row(id, bb.array())
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  val mkvSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("timescale_ns", LongType),
    StructField("duration_units", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("format", StringType)))

  /** Full EBML container metadata via [[MkvCodec.meta]] — the
    * Matroska/WebM twin of [[mp4Meta]] (same mapPartitions batch
    * shape; non-EBML payloads dropped). */
  def mkvMeta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          MkvCodec.meta(bytes).map(m =>
            Row(id, bytes.length.toLong, m.timescaleNs, m.durationUnits,
              m.width, m.height, s"video/${m.docType}"))
        }
      }(Encoders.row(mkvSchema))
    spark.createDataFrame(rows.rdd, mkvSchema)
  }

  /** REAL AVI/MJPEG payloads: one RIFF 'AVI ' container per document
    * with 1 + id%3 actual JPEG frames (encoded with javax.imageio ON
    * THE EXECUTORS), frame dims (16 + id%16) × (16 + id%8), 25 fps
    * (microSecPerFrame 40000). Container metadata is fully
    * closed-form in doc_id; frame BYTES are real JPEG, so the decode
    * side genuinely exercises per-frame ImageIO — the closed-form
    * oracle checks header fields, movi frame count, decode success
    * count, and the decoded frames' own dimensions (which come from
    * the JPEG SOF header, not the container). */
  def withAviPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val nFrames = (1 + id % 3).toInt
        val w = (16 + id % 16).toInt
        val h = (16 + id % 8).toInt
        val frames = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                ((id * 2654435761L + f * 7919 + x * 31 + y) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        def pad(n: Int) = n + (n & 1)
        val moviSize = 4 + frames.map(f => 8 + pad(f.length)).sum
        val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val total = 12 + (8 + hdrlSize) + (8 + moviSize)
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
        fourcc("RIFF"); bb.putInt(total - 8); fourcc("AVI ")
        fourcc("LIST"); bb.putInt(hdrlSize); fourcc("hdrl")
        fourcc("avih"); bb.putInt(56)
        bb.putInt(40000)                  // microSecPerFrame (25 fps)
        bb.putInt(0).putInt(0).putInt(0)  // maxBytesPerSec, padding, flags
        bb.putInt(nFrames)                // totalFrames
        bb.putInt(0).putInt(1).putInt(0)  // initialFrames, streams, sugBuf
        bb.putInt(w).putInt(h)            // width, height
        bb.put(new Array[Byte](16))       // reserved[4]
        fourcc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
        fourcc("strh"); bb.putInt(56)
        fourcc("vids"); fourcc("MJPG")
        bb.putInt(0).putInt(0).putInt(0)  // flags, prio/lang, initialFrames
        bb.putInt(1).putInt(25)           // scale, rate (25 fps)
        bb.putInt(0).putInt(nFrames)      // start, length
        bb.putInt(0).putInt(0).putInt(0)  // sugBuf, quality, sampleSize
        bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
        fourcc("strf"); bb.putInt(40)
        bb.putInt(40)                     // biSize
        bb.putInt(w).putInt(h)
        bb.putShort(1).putShort(24)       // planes, bitcount
        fourcc("MJPG")                    // compression
        bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
        fourcc("LIST"); bb.putInt(moviSize); fourcc("movi")
        frames.foreach { f =>
          fourcc("00dc"); bb.putInt(f.length); bb.put(f)
          if ((f.length & 1) == 1) bb.put(0.toByte)
        }
        Row(id, bb.array())
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  val aviSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", LongType),
    StructField("fps", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("frames_found", LongType),
    StructField("frames_decoded", LongType),
    StructField("frame_w", LongType),
    StructField("frame_h", LongType),
    StructField("format", StringType)))

  /** AVI container metadata + REAL per-frame JPEG decode via
    * [[AviCodec.meta]] (same mapPartitions batch shape as [[mp4Meta]];
    * non-AVI payloads dropped). `frame_w/h` come from the decoded
    * JPEG's own SOF header — proof the frame bytes, not just the
    * container header, were read. */
  def aviMeta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          AviCodec.meta(bytes).map(m =>
            Row(id, m.totalFrames,
              math.round(1000000.0 / m.microSecPerFrame),
              m.width, m.height, m.moviFrames, m.framesDecoded,
              m.frameW, m.frameH, "video/avi"))
        }
      }(Encoders.row(aviSchema))
    spark.createDataFrame(rows.rdd, aviSchema)
  }

  /** Explode an AVI column into per-frame image rows
    * (doc_id, frame_idx, payload = the raw JPEG bytes) — feed the
    * result straight to [[resizeThumb]]/[[decodeMeta]] for
    * frame-sampled thumbnails over video, exactly like still images. */
  def aviFrames(withBytes: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("frame_idx", LongType),
      StructField("payload", BinaryType)))
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          AviCodec.frames(r.getAs[Array[Byte]](1)).iterator.zipWithIndex
            .map { case (f, i) => Row(id, i.toLong, f) }
        }
      }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  // ---- animated GIF (multi-frame, pure-JDK real decode) --------------

  /** Animated-GIF decode: the OTHER multi-frame family a pure-JDK
    * engine can decode for real (javax.imageio's gif plugin reads
    * every frame plus the per-frame GraphicControlExtension).
    * `pxSum` folds every pixel of every frame (Σ r+g+b), so a faked
    * or palette-lossy decode diverges from the generator's closed
    * form — GIF is lossless for ≤256-color frames by construction. */
  object GifAnimCodec {

    final case class GifAnimMeta(nFrames: Long, width: Long, height: Long,
                                 delayCs: Long, framesDecoded: Long,
                                 pxSum: Long)

    private def sniff(b: Array[Byte]): Boolean =
      b.length >= 6 && new String(b, 0, 4, "US-ASCII") == "GIF8"

    def meta(bytes: Array[Byte]): Option[GifAnimMeta] =
      if (!sniff(bytes)) None
      else try {
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val frames = (0 until n).map(reader.read)
          var pxSum = 0L
          frames.foreach { img =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                pxSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
          }
          // per-frame delay from frame 0's GraphicControlExtension
          val tree = reader.getImageMetadata(0)
            .getAsTree("javax_imageio_gif_image_1.0")
          var delay = 0L
          val kids = tree.getChildNodes
          var i = 0
          while (i < kids.getLength) {
            val k = kids.item(i)
            if (k.getNodeName == "GraphicControlExtension")
              delay = k.getAttributes.getNamedItem("delayTime")
                .getNodeValue.toLong
            i += 1
          }
          Some(GifAnimMeta(n.toLong,
            frames.headOption.map(_.getWidth.toLong).getOrElse(0L),
            frames.headOption.map(_.getHeight.toLong).getOrElse(0L),
            delay, frames.size.toLong, pxSum))
        } finally { reader.dispose(); iis.close() }
      } catch { case _: Exception => None }
  }

  /** Executors write one ANIMATED GIF per doc — frame count, dims,
    * per-frame delay and every frame's solid color all closed-form in
    * doc_id. The byte stream is HAND-ROLLED GIF89a (logical screen,
    * NETSCAPE loop record, per-frame GraphicControlExtension +
    * two-entry local color table + LZW raster), the same approach the
    * always-green WAV/MP4/MKV generators use — after two rounds of
    * javax.imageio's sequence writer hash-flaking BETWEEN JVM sessions
    * on identical code (r16: palette quantizer; r17: still red on the
    * driver with a caller-supplied palette), no byte of the payload is
    * left to library discretion. Every payload is a pure function of
    * doc_id; the decode side ([[GifAnimCodec]], javax.imageio's gif
    * READER) stays real and unchanged.
    *
    * LZW raster: min code size 2 (clear=4, eoi=5, 3-bit codes). A
    * CLEAR is emitted before every 2 literals, so the decoder's
    * dictionary never reaches 8 entries and every code stays exactly
    * 3 bits — no code-width bookkeeping, bit-deterministic by
    * construction, and valid LZW (encoders may clear at any point). */
  def withGifAnimPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nFrames = (1 + id % 4).toInt
        val w = (8 + id % 8).toInt
        val h = (8 + id % 4).toInt
        val delayCs = (4 + id % 6).toInt
        val bos = new java.io.ByteArrayOutputStream()
        def u8(v: Int): Unit = bos.write(v & 0xff)
        def u16(v: Int): Unit = { u8(v); u8(v >> 8) } // little-endian
        bos.write("GIF89a".getBytes("US-ASCII"))
        u16(w); u16(h)
        u8(0x00) // no global color table
        u8(0)    // background color index
        u8(0)    // pixel aspect ratio
        // NETSCAPE 2.0 application extension: loop forever
        u8(0x21); u8(0xff); u8(11)
        bos.write("NETSCAPE2.0".getBytes("US-ASCII"))
        u8(3); u8(1); u16(0); u8(0)
        var f = 0
        while (f < nFrames) {
          val rc = ((id * 37 + f * 11) % 256).toInt
          val gc = ((id * 59 + f * 17) % 256).toInt
          val bc = ((id * 83 + f * 23) % 256).toInt
          // GraphicControlExtension: disposal none, no transparency
          u8(0x21); u8(0xf9); u8(4); u8(0x00); u16(delayCs); u8(0); u8(0)
          // image descriptor at (0,0), local color table of 2 entries
          u8(0x2c); u16(0); u16(0); u16(w); u16(h); u8(0x80)
          u8(rc); u8(gc); u8(bc) // index 0: the frame's solid color
          u8(0); u8(0); u8(0)    // index 1: black
          u8(2)                  // LZW minimum code size
          val bits = new java.io.ByteArrayOutputStream()
          var acc = 0L; var nb = 0
          def put(code: Int): Unit = {
            acc |= (code.toLong << nb); nb += 3
            while (nb >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nb -= 8 }
          }
          val n = w * h
          var i = 0
          while (i < n) {
            put(4)                // CLEAR: dictionary back to 6 entries
            put(0)                // pixel (adds no entry)
            if (i + 1 < n) put(0) // pixel (adds entry 6 → still 3-bit)
            i += 2
          }
          put(5) // end of information
          if (nb > 0) bits.write((acc & 0xff).toInt)
          val raster = bits.toByteArray
          var off = 0
          while (off < raster.length) {
            val len = math.min(255, raster.length - off)
            u8(len); bos.write(raster, off, len); off += len
          }
          u8(0) // block terminator
          f += 1
        }
        u8(0x3b) // trailer
        Row(id, bos.toByteArray)
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  val gifAnimSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("delay_cs", LongType),
    StructField("frames_decoded", LongType),
    StructField("px_sum", LongType),
    StructField("format", StringType)))

  /** Animated-GIF metadata + real per-frame decode + full pixel fold
    * via [[GifAnimCodec.meta]] — [[aviMeta]]'s shape for the GIF
    * family. */
  def gifAnimMeta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          GifAnimCodec.meta(r.getAs[Array[Byte]](1)).map(m =>
            Row(r.getLong(0), m.nFrames, m.width, m.height, m.delayCs,
              m.framesDecoded, m.pxSum, "image/gif-anim"))
        }
      }(Encoders.row(gifAnimSchema))
    spark.createDataFrame(rows.rdd, gifAnimSchema)
  }

  /** Multi-page TIFF decode (the scanned-document container): JDK 9+
    * ships a real TIFF ImageIO plugin, so page count, dims and every
    * page's pixels decode for real. TIFF stores RGB samples directly
    * (no palette, no quantizer — the GIF determinism lesson doesn't
    * even arise), so the per-pixel fold is exactly the generator's
    * closed form. */
  object TiffCodec {

    final case class TiffMeta(nPages: Long, width: Long, height: Long,
                              pagesDecoded: Long, pxSum: Long)

    private def sniff(b: Array[Byte]): Boolean =
      b.length >= 4 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

    def meta(bytes: Array[Byte]): Option[TiffMeta] =
      if (!sniff(bytes)) None
      else try {
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("tiff").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val pages = (0 until n).map(reader.read)
          var pxSum = 0L
          pages.foreach { img =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                pxSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
          }
          Some(TiffMeta(n.toLong,
            pages.headOption.map(_.getWidth.toLong).getOrElse(0L),
            pages.headOption.map(_.getHeight.toLong).getOrElse(0L),
            pages.size.toLong, pxSum))
        } finally { reader.dispose(); iis.close() }
      } catch { case _: Exception => None }
  }

  /** Executors write one MULTI-PAGE TIFF per doc — page count, dims
    * and each page's solid RGB color all closed-form in doc_id. The
    * byte stream is HAND-ROLLED baseline TIFF (little-endian header,
    * per-page uncompressed chunky-RGB strip + an IFD with the ten
    * baseline tags, IFDs chained for the page sequence) for the same
    * reason as [[withGifAnimPayload]]: javax.imageio's sequence writer
    * proved session-nondeterministic on the driver box, so no byte is
    * left to library discretion. Every payload is a pure function of
    * doc_id; the decode side ([[TiffCodec]], javax.imageio's tiff
    * READER) stays real and unchanged.
    *
    * Per-page block layout (all offsets even, as the spec requires):
    * [BitsPerSample array 6B][pixels w·h·3, padded even][IFD 126B]. */
  def withTiffPayload(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val spark = docs.sparkSession
    val rows = docs.select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nPages = (1 + id % 3).toInt
        val w = (6 + id % 6).toInt
        val h = (6 + id % 3).toInt
        val pixBytes = w * h * 3
        val pixPad = pixBytes + (pixBytes & 1)
        val ifdSize = 2 + 10 * 12 + 4
        val pageSize = 6 + pixPad + ifdSize
        def pageBase(p: Int): Int = 8 + p * pageSize
        val bb = java.nio.ByteBuffer.allocate(8 + nPages * pageSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('I'.toByte).put('I'.toByte).putShort(42)
        bb.putInt(pageBase(0) + 6 + pixPad) // offset of IFD 0
        var p = 0
        while (p < nPages) {
          val base = pageBase(p)
          val rc = ((id * 29 + p * 13) % 256).toInt
          val gc = ((id * 47 + p * 19) % 256).toInt
          val bc = ((id * 71 + p * 31) % 256).toInt
          bb.position(base)
          bb.putShort(8).putShort(8).putShort(8) // BitsPerSample data
          var i = 0
          while (i < w * h) {
            bb.put(rc.toByte).put(gc.toByte).put(bc.toByte); i += 1
          }
          bb.position(base + 6 + pixPad)
          bb.putShort(10) // entry count; tags in ascending order
          def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
            bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
            if (typ == 3 && count == 1) { // SHORT: value left-packed
              bb.putShort(value.toShort); bb.putShort(0); ()
            } else { bb.putInt(value); () } // LONG value, or data offset
          }
          entry(256, 3, 1, w)        // ImageWidth
          entry(257, 3, 1, h)        // ImageLength
          entry(258, 3, 3, base)     // BitsPerSample → external 8,8,8
          entry(259, 3, 1, 1)        // Compression: none
          entry(262, 3, 1, 2)        // PhotometricInterpretation: RGB
          entry(273, 4, 1, base + 6) // StripOffsets (one strip)
          entry(277, 3, 1, 3)        // SamplesPerPixel
          entry(278, 3, 1, h)        // RowsPerStrip
          entry(279, 4, 1, pixBytes) // StripByteCounts
          entry(284, 3, 1, 1)        // PlanarConfiguration: chunky
          bb.putInt(if (p + 1 < nPages) pageBase(p + 1) + 6 + pixPad else 0)
          p += 1
        }
        Row(id, bb.array())
      }
    }(Encoders.row(schema))
    spark.createDataFrame(rows.rdd, schema)
  }

  val tiffSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pages", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("pages_decoded", LongType),
    StructField("px_sum", LongType),
    StructField("format", StringType)))

  /** Multi-page TIFF metadata + real per-page decode + full pixel
    * fold via [[TiffCodec.meta]]. */
  def tiffMeta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          TiffCodec.meta(r.getAs[Array[Byte]](1)).map(m =>
            Row(r.getLong(0), m.nPages, m.width, m.height,
              m.pagesDecoded, m.pxSum, "image/tiff"))
        }
      }(Encoders.row(tiffSchema))
    spark.createDataFrame(rows.rdd, tiffSchema)
  }

  val mp4Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("media_timescale", LongType),
    StructField("media_duration", LongType),
    StructField("format", StringType)))

  /** Full container metadata via [[Mp4Codec.meta]] — the richer
    * video-specific twin of [[decodeMeta]] (same mapPartitions batch
    * shape); non-MP4 payloads are dropped rather than stubbed, since
    * the extra clock columns have no stub analogue. */
  def mp4Meta(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    val rows = withBytes.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Mp4Codec.meta(bytes).map(m =>
            Row(id, bytes.length.toLong, m.timescale, m.duration,
              m.width, m.height, m.mediaTimescale, m.mediaDuration,
              "video/mp4"))
        }
      }(Encoders.row(mp4Schema))
    spark.createDataFrame(rows.rdd, mp4Schema)
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
