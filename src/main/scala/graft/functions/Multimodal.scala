package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads plus a typed metadata struct.
  *
  * The Spark-side plumbing — schema, partition-wise batch iteration,
  * output shapes — is real and tested. Decoding is REAL for every format
  * the JDK ships codecs for: PNG/JPEG/BMP/GIF via javax.imageio
  * (imageFeatures / resizeImages) and WAV-PCM via javax.sound.sampled
  * (audioFeatures). Only video demux remains a deterministic stub
  * (frameSampleStub) — no container-level codec exists for it; swap in a
  * JNI/FFI demuxer with the same bytes→rows shape in production.
  */
object Multimodal {

  // image decode must never touch a display
  System.setProperty("java.awt.headless", "true")

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column with inferred metadata into the canonical
    * (payload, meta) pair.
    */
  def asMediaColumn(df: DataFrame, binaryCol: String, mime: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** STUB — deterministic fake "decode": feature vector derived from
    * payload bytes (length, byte histogram moments). Replace with a real
    * codec; the signature (bytes → fixed-dim float features) is the
    * production contract.
    */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.max(1, payload.length / dim)
    (0 until dim).foreach(j => out(j) /= n.toFloat)
    out
  }

  /** Partition-wise batched feature extraction — the mapInPandas analog:
    * one iterator pass per partition, no per-row task overhead, output
    * schema declared up front. At 100 TB this is a map-only stage whose
    * parallelism is the input partitioning.
    */
  def extractFeatures(
      df: DataFrame,
      keyCol: String,
      binaryCol: String,
      dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row(r.get(keyIdx),
          if (payload == null) 0L else payload.length.toLong,
          fakeDecode(payload, dim))
      }
    }(enc)
  }

  /** STUB resize: passthrough that rewrites metadata dims — kept for
    * payloads in formats the JDK cannot decode; resizeImages below does
    * the real thing for PNG/JPEG/BMP/GIF.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      lit(width).as("width"),
      lit(height).as("height"),
      col("meta.duration_ms").as("duration_ms")))

  // ------------------------------------------------------ real decoders

  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    if (payload == null || payload.isEmpty) return null
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }
  }

  /** Decode one image payload (any ImageIO-supported format). Returns
    * (width, height, bands, meanIntensity 0-1) or None on undecodable
    * bytes.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    val img = readImage(payload)
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    Some((w, h, bands, sum / (w.toLong * h * bands * 255.0)))
  }

  /** Partition-wise image feature extraction with the REAL JDK decoder:
    * (key, width, height, bands, mean_intensity); undecodable payloads
    * yield NULL features rather than failing the task.
    */
  def imageFeatures(df: DataFrame, keyCol: String, binaryCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bands", IntegerType),
      StructField("mean_intensity", DoubleType)))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        decodeImage(payload) match {
          case Some((w, h, b, m)) => Row(r.get(keyIdx), w, h, b, m)
          case None => Row(r.get(keyIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** Real distributed image resize: decode → bilinear resample →
    * re-encode (PNG) inside one map-only pass. Undecodable payloads pass
    * through unchanged.
    */
  def resizeImages(
      df: DataFrame,
      binaryCol: String,
      width: Int,
      height: Int,
      format: String = "png"): DataFrame = {
    // validate the target format up front — an unknown name would make
    // every ImageIO.write return false and silently destroy every payload
    require(javax.imageio.ImageIO.getImageWritersByFormatName(format).hasNext,
      s"no ImageIO writer for format '$format'")
    // JPEG/BMP writers reject/blacken alpha channels; everything else
    // keeps transparency
    val opaqueTarget = Set("jpg", "jpeg", "bmp")(format.toLowerCase)
    val resize = udf { payload: Array[Byte] =>
      readImage(payload) match {
        case null => payload
        case img =>
          val imgType =
            if (img.getColorModel.hasAlpha && !opaqueTarget)
              java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          val out = new java.awt.image.BufferedImage(width, height, imgType)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          val ok = javax.imageio.ImageIO.write(out, format, bos)
          val bytes = bos.toByteArray
          // a failed/empty write must not replace the original payload
          if (!ok || bytes.isEmpty) payload else bytes
      }
    }
    df.withColumn(binaryCol, resize(col(binaryCol)))
  }

  /** Decode WAV-PCM audio via javax.sound: (sampleRate, channels,
    * durationMs, rms 0-1) or None on undecodable bytes.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val durationMs = (frames * 1000.0 / fmt.getFrameRate).toLong
      val bytes = in.readAllBytes()
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      var sumSq = 0.0
      var n = 0
      if (bytesPerSample == 2) {
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
        while (buf.hasRemaining) { val s = buf.get() / 32768.0; sumSq += s * s; n += 1 }
      } else {
        bytes.foreach { b => val s = ((b & 0xFF) - 128) / 128.0; sumSq += s * s; n += 1 }
      }
      Some((fmt.getSampleRate.toInt, fmt.getChannels, durationMs,
        math.sqrt(sumSq / math.max(1, n))))
    } catch { case _: Exception => None }
  }

  /** Partition-wise WAV feature extraction with the REAL JDK decoder. */
  def audioFeatures(df: DataFrame, keyCol: String, binaryCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", LongType),
      StructField("rms", DoubleType)))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        decodeWav(payload) match {
          case Some((sr, ch, d, rms)) => Row(r.get(keyIdx), sr, ch, d, rms)
          case None => Row(r.get(keyIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** STUB frame sampling for video payloads: deterministic byte-slice
    * "frames" (every k-th chunk), exploded to one row per frame — the
    * real implementation demuxes keyframes in the same shape.
    * Kept for container formats the JVM cannot demux (MP4/MKV/WebM need
    * an external codec lib); MJPEG-AVI has a REAL path below.
    */
  def frameSampleStub(df: DataFrame, binaryCol: String, frames: Int = 4): DataFrame = {
    val sliceUdf = udf { (payload: Array[Byte], n: Int) =>
      if (payload == null || payload.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(1, payload.length / n)
        (0 until n).map(i => payload.slice(i * step, math.min(payload.length, i * step + step)))
      }
    }
    df.select(col("*"), posexplode(sliceUdf(col(binaryCol), lit(frames)))
      .as(Seq("frame_idx", "frame")))
  }

  // ------------------------------------------------- real video (MJPEG-AVI)
  //
  // MJPEG inside an AVI RIFF container is the one video format the bare
  // JVM can both WRITE and fully DECODE (each frame is an ordinary JPEG
  // for javax.imageio) — so this slice of the video surface is real:
  // container demux, per-frame decode, and the mux side used as the
  // round-trip test generator. The RIFF layout implemented here is the
  // public AVI spec (RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
  // strf)) LIST('movi' 00dc...))); frames are '..dc'/'..db' chunks.

  final case class MjpegVideo(
      width: Int, height: Int, usPerFrame: Long, frames: Vector[Array[Byte]])

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def rdLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Mux JPEG frames into a minimal MJPEG-AVI (the write side of the
    * container; also the deterministic generator for the round-trip
    * oracle). `fps` drives avih.microSecPerFrame.
    */
  def muxMjpegAvi(
      frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(fps > 0, s"fps must be positive, got $fps")
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      cc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)
    val usPerFrame = 1000000L / fps
    val maxFrame = frames.map(_.length).max
    // avih: 56-byte main header (fields per the public AVIMAINHEADER)
    val avih = le32(usPerFrame) ++ le32(maxFrame.toLong * fps) ++ le32(0) ++
      le32(0) /* flags: no idx1 chunk is written, so AVIF_HASINDEX stays clear */ ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxFrame.toLong) ++
      le32(width.toLong) ++ le32(height.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // strh: video stream header, MJPG handler, rate/scale = fps/1
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(fps.toLong) ++ le32(0) ++ le32(frames.length.toLong) ++
      le32(maxFrame.toLong) ++ le32(0xFFFFFFFFL) ++ le32(0) ++
      Array[Byte](0, 0, 0, 0, (width & 0xFF).toByte, ((width >> 8) & 0xFF).toByte,
        (height & 0xFF).toByte, ((height >> 8) & 0xFF).toByte)
    // strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ cc("MJPG") ++
      le32(width.toLong * height * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(le32(body.length.toLong)); bos.write(body)
    bos.toByteArray
  }

  /** Demux an MJPEG-AVI payload: walk the RIFF chunk tree, pull the avih
    * dims/frame-interval and every '..dc'/'..db' frame out of the 'movi'
    * list. Returns None on anything that isn't a RIFF-AVI. Pure JVM —
    * no codec library; each returned frame is a standalone JPEG.
    */
  def demuxMjpegAvi(payload: Array[Byte]): Option[MjpegVideo] = {
    if (payload == null || payload.length < 12) return None
    if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
    var width = 0; var height = 0; var usPerFrame = 0L
    val frames = Vector.newBuilder[Array[Byte]]
    // (offset, limit) chunk walks in LONG arithmetic — a corrupt size
    // field near 2^31 would overflow Int offsets past the bounds check
    // and turn "return None" into an exception that kills the task.
    // LIST chunks recurse into their body.
    def walk(off0: Long, limit: Long): Unit = {
      var off = off0
      while (off + 8 <= limit) {
        val id = fourcc(payload, off.toInt)
        val sz = rdLe32(payload, off.toInt + 4) // unsigned 32-bit, always >= 0
        val body = off + 8
        if (body + sz > limit) return // truncated/corrupt: keep what we have
        id match {
          case "LIST" if sz >= 4 =>
            walk(body + 4, body + sz) // skip the 4-byte list type, walk members
          case "avih" if sz >= 40 =>
            usPerFrame = rdLe32(payload, body.toInt)
            width = rdLe32(payload, body.toInt + 32).toInt
            height = rdLe32(payload, body.toInt + 36).toInt
          case _ if id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) && sz > 0 =>
            frames += java.util.Arrays.copyOfRange(payload, body.toInt, (body + sz).toInt)
          case _ => ()
        }
        off = body + sz + (sz % 2) // chunks are word-aligned
      }
    }
    walk(12L, payload.length.toLong)
    val fs = frames.result()
    if (fs.isEmpty && width == 0) None else Some(MjpegVideo(width, height, usPerFrame, fs))
  }

  /** Partition-wise REAL video feature extraction for MJPEG-AVI payloads:
    * demux the container, decode every sampled frame with the JDK JPEG
    * decoder, one output row per frame — (key, frame_idx, n_frames,
    * fps, width, height, frame_width, frame_height, mean_intensity).
    * `frameStride` subsamples (every k-th frame) — the map-only shape a
    * 100 TB video corpus needs (parallelism = input partitioning, no
    * shuffle). Undemuxable payloads yield one all-null row per key.
    */
  def videoFeatures(
      df: DataFrame, keyCol: String, binaryCol: String,
      frameStride: Int = 1): DataFrame = {
    require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")
    val outSchema = StructType(Seq(
      StructField(keyCol, df.schema(keyCol).dataType),
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("fps", DoubleType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("frame_width", IntegerType),
      StructField("frame_height", IntegerType),
      StructField("mean_intensity", DoubleType)))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        demuxMjpegAvi(payload) match {
          // zero-frame AVIs (valid header, empty movi) get the same
          // all-null row as undemuxable payloads — a key must never
          // silently vanish from the output
          case None | Some(MjpegVideo(_, _, _, Vector())) =>
            Iterator.single(Row(r.get(keyIdx), null, null, null, null, null, null, null, null))
          case Some(v) =>
            val fps = if (v.usPerFrame > 0) 1000000.0 / v.usPerFrame else null
            v.frames.iterator.zipWithIndex
              .filter { case (_, i) => i % frameStride == 0 }
              .map { case (jpeg, i) =>
                decodeImage(jpeg) match {
                  case Some((fw, fh, _, m)) =>
                    Row(r.get(keyIdx), i, v.frames.length, fps, v.width, v.height, fw, fh, m)
                  case None =>
                    Row(r.get(keyIdx), i, v.frames.length, fps, v.width, v.height, null, null, null)
                }
              }
        }
      }
    }(enc)
  }
}
