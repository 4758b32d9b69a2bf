package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata struct, with decode / feature-extract /
  * frame-sample stages.
  *
  * IMAGE and AUDIO decode are REAL (r5): the JDK ships its own codecs —
  * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP) and
  * `javax.sound.sampled.AudioSystem` (WAV/AIFF PCM) — so
  * [[decodeImage]] / [[resizeImageBytes]] / [[decodeWav]] run actual
  * pixel/sample decoding inside the partition-level seam, headless, no
  * external library. [[fakeDecode]] remains only as the fallback for
  * bytes no JDK codec reads (video containers), and the byte-histogram
  * `extractFeatures` stays as the codec-free fast path. Schema
  * contract, batch-shaped `mapPartitions` processing, and blob-aware
  * partitioning are unchanged.
  */
object Multimodal {

  /** Typed media record: the schema contract for multimodal tables. */
  case class MediaMeta(modality: String, width: Int, height: Int, frames: Int)
  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frames", IntegerType, nullable = false))), nullable = false)))

  /** Wrap a text table as a fake media table (UTF-8 bytes as "content",
    * derived meta) — the deterministic stand-in for reading real blobs.
    * Real ingestion would be `spark.read.format("binaryFile")` with the
    * same output schema. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit(modality).as("modality"),
        (length(col(textCol)) % 640).cast(IntegerType).as("width"),
        (length(col(textCol)) % 480).cast(IntegerType).as("height"),
        (length(col(textCol)) % 30 + 1).cast(IntegerType).as("frames")).as("meta"))

  /** STUB DECODER — deterministic fake: "decodes" a blob to a 16-bin byte
    * histogram (the shape a real decoder's pixel/sample tensor summary
    * would take). Runs in the partition-level seam a real codec would
    * occupy: one JVM call per BATCH of rows (mapPartitions), never per
    * byte through the expression interpreter. */
  def fakeDecode(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) % 16) += 1
        i += 1
      }
    }
    hist
  }

  /** REAL header sniffing (NOT a stub — no codec library needed):
    * container format and pixel dimensions parsed straight from magic
    * bytes. PNG (IHDR), JPEG (SOFn scan), GIF (logical screen), BMP
    * (BITMAPINFOHEADER), WAV (RIFF/WAVE: channels x sample rate stand in
    * for width x height). Unknown/truncated content -> ("unknown", 0, 0).
    * This is the part of "decode" a data pipeline actually needs at
    * ingest time — routing, size filters, aspect-ratio stats — and it
    * runs at full speed in the same partition seam as the codec stub. */
  def sniffHeader(b: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int) = b(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b == null || b.length < 12) ("unknown", 0, 0)
    else if (be32(0) == 0x89504E47 && be32(4) == 0x0D0A1A0A && b.length >= 24 &&
      new String(b, 12, 4, "US-ASCII") == "IHDR")
      ("png", be32(16), be32(20))
    else if (u8(0) == 0xFF && u8(1) == 0xD8) {
      // walk JPEG segments to the first SOFn (C0-CF except C4/C8/CC)
      var i = 2
      var out = ("jpeg", 0, 0)
      var done = false
      while (!done && i + 9 < b.length) {
        if (u8(i) != 0xFF) { done = true }
        else {
          val m = u8(i + 1)
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            out = ("jpeg", be16(i + 7), be16(i + 5)); done = true
          } else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) i += 2
          else i += 2 + be16(i + 2)
        }
      }
      out
    }
    else if (new String(b, 0, 6, "US-ASCII").startsWith("GIF8"))
      ("gif", le16(6), le16(8))
    else if (u8(0) == 'B' && u8(1) == 'M' && b.length >= 26)
      ("bmp", le32(18), le32(22))
    else if (new String(b, 0, 4, "US-ASCII") == "RIFF" && b.length >= 36 &&
      new String(b, 8, 4, "US-ASCII") == "WAVE")
      ("wav", le16(22), le32(24)) // channels, sample rate
    else ("unknown", 0, 0)
  }

  /** Header description through the partition seam: media table ->
    * (media_id, format, width, height) using [[sniffHeader]]. */
  def describeMedia(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (f, w, h) = sniffHeader(bytes)
        Row(r.getLong(0), f, w, h)
      }
    }(encoder)
  }

  /** Feature extraction through the decode seam: media table ->
    * (media_id, features array, n_bytes). Batch shape: one partition of
    * records in, one iterator of feature rows out. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0L else bytes.length.toLong
        Row(id, n, fakeDecode(bytes).toSeq)
      }
    }(encoder)
  }

  /** Resize through the decode seam — the pipeline-side contract of an
    * image resize: meta reflects the new (width, height), content shrinks
    * to the new pixel budget. The PIXEL TRANSFORM is the deterministic
    * stand-in (crop to the first w*h bytes — a real scaler drops into the
    * same column expression or partition seam); everything around it —
    * schema, meta rewrite, byte budget — is real. Codegen column ops
    * only, map-only at any scale. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(
      col("media_id"),
      expr(s"substring(content, 1, ${w * h})").as("content"),
      struct(
        col("meta.modality").as("modality"),
        lit(w).as("width"),
        lit(h).as("height"),
        col("meta.frames").as("frames")).as("meta"))

  /** Frame sampling for "video" rows: emit every `stride`-th frame index
    * with a per-frame byte slice — the explode pattern a video pipeline
    * uses (row count scales by frames/stride, bytes stay columnar). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("meta.modality") === "video")
      .select(col("media_id"), col("content"), col("meta.frames").as("frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("frames") - 1, lit(stride))))
      .withColumn("frame_bytes",
        // deterministic per-frame slice: frames partition the blob evenly
        expr("substring(content, CAST(frame_idx * (octet_length(content) / frames) AS INT) + 1, " +
          "CAST(octet_length(content) / frames AS INT))"))
      .select("media_id", "frame_idx", "frame_bytes")

  // ---- REAL codecs (JDK-only: ImageIO + AudioSystem, headless-safe) ----

  /** Real image decode: (width, height, meanR, meanG, meanB, 16-bin
    * luminance histogram). None for bytes no JDK reader accepts. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Array[Long])] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
            sr += r; sg += g; sb += b
            hist(((r * 299 + g * 587 + b * 114) / 1000) / 16) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, hist))
      }
    } catch { case _: Exception => None }
  }

  /** Real image resize: decode, Graphics2D-scale, re-encode as PNG.
    * None when the input isn't a decodable image. */
  def resizeImageBytes(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        g2.drawImage(img, 0, 0, w, h, null)
        g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Real WAV/AIFF PCM decode: (channels, sampleRate, nFrames, mean
    * absolute amplitude of 16-bit samples). None for non-audio bytes. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Float, Long, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      ais.close()
      var sum = 0.0
      var n = 0
      if (fmt.getSampleSizeInBits == 16) {
        var i = 0
        while (i + 1 < data.length) {
          val lo = data(i) & 0xFF
          val hi = data(i + 1).toInt
          val s = if (fmt.isBigEndian) ((data(i).toInt << 8) | (data(i + 1) & 0xFF)).toShort
                  else ((hi << 8) | lo).toShort
          sum += math.abs(s.toInt)
          n += 1
          i += 2
        }
      }
      Some((fmt.getChannels, fmt.getSampleRate, ais.getFrameLength,
        if (n == 0) 0.0 else sum / n))
    } catch { case _: Exception => None }

  /** Deterministic synthetic PNG: a solid (id*7, id*13, id*29) % 256
    * color — PNG is lossless, so a decode round trip recovers the exact
    * channel values (the mm5 oracle's contract). Executor-side
    * generation: one image per row inside mapPartitions. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 7) % 256).toInt << 16) |
      (((id * 13) % 256).toInt << 8) | ((id * 29) % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode through the partition seam: (media_id, content) ->
    * (media_id, format, width, height, mean_r, mean_g, mean_b). Format
    * comes from [[sniffHeader]]; dimensions and channel means come from
    * the ACTUAL pixel decode (null means for non-image bytes). */
  def decodeMedia(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (fmt, _, _) = sniffHeader(bytes)
        decodeImage(bytes) match {
          case Some((w, h, mr, mg, mb, _)) => Row(id, fmt, w, h, mr, mg, mb)
          case None => Row(id, fmt, 0, 0, null, null, null)
        }
      }
    }(encoder)
  }

  /** Repartition helper for media tables: blobs are large and row sizes
    * skewed — range-partition by id so each task carries a bounded byte
    * volume (at 100 TB: tune target rows/partition by avg blob size). */
  def repartitionForBlobs(media: DataFrame, rowsPerPartition: Long): DataFrame = {
    val n = math.max(1L, media.count() / rowsPerPartition).toInt
    media.repartitionByRange(n, col("media_id"))
  }
}
