package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata struct, with decode / feature-extract /
  * frame-sample stages.
  *
  * The REAL parts (what this module delivers): the schema contract, the
  * batch-shaped partition-level processing seam, partitioning that keeps
  * one media blob per row without skewing partitions, and fully tested
  * byte-level feature extraction. The DECODER is a deterministic stub —
  * `fakeDecode` below — because no image/audio codec library ships in
  * this environment; a real codec drops into the same
  * `mapPartitions` seam without touching any schema.
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

  /** Repartition helper for media tables: blobs are large and row sizes
    * skewed — range-partition by id so each task carries a bounded byte
    * volume (at 100 TB: tune target rows/partition by avg blob size). */
  def repartitionForBlobs(media: DataFrame, rowsPerPartition: Long): DataFrame = {
    val n = math.max(1L, media.count() / rowsPerPartition).toInt
    media.repartitionByRange(n, col("media_id"))
  }
}
