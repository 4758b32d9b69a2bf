package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the log-less core of what Delta/
  * Iceberg keep in their metadata: a manifest of per-FILE min/max for
  * chosen columns, so a range predicate opens only the files whose
  * stats overlap it. Parquet row-group stats already skip WITHIN a
  * file; this skips the file open (and at 100 TB, the S3 GET) itself.
  * Pays off exactly when the data is CLUSTERED on the indexed columns —
  * [[CorpusSink.writePartitioned]]'s `sortWithinFiles` or
  * [[Bucketing.zorderLayout]] first, then index.
  *
  * The manifest is file-count-sized DRIVER-SCALE METADATA by nature
  * (every table format replays its log on the driver the same way);
  * it lives under `<path>/_graft_skipping` — the underscore prefix
  * keeps every parquet reader from treating it as data.
  */
object SkippingIndex {

  private def manifestPath(path: String) = s"$path/_graft_skipping"

  /** Scan the dataset once and write per-file min/max for `cols`. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("__file") +: cols.map(col): _*)
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(path))
  }

  /** Files whose [min,max] for `column` overlaps [lo, hi]. */
  def candidateFiles(spark: SparkSession, path: String, column: String,
                     lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(manifestPath(path))
      .filter(col(s"${column}_max") >= lo && col(s"${column}_min") <= hi)
      .select("__file").collect().map(_.getString(0)).toSeq

  /** Read only the overlapping files, then apply the exact predicate.
    * Result is identical to a full-scan filter; IO is proportional to
    * the files the clustering lets the manifest rule in. */
  def prunedRead(spark: SparkSession, path: String, column: String,
                 lo: Long, hi: Long): DataFrame = {
    val files = candidateFiles(spark, path, column, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column) >= lo && col(column) <= hi)
  }
}
