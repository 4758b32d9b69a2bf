package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance for a hive-partitioned parquet
  * dataset — the log-less materialized-view-refresh core: per-partition
  * MERGEABLE partials (count + DECIMAL sum) live in a `_graft_aggs`
  * manifest next to the data (underscore prefix = invisible to normal
  * reads, like `_graft_skipping`); after a partition-scoped change
  * ([[CorpusSink.upsertPartitions]] returns exactly the touched
  * values), [[refresh]] recomputes ONLY the touched partitions with a
  * partition-pruned scan and swaps the manifest — the untouched
  * partitions' partials are reused, never rescanned. [[total]] then
  * answers the global aggregate from the manifest alone (partitions-many
  * rows, no data scan at all).
  *
  * This is the "don't recompute the world" step a 100 TB corpus needs:
  * a daily drop touches a handful of date partitions; the corpus-wide
  * token count refreshes in O(drop), not O(corpus). Partials are
  * (long, DECIMAL) — order-independent and exactly mergeable, so the
  * incrementally maintained aggregate is bit-identical to a full
  * recompute (the s33 oracle proves it against a logical replay of the
  * final state).
  */
object AggManifest {

  private def manifestPath(path: String) = s"$path/_graft_aggs"

  private def partials(df: DataFrame, partitionCol: String,
                       valueCol: String): DataFrame =
    df.groupBy(col(partitionCol).cast("string").as(partitionCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"))

  /** Full build: one scan, one manifest row per partition value. */
  def build(spark: SparkSession, path: String, partitionCol: String,
            valueCol: String): Unit =
    partials(spark.read.parquet(path), partitionCol, valueCol)
      .coalesce(1).write.mode("overwrite").parquet(manifestPath(path))

  /** Incremental refresh: recompute partials for `touched` partition
    * values only (the filter is a PartitionFilter — untouched dirs are
    * never read), keep every other manifest row, swap via rename so a
    * concurrent reader sees old-or-new complete. */
  def refresh(spark: SparkSession, path: String, partitionCol: String,
              valueCol: String, touched: Seq[String]): Unit = {
    require(touched.nonEmpty, "refresh with no touched partitions")
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fresh = partials(
      spark.read.parquet(path).filter(col(partitionCol).isin(touched: _*)),
      partitionCol, valueCol)
    val keep = spark.read.parquet(manifestPath(path))
      .filter(!col(partitionCol).isin(touched: _*))
    val tmp = manifestPath(path) + ".tmp"
    keep.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = FileSystem.get(new HPath(path).toUri,
      spark.sessionState.newHadoopConf())
    val m = new HPath(manifestPath(path))
    val bak = new HPath(manifestPath(path) + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(m, bak))
      throw new java.io.IOException(s"rename $m -> $bak failed")
    if (!fs.rename(new HPath(tmp), m)) {
      fs.rename(bak, m)
      throw new java.io.IOException(s"rename $tmp -> $m failed (restored)")
    }
    fs.delete(bak, true)
  }

  /** Build-or-refresh: the streaming entry point ([[graft.streaming.MatView]]
    * calls this per micro-batch) — first batch builds the manifest,
    * every later batch refreshes only its touched partitions. */
  def maintain(spark: SparkSession, path: String, partitionCol: String,
               valueCol: String, touched: Seq[String]): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new HPath(path).toUri,
      spark.sessionState.newHadoopConf())
    if (!fs.exists(new HPath(manifestPath(path))))
      build(spark, path, partitionCol, valueCol)
    else refresh(spark, path, partitionCol, valueCol, touched)
  }

  /** Per-partition partials as a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestPath(path))

  /** Global aggregate answered from the manifest alone — no data scan. */
  def total(spark: SparkSession, path: String): DataFrame =
    read(spark, path).agg(sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"))
}
