package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance for a hive-partitioned parquet
  * dataset — the log-less materialized-view-refresh core: per-partition
  * MERGEABLE partials (count + DECIMAL sum) live in a `_graft_aggs`
  * manifest next to the data (underscore prefix = invisible to normal
  * reads, like `_graft_skipping`); after a partition-scoped change
  * ([[CorpusSink.upsertPartitions]] returns exactly the touched
  * values), [[refresh]] recomputes ONLY the touched partitions with a
  * partition-pruned scan and publishes a new manifest snapshot — the
  * untouched partitions' partials are reused, never rescanned.
  * [[total]] then answers the global aggregate from the manifest alone
  * (partitions-many rows, no data scan at all).
  *
  * This is the "don't recompute the world" step a 100 TB corpus needs:
  * a daily drop touches a handful of date partitions; the corpus-wide
  * token count refreshes in O(drop), not O(corpus). Partials are
  * (long, DECIMAL) — order-independent and exactly mergeable, so the
  * incrementally maintained aggregate is bit-identical to a full
  * recompute (the s33 oracle proves it against a logical replay of the
  * final state).
  *
  * Concurrency/crash contract (the snapshot-isolation shape Delta's log
  * and Iceberg's metadata pointer use): each publish writes a NEW
  * numbered snapshot directory `_graft_aggs/v<N>/` and only then drops
  * an empty `_COMMIT` marker into it (a single atomic file create).
  * Readers list the snapshot dirs and resolve the highest COMMITTED
  * version — there is never an instant where no complete manifest
  * resolves, and a writer crash mid-publish leaves only an uncommitted
  * v<N> that readers ignore and the next publish supersedes. The
  * previous snapshot is retained one generation for in-flight readers;
  * older ones are dropped at publish time. Single concurrent WRITER is
  * assumed (the streaming foreachBatch contract); readers are unlimited.
  */
object AggManifest {

  private def baseDir(path: String) = s"$path/_graft_aggs"

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new HPath(path).toUri, spark.sessionState.newHadoopConf())

  private val VersionDir = "v(\\d+)".r

  /** Committed snapshot versions, ascending (empty if none). */
  private def committedVersions(fs: FileSystem, path: String): Seq[Long] = {
    val base = new HPath(baseDir(path))
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VersionDir(n)
          if fs.exists(new HPath(st.getPath, "_COMMIT")) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  private def versionDir(path: String, v: Long) = s"${baseDir(path)}/v$v"

  /** Resolve the current committed snapshot; error if none. */
  private def currentVersion(fs: FileSystem, path: String): Long =
    committedVersions(fs, path).lastOption.getOrElse(
      throw new java.io.FileNotFoundException(
        s"no committed _graft_aggs manifest under $path — run build() first"))

  /** Write `m` as snapshot v(N+1), commit it, prune snapshots older than
    * the immediately previous one. */
  private def publish(spark: SparkSession, path: String, m: DataFrame): Unit = {
    val fs = fileSystem(spark, path)
    val existing = committedVersions(fs, path)
    val next = existing.lastOption.getOrElse(0L) + 1
    val dir = versionDir(path, next)
    // overwrite handles a crashed uncommitted attempt at the same number
    m.coalesce(1).write.mode("overwrite").parquet(dir)
    val marker = new HPath(dir, "_COMMIT")
    if (!fs.createNewFile(marker))
      throw new java.io.IOException(s"commit marker $marker already exists")
    // keep current + one predecessor for in-flight readers
    existing.dropRight(1).foreach { v =>
      fs.delete(new HPath(versionDir(path, v)), true)
    }
  }

  private def partials(df: DataFrame, partitionCol: String,
                       valueCol: String): DataFrame =
    df.groupBy(col(partitionCol).cast("string").as(partitionCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"))

  /** Full build: one scan, one manifest row per partition value. */
  def build(spark: SparkSession, path: String, partitionCol: String,
            valueCol: String): Unit =
    publish(spark, path,
      partials(spark.read.parquet(path), partitionCol, valueCol))

  /** Incremental refresh: recompute partials for `touched` partition
    * values only (the filter is a PartitionFilter — untouched dirs are
    * never read), keep every other manifest row, publish as a new
    * committed snapshot (see the object doc's concurrency contract). */
  def refresh(spark: SparkSession, path: String, partitionCol: String,
              valueCol: String, touched: Seq[String]): Unit = {
    require(touched.nonEmpty, "refresh with no touched partitions")
    val fresh = partials(
      spark.read.parquet(path).filter(col(partitionCol).isin(touched: _*)),
      partitionCol, valueCol)
    val keep = read(spark, path)
      .filter(!col(partitionCol).isin(touched: _*))
    publish(spark, path, keep.unionByName(fresh))
  }

  /** Build-or-refresh: the streaming entry point ([[graft.streaming.MatView]]
    * calls this per micro-batch) — first batch builds the manifest,
    * every later batch refreshes only its touched partitions. */
  def maintain(spark: SparkSession, path: String, partitionCol: String,
               valueCol: String, touched: Seq[String]): Unit =
    if (committedVersions(fileSystem(spark, path), path).isEmpty)
      build(spark, path, partitionCol, valueCol)
    else refresh(spark, path, partitionCol, valueCol, touched)

  /** Per-partition partials as a DataFrame (latest committed snapshot). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fileSystem(spark, path)
    spark.read.parquet(versionDir(path, currentVersion(fs, path)))
  }

  /** Global aggregate answered from the manifest alone — no data scan. */
  def total(spark: SparkSession, path: String): DataFrame =
    read(spark, path).agg(sum(col("n")).as("n"),
      sum(col("sum_v")).as("sum_v"))
}
