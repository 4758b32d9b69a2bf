package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-aware parquet sink for cleaned corpora — the write side of the
  * training-data pipeline. Two levers that matter at 100 TB:
  *
  *  - **Partition pruning**: `partitionBy(col)` writes one directory per
  *    value, so downstream per-source / per-language reads scan only
  *    their slice (`PartitionFilters` in the scan, zero IO elsewhere).
  *  - **File sizing**: one `repartition(partitionCol)` clusters each
  *    partition's rows into the same tasks (without it every task writes
  *    a file into EVERY partition directory — the classic small-files
  *    explosion: tasks x partitions files), and `maxRecordsPerFile`
  *    caps file length so a hot partition splits instead of producing
  *    one monster file.
  *
  * The partition column must be low-cardinality (source, language,
  * date) — partitioning by a high-cardinality key creates a directory
  * per value, which kills any file system's metadata layer.
  */
object CorpusSink {

  /** Write `df` under `path` partitioned by `partitionCol`, each file
    * capped at `maxRecordsPerFile` rows. `sortWithinFiles` columns are
    * sorted INSIDE each task before writing: parquet row-group min/max
    * statistics then become selective, so range predicates on those
    * columns skip whole row groups at read time — the third layout
    * lever after directory pruning and file sizing (order within a file
    * is free at write time and unpayable after). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       maxRecordsPerFile: Long = 5000000L,
                       sortWithinFiles: Seq[String] = Nil): Unit = {
    val clustered = df.repartition(col(partitionCol))
    val arranged =
      if (sortWithinFiles.isEmpty) clustered
      else clustered.sortWithinPartitions(
        (partitionCol +: sortWithinFiles).map(col): _*)
    arranged.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)
  }

  /** Append one batch to a partitioned corpus — the micro-batch /
    * incremental-ingest form of [[writePartitioned]]: same clustering
    * and file-size levers, `append` mode so earlier batches stay.
    * Streaming ingest accretes files per batch; run [[compact]] when
    * listing time starts to rival read time. */
  def appendPartitioned(df: DataFrame, path: String, partitionCol: String,
                        maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(partitionCol)).write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .mode("append")
      .parquet(path)

  /** Read a partitioned corpus back. The partition column comes back
    * from directory names (string-typed unless
    * `spark.sql.sources.partitionColumnTypeInference` applies). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet dataset's small files toward `targetBytes` per
    * file — the OPTIMIZE step every long-lived 100 TB table needs:
    * streaming ingest and per-batch writes accrete thousands of tiny
    * files, and past a point the job spends longer listing/opening
    * files than reading bytes. Rewrites the data with the file count
    * sized from the OBSERVED bytes (ceil(bytes / targetBytes)); with
    * `partitionCol` the hive layout is preserved and rows re-cluster
    * per partition value.
    *
    * The rewrite goes to a sibling temp directory and swaps in via two
    * Hadoop FS renames (old -> .bak, tmp -> path, delete .bak) — not
    * atomic across the pair, but a crash leaves either the old or the
    * new COMPLETE dataset on disk, never a half-written mix (readers of
    * `path` during the swap window can race; pause them, as any
    * table-format-less compaction must). All file I/O goes through the
    * Hadoop FileSystem of `path`'s scheme — works on file://, hdfs://,
    * s3a:// alike. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
              partitionCol: Option[String] = None): (Long, Long) = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val root = new HPath(path)
    val fs = FileSystem.get(root.toUri, spark.sessionState.newHadoopConf())
    def parquetFiles(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(root)
    val bytes = before.map(_.getLen).sum
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
    val df = spark.read.parquet(path)
    val tmp = new HPath(path + ".compact.tmp")
    val bak = new HPath(path + ".compact.bak")
    // stale swap leftovers from a crashed earlier run would make the
    // renames below fail (or, on HDFS, nest root INSIDE bak) — clear
    // them first; a surviving bak means that run died mid-swap and the
    // live dataset is whichever of root/bak exists, so only delete bak
    // when root is present
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) {
      require(fs.exists(root),
        s"$bak exists but $root does not — a previous compact died mid-swap; " +
          s"restore by renaming $bak back to $root before compacting")
      fs.delete(bak, true)
    }
    partitionCol match {
      case Some(pc) =>
        // RANGE-partition on (value, row hash): the sampler allocates
        // tasks proportional to data volume, so a dominant partition
        // value SPLITS across many tasks (no single hot reducer — a
        // plain repartition(col(pc)) would funnel it through one) while
        // small values share a task and keep few files per directory
        val salted = df.withColumn("__salt",
          xxhash64(df.columns.map(col): _*))
        salted.repartitionByRange(nFiles, col(pc), col("__salt"))
          .drop("__salt")
          .write.partitionBy(pc).mode("overwrite").parquet(tmp.toString)
      case None =>
        df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    }
    val after = parquetFiles(tmp).length.toLong
    if (!fs.rename(root, bak)) throw new java.io.IOException(s"rename $root -> $bak failed")
    if (!fs.rename(tmp, root)) {
      // roll the old dataset back so `path` never stays empty
      fs.rename(bak, root)
      throw new java.io.IOException(s"rename $tmp -> $root failed (old data restored)")
    }
    fs.delete(bak, true)
    (before.length.toLong, after)
  }

  /** MERGE/upsert into a hive-partitioned parquet dataset, rewriting
    * ONLY the partitions the update batch touches — the log-less form of
    * `MERGE INTO`: matched keys take the update row, unmatched update
    * rows insert, and every untouched partition directory keeps its
    * exact files (zero IO — at 100 TB an update batch touching 2 of
    * 5000 date partitions rewrites 0.04% of the table).
    *
    * Contract: a key's partition value must be STABLE across updates
    * (a key that moved partitions would leave its stale row in the old
    * directory — the same constraint every partition-scoped merge has);
    * partition values must be directory-safe strings, and `updates`
    * must carry the dataset's full column set. New partition values
    * create new directories.
    *
    * Scale: the target read is PARTITION-PRUNED to the touched values
    * (`PartitionFilters` at the scan); the anti-join keys on `keyCol`
    * (AQE broadcasts batch-sized updates). Each touched partition swaps
    * via the [[compact]] two-rename recipe — old-or-new complete per
    * partition, never mixed (cross-partition atomicity needs a table
    * format's log; documented out of scope). Returns touched values. */
  def upsertPartitions(spark: SparkSession, path: String, updates: DataFrame,
                       keyCol: String, partitionCol: String,
                       maxRecordsPerFile: Long = 5000000L): Seq[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val parts = updates.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    require(parts.nonEmpty, "updates carry no partition values")
    val root = new HPath(path)
    val fs = FileSystem.get(root.toUri, spark.sessionState.newHadoopConf())
    val live = spark.read.parquet(path)
    require(updates.columns.toSet == live.columns.toSet,
      s"updates columns ${updates.columns.toSet} != dataset ${live.columns.toSet}")
    val slice = live.filter(col(partitionCol).isin(parts: _*))
    val survivors = slice
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    val merged = survivors.unionByName(updates.select(survivors.columns.map(col): _*))
    val tmp = new HPath(path + ".upsert.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.repartition(col(partitionCol)).write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol).mode("overwrite").parquet(tmp.toString)
    parts.foreach { v =>
      val dirName = s"$partitionCol=$v"
      val oldDir = new HPath(root, dirName)
      val newDir = new HPath(tmp, dirName)
      val bakDir = new HPath(root, dirName + ".upsert.bak")
      if (fs.exists(bakDir)) fs.delete(bakDir, true)
      val hadOld = fs.exists(oldDir)
      if (hadOld && !fs.rename(oldDir, bakDir))
        throw new java.io.IOException(s"rename $oldDir -> $bakDir failed")
      if (!fs.rename(newDir, oldDir)) {
        if (hadOld) fs.rename(bakDir, oldDir)
        throw new java.io.IOException(
          s"rename $newDir -> $oldDir failed (old partition restored)")
      }
      if (hadOld) fs.delete(bakDir, true)
    }
    fs.delete(tmp, true)
    parts
  }
}
