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

  /** Read a partitioned corpus back. The partition column comes back
    * from directory names (string-typed unless
    * `spark.sql.sources.partitionColumnTypeInference` applies). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
