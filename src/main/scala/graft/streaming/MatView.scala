package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.io.{AggManifest, CorpusSink}

/** Streaming materialized view: every micro-batch appends to the
  * hive-partitioned dataset and incrementally maintains the
  * [[AggManifest]] partials for EXACTLY the partitions the batch
  * touched — the continuously-fresh corpus statistics a training-data
  * pipeline reads on every admission decision, at O(batch) refresh
  * cost instead of O(corpus).
  *
  * Stream==batch contract: [[step]] is stateless outside the dataset +
  * manifest on disk, so folding the same batches in the same order in
  * batch mode produces the identical manifest — and because the
  * partials are order-independent integer/DECIMAL sums, the manifest
  * ALSO equals a from-scratch aggregate over the final dataset, which
  * is what the st12 oracle checks (batch-boundary independence:
  * however the stream was chopped, the statistics cannot differ).
  * Delivery is foreachBatch at-least-once; a replayed batch would
  * double-append (the same caveat as any file-append sink without a
  * table-format log — documented, and the refresh itself stays correct
  * relative to whatever the dataset holds).
  */
object MatView {

  case class Config(outDir: String, partitionCol: String, valueCol: String)

  /** One micro-batch: partitioned append + manifest maintain for the
    * batch's touched partition values. */
  def step(batch: DataFrame, cfg: Config): Unit = {
    val touched = batch.select(col(cfg.partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (touched.nonEmpty) {
      CorpusSink.appendPartitioned(batch, cfg.outDir, cfg.partitionCol)
      AggManifest.maintain(batch.sparkSession, cfg.outDir, cfg.partitionCol,
        cfg.valueCol, touched)
    }
  }

  /** Continuous form: parquet file stream -> per-batch [[step]]. */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            cfg: Config, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => step(batch, cfg) }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
