package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, Text}

/** The END-TO-END streaming corpus pipeline: every stage the batch
  * cleaning recipe runs, composed into one `foreachBatch` step —
  *
  *   1. [[IngestDedup.step]]: near-dup check against the persisted LSH
  *      index (history wins; within-batch clusters keep min id), index
  *      grows by the survivors;
  *   2. [[Dedup.decontaminateWithBloom]]: zero-shuffle benchmark
  *      decontamination against a bloom built ONCE at pipeline start;
  *   3. quality gate: `Text.qualityScore >= minQuality` — a FIXED
  *      threshold, deliberately not the batch-relative median of
  *      [[graft.ops.Corpus.qualityGate]], because a per-micro-batch
  *      median would make results depend on batch boundaries (stream
  *      and batch would diverge; a fixed rule is the stream-safe form);
  *   4. [[graft.io.CorpusSink.appendPartitioned]]: partitioned append.
  *
  * Because stages 2-4 are stateless and stage 1's state lives in the
  * persisted index, running the SAME [[step]] over the same batches in
  * the same order in BATCH mode produces the identical corpus — the
  * st11 query and CorpusPipelineSpec assert that equality bit for bit.
  * Delivery is `foreachBatch` at-least-once (see [[IngestDedup]]'s
  * contract: replays can only over-drop, never resurrect a dup).
  */
object CorpusPipeline {

  /** Pipeline configuration: dedup index + banding threshold, prebuilt
    * benchmark bloom (from [[Dedup.benchmarkBloom]]), shingle width,
    * overlap + quality thresholds, output layout. */
  case class Config(indexPath: String, threshold: Double,
                    bloom: Option[Array[Byte]], n: Int, maxOverlap: Double,
                    minQuality: Double, outDir: String, partitionCol: String,
                    textCol: String = "text", idCol: String = "doc_id")

  /** One micro-batch through all four stages; also THE batch-backfill
    * unit — the batch pipeline is a fold of this over ordered batches. */
  def step(batch: DataFrame, cfg: Config): Unit = {
    val kept = IngestDedup.step(batch, cfg.indexPath, cfg.textCol, cfg.idCol,
      cfg.threshold)
    val clean = cfg.bloom match {
      case Some(bf) =>
        Dedup.decontaminateWithBloom(kept, bf, cfg.textCol, cfg.n, cfg.maxOverlap)
      case None => kept
    }
    val gated = clean.filter(Text.qualityScore(col(cfg.textCol)) >= cfg.minQuality)
    graft.io.CorpusSink.appendPartitioned(gated, cfg.outDir, cfg.partitionCol)
  }

  /** Continuous form: parquet file stream -> per-batch [[step]].
    * `maxFilesPerTrigger=1` keeps file boundaries as batch boundaries.
    * Caller awaits/stops the query. */
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
