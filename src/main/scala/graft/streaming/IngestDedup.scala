package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, LshIndex}

/** Streaming ingest dedup: the [[graft.ops.LshIndex]] incremental check
  * as a continuous pipeline. Each micro-batch is near-dup-checked against
  * the persisted index via `foreachBatch`; survivors append to the output
  * corpus AND to the index, so batch N+1 is deduplicated against batch N
  * without ever re-shingling history. Drop rule per batch:
  *
  *   - a batch doc pairing with ANY indexed doc is dropped (history wins);
  *   - within-batch near-dup clusters keep their min-id member
  *     (components over the new-new pairs — exact, not greedy).
  *
  * Delivery contract: `foreachBatch` is at-least-once — a replayed
  * micro-batch would append its index entries twice, which double-counts
  * those docs' shingle sizes on later verifies. Production hardening is
  * storage-side (write index entries keyed by (batchId, id) to an
  * idempotent/transactional store, or compact by id on load); the
  * checkpoint makes replays rare, and a replayed batch can only OVER-drop
  * (dup entries inflate hit counts, never hide a true near-dup).
  */
object IngestDedup {

  /** One micro-batch step, also usable standalone for batch backfill:
    * returns the kept docs and appends their entries to the index. */
  def step(batch: DataFrame, indexPath: String, textCol: String,
           idCol: String, threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val ix = LshIndex.load(spark, indexPath)
    // classify each pair by which sides are new (PAIR-level flags — a
    // doc can have both a new-new and a new-old pair, and one new-old
    // pair must drop it regardless of its new-new role). Two left joins
    // against the batch-id set replace the former 5-exchange set
    // algebra (2 semi-joins + intersect + 2 excepts) — pairs are
    // distinct by construction, so flag filters ARE the set operations;
    // on micro-batch-sized data each exchange is a ~100 ms scheduling
    // floor (r12: st11 is fixture-sized and job-count-bound).
    val bid = batch.select(col(idCol).as("__bid")).distinct()
    val pairs = LshIndex.incrementalPairs(batch, ix, textCol, idCol, threshold)
      .join(bid.select(col("__bid").as("id_a"), lit(true).as("__an")), Seq("id_a"), "left")
      .join(bid.select(col("__bid").as("id_b"), lit(true).as("__bn")), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("__an"), lit(false)).as("__an"),
        coalesce(col("__bn"), lit(false)).as("__bn"))
      .transform(graft.core.Materialize.frame) // tiny; reused by the splits below
    val nnPairs = pairs.filter(col("__an") && col("__bn")).select("id_a", "id_b")
    val withOld = pairs.filter(col("__an") && !col("__bn")).select(col("id_a").as("id"))
      .unionByName(pairs.filter(col("__bn") && !col("__an")).select(col("id_b").as("id")))
    val nnDrop = Dedup.components(nnPairs).filter(col("id") =!= col("comp")).select("id")
    val drop = withOld.unionByName(nnDrop).distinct().withColumnRenamed("id", idCol)
    val kept = batch.join(drop, Seq(idCol), "left_anti").transform(graft.core.Materialize.frame)
    LshIndex.save(LshIndex.entriesFor(kept, ix, textCol, idCol), indexPath,
      mode = "append")
    kept
  }

  /** Continuous form: parquet file stream -> per-batch [[step]] ->
    * survivors appended to `outDir`. `maxFilesPerTrigger=1` keeps file
    * boundaries as batch boundaries (each file deduped against all
    * earlier ones). Caller awaits/stops the query. */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            indexPath: String, outDir: String, checkpointDir: String,
            textCol: String, idCol: String, threshold: Double): StreamingQuery = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        step(batch, indexPath, textCol, idCol, threshold)
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
