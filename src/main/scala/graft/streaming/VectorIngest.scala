package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{AnnIndex, Dedup}

/** Streaming EMBEDDING ingest against the persisted [[graft.ops.AnnIndex]]
  * — [[IngestDedup]]'s vector twin: each micro-batch drops vectors whose
  * cosine against the indexed corpus reaches `threshold` (history wins)
  * or that lose their within-batch near-dup component (min id kept),
  * then appends the survivors' cells to the index — no refit, no
  * re-scan of history (the probe reads nprobe/nlist of the index via
  * partition pruning). Same at-least-once `foreachBatch` contract and
  * over-drop-only failure direction as IngestDedup.
  */
object VectorIngest {

  /** One micro-batch step (also the batch-backfill entry point):
    * returns kept vectors and appends their index entries. */
  def step(batch: DataFrame, indexPath: String, vecCol: String, idCol: String,
           threshold: Double, nprobe: Int = 2): DataFrame = {
    val spark = batch.sparkSession
    val ix = AnnIndex.load(spark, indexPath)
    // vs history: the top-1 indexed neighbor per batch vector decides
    val vsOld = AnnIndex.topK(ix, batch, vecCol, idCol, k = 1, nprobe)
      .filter(col("cosine") >= threshold)
      .select(col("query_id").as("id"))
    // within batch: exact pairs (batches are ingest-sized; pass
    // lshPlanes>0 via a pre-filter upstream if a batch is corpus-sized)
    val nn = Dedup.cosinePairs(batch, vecCol, idCol, threshold)
      .select("id_a", "id_b")
    val nnDrop = Dedup.components(nn).filter(col("id") =!= col("comp")).select("id")
    val drop = vsOld.unionByName(nnDrop).distinct().withColumnRenamed("id", idCol)
    val kept = batch.join(drop, Seq(idCol), "left_anti").transform(graft.core.Materialize.frame)
    AnnIndex.append(kept, ix, indexPath, vecCol, idCol)
    kept
  }

  /** Continuous form: parquet file stream -> per-batch [[step]] ->
    * survivors appended to `outDir`. */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            indexPath: String, outDir: String, checkpointDir: String,
            vecCol: String, idCol: String, threshold: Double,
            nprobe: Int = 2): StreamingQuery = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        step(batch, indexPath, vecCol, idCol, threshold, nprobe)
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
