package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (k-means) ANN index — the vector-search production
  * shape: the coarse quantizer is fitted ONCE, and the cell assignment
  * becomes the PARQUET PARTITION LAYOUT, so a top-k query against the
  * loaded index reads only its probed cells from disk (dynamic partition
  * pruning through the broadcast probe join — the directory structure IS
  * the index). Mirrors [[LshIndex]] for embeddings:
  *
  *   - `centroids` (cell, __cv): the nlist k-means centers — tiny,
  *     broadcast at query time;
  *   - `cells` (corpus_id, cv, cell): vectors partitioned by cell.
  *
  * [[append]] assigns new vectors to the EXISTING centroids (no refit —
  * the standard IVF ingest contract; re-balance by rebuilding when drift
  * matters) and appends only the affected cell directories.
  */
object AnnIndex {
  import Similarity.{dp, topKPerQuery}

  case class Index(centroids: DataFrame, cells: DataFrame,
                   nlist: Int, seed: Long)

  /** Fit the coarse quantizer and assign every vector (MLlib KMeans on
    * the corpus; assignment rides the fitted model). */
  def build(df: DataFrame, vecCol: String, idCol: String, nlist: Int,
            seed: Long = 42L): Index = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = df.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val feat = c.withColumn("__fv", array_to_vector(col("cv")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("cell").fit(feat)
    val spark = df.sparkSession
    import spark.implicits._
    val centArr = km.clusterCenters.zipWithIndex
      .map { case (v, cid) => (cid, v.toArray.toSeq) }.toSeq.toDF("cell", "__cv")
    Index(centArr, km.transform(feat).select(col("corpus_id"), col("cv"), col("cell")),
      nlist, seed)
  }

  /** Persist: cells partitioned BY CELL (the layout is the index),
    * centroids + params as plain tables. */
  def save(ix: Index, path: String, mode: String = "error"): Unit = {
    ix.cells.write.mode(mode).partitionBy("cell").parquet(s"$path/cells")
    ix.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    val spark = ix.cells.sparkSession
    import spark.implicits._
    Seq((ix.nlist, ix.seed)).toDF("nlist", "seed")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def load(spark: SparkSession, path: String): Index = {
    val p = spark.read.parquet(s"$path/params").head()
    // tombstone-filtered view, as in LshIndex.load: deletes on an
    // append-only index are broadcast anti-joined ids; rebuild to reclaim
    val cells0 = spark.read.parquet(s"$path/cells")
    val cells =
      if (LshIndex.hadoopExists(spark, s"$path/tombstones"))
        cells0.join(broadcast(spark.read.parquet(s"$path/tombstones")),
          Seq("corpus_id"), "left_anti")
      else cells0
    Index(spark.read.parquet(s"$path/centroids"), cells,
      p.getAs[Int]("nlist"), p.getAs[Long]("seed"))
  }

  /** Delete vectors without rewriting cells: tombstone ids filtered out
    * by [[load]]. */
  def remove(ids: DataFrame, path: String): Unit =
    ids.toDF("corpus_id").write.mode("append").parquet(s"$path/tombstones")

  /** Nearest-centroid assignment from the centroid TABLE (no model
    * object needed — works on a loaded index): argmin squared distance
    * via a min-struct aggregate over the broadcast centroid set. */
  def assign(df: DataFrame, index: Index, vecCol: String, idCol: String): DataFrame = {
    val v = df.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    v.crossJoin(broadcast(index.centroids))
      .withColumn("__d2", dp(col("cv"), col("cv")) -
        lit(2.0) * dp(col("cv"), col("__cv")) + dp(col("__cv"), col("__cv")))
      .groupBy("corpus_id")
      .agg(min(struct(col("__d2"), col("cell"), col("cv"))).as("__best"))
      .select(col("corpus_id"), col("__best.cv").as("cv"), col("__best.cell").as("cell"))
  }

  /** Assign new vectors to the existing centroids and append their cell
    * files — no refit, no rewrite of existing cells. */
  def append(newVecs: DataFrame, index: Index, path: String,
             vecCol: String, idCol: String): Unit =
    assign(newVecs, index, vecCol, idCol)
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")

  /** Top-k cosine against the index: nprobe nearest cells per query
    * (broadcast centroids), then a broadcast probe join into the cells —
    * on a loaded index the probe prunes to the matching cell
    * DIRECTORIES (dynamic partition pruning), so disk reads scale with
    * nprobe/nlist, not corpus size. */
  def topK(index: Index, queries: DataFrame, vecCol: String, idCol: String,
           k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val qCells = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"), col("cell"),
        (dp(col("qv"), col("qv")) - lit(2.0) * dp(col("qv"), col("__cv")) +
          dp(col("__cv"), col("__cv"))).as("__d2"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("__d2"), asc("cell"))
    val probes = qCells.withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe).select("query_id", "cell")
    val qp = q.join(probes, "query_id")
      .withColumn("__qn", sqrt(dp(col("qv"), col("qv"))))
    val scored = index.cells.withColumn("__cn", sqrt(dp(col("cv"), col("cv"))))
      .join(broadcast(qp), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (dp(col("cv"), col("qv")) / (col("__cn") * col("__qn"))).as("cosine"))
    topKPerQuery(scored, k)
  }
}
