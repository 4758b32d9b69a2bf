package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding-space curation for training-data pipelines: PCA projection,
  * whitening, and cluster-coverage diversity sampling — the reduce/
  * decorrelate/diversify steps semantic-dedup and data-mixing recipes
  * (e.g. SemDeDup, Abbas et al. 2023 — public method) run before
  * clustering or sampling at scale.
  *
  * Scale shapes: PCA is MLlib's (one distributed Gram/covariance pass,
  * driver-side eigendecomposition of the d x d matrix — d is the
  * embedding width, driver-sized by definition). Whitening standardizes
  * the k projected dims with ONE aggregate pass (k plan-time-known
  * codegen aggregates, no explode) and applies driver-collected scale
  * constants map-only. Diversity sampling reuses [[AnnIndex.build]]'s
  * k-means cells and ranks within cells via the range-sorted global
  * ordinal ([[Ordinals.withPerKeyRank]]) — no per-cell single reducer,
  * no keyless window.
  */
object Embeddings {

  /** PCA projection of `vecCol` to `k` dims: (id, proj array<double>).
    * MLlib PCA centers via the covariance computation; the transform
    * projects raw vectors (standard MLlib contract). */
  def pcaProject(df: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val v = df.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("__fv"))
    val model = new PCA().setK(k).setInputCol("__fv").setOutputCol("__pc").fit(v)
    model.transform(v).select(col("id"), vector_to_array(col("__pc")).as("proj"))
  }

  /** Standardize each dim of an array column to mean 0 / stddev 1
    * (whitening when the input is a PCA projection — projected dims are
    * already uncorrelated, so per-dim scaling yields ~identity
    * covariance). One aggregate pass collects 2k driver-sized stats;
    * the rewrite is a plan-time-generated `array(...)` of k codegen
    * expressions — no higher-order-function lambdas. A zero-variance
    * dim passes through centered but unscaled. */
  def whiten(df: DataFrame, projCol: String, outCol: String = "white"): DataFrame = {
    val kRow = df.select(max(size(col(projCol))).as("k")).head()
    val k = kRow.getInt(0)
    val stats: Row = df.select(
      (0 until k).flatMap(i => Seq(
        avg(element_at(col(projCol), i + 1)).as(s"m$i"),
        stddev_samp(element_at(col(projCol), i + 1)).as(s"s$i"))): _*).head()
    val dims = (0 until k).map { i =>
      val m = stats.getDouble(2 * i)
      val s = stats.getDouble(2 * i + 1)
      val centered = element_at(col(projCol), i + 1) - lit(m)
      if (s > 0.0) centered / lit(s) else centered
    }
    df.withColumn(outCol, array(dims: _*))
  }

  /** Cluster-coverage downsampling: k-means into `nlist` cells
    * ([[AnnIndex.build]]), keep up to `perCell` rows per cell by
    * deterministic seeded-hash rank. Every non-empty cell is
    * represented (perCell >= 1), so the sample preserves the corpus's
    * semantic coverage instead of its density — the standard
    * de-biasing sample for dominant-topic corpora. Returns
    * (id, cell). */
  def diversitySample(df: DataFrame, vecCol: String, idCol: String,
                      nlist: Int, perCell: Int, seed: Long = 42L): DataFrame = {
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val ix = AnnIndex.build(df.select(col(idCol), col(vecCol)), vecCol, idCol,
      nlist, seed)
    Ordinals.withPerKeyRank(ix.cells.select(col("corpus_id"), col("cell")),
        "cell", Seq(xxhash64(col("corpus_id"), lit(seed))), "__rn")
      .filter(col("__rn") <= perCell)
      .select(col("corpus_id").as("id"), col("cell"))
  }
}
