package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding search (Jégou et al. 2011) — the
  * memory-scale ANN path: a 64-dim float vector (256 B) becomes m
  * single-byte-range codes (m ints here; bytes on disk via parquet
  * dictionary encoding), and query scoring reads a per-query lookup
  * table instead of doing per-dimension arithmetic.
  *
  * Division of labor, all Spark-first:
  *  - TRAIN on a deterministic sample: m independent MLlib k-means fits
  *    over sliced subvectors; the codebook collapses to
  *    `m * k * dsub` doubles of DRIVER state (m=8, k=16, dim=64 ->
  *    1 KB) that rides every later plan as a literal.
  *  - ENCODE map-only: the native `pq_encode` kernel
  *    ([[graft.functions.PqEncode]]) — no explode, no argmin
  *    aggregate, no shuffle; 100 TB of embeddings stream through in
  *    one pass.
  *  - SEARCH: queries precompute `pq_lut` tables (m*k doubles each,
  *    broadcast), the code corpus cross-joins the broadcast and sums m
  *    table reads per candidate via `pq_adc` — whole-stage codegen end
  *    to end, then the salted two-phase top-k (no per-query single
  *    reducer).
  *
  * Exactness contract: ADC is an approximation of squared L2 by
  * construction (that's the published algorithm, not an implementation
  * shortcut); the driver entry hashes construction invariants and the
  * spec pins recall against the exact scan.
  */
object Pq {

  /** Flat trained codebook: `cents[(s*k + c)*dsub + j]`, `dsub = dim/m`. */
  case class Codebooks(m: Int, k: Int, dim: Int, cents: Array[Double]) {
    private[ops] def centsCol: Column = typedLit(cents.toSeq)
  }

  /** Fit per-subspace codebooks on a deterministic sample (first
    * `sampleRows` by id — TakeOrdered, driver-bounded). `dim` must
    * divide into `m` equal subspaces. */
  def train(df: DataFrame, vecCol: String, idCol: String, m: Int = 8,
            k: Int = 16, sampleRows: Int = 10000, seed: Long = 42L): Codebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // The sample feeds every Lloyd iteration of every subspace fit —
    // uncached, each of the m fits re-runs the TakeOrdered scan of the
    // corpus. Materialize it once (10k rows — trivial executor storage).
    val sample = df.orderBy(col(idCol)).limit(sampleRows)
      .select(col(vecCol).cast("array<double>").as("cv"))
      .persist()
    val dim = sample.select(size(col("cv"))).head.getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val cents = new Array[Double](m * k * dsub)
    // The m subspace fits are independent (disjoint output regions,
    // per-subspace seeds): submit them as CONCURRENT Spark jobs — each
    // fit's jobs are tiny (a 10k-row sample = 1-2 tasks), so serial
    // fits left the cluster idle. Deterministic: same seeds, same
    // sample, no shared state.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fits = (0 until m).map { s => Future {
      val feat = sample
        .select(array_to_vector(slice(col("cv"), s * dsub + 1, dsub)).as("__fv"))
      val km = new KMeans().setK(k).setSeed(seed + s)
        .setFeaturesCol("__fv").setPredictionCol("__c").fit(feat)
      km.clusterCenters.zipWithIndex.foreach { case (cent, c) =>
        System.arraycopy(cent.toArray, 0, cents, (s * k + c) * dsub, dsub)
      }
    } }
    Await.result(Future.sequence(fits), Duration.Inf)
    sample.unpersist()
    Codebooks(m, k, dim, cents)
  }

  /** Map-only encoding: (idCol, codes array<int>). */
  def encode(df: DataFrame, vecCol: String, idCol: String,
             cb: Codebooks): DataFrame =
    df.select(col(idCol),
      call_function("pq_encode", col(vecCol).cast("array<double>"),
        cb.centsCol, lit(cb.m)).as("codes"))

  /** ADC top-k: for each query, the k corpus vectors with smallest
    * approximate squared L2 distance (ties on corpus id). The corpus
    * side carries CODES ONLY. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, cb: Codebooks): DataFrame = {
    val codes = encode(corpus, vecCol, idCol, cb)
      .withColumnRenamed(idCol, "corpus_id")
    val q = queries.select(col(idCol).as("query_id"),
      call_function("pq_lut", col(vecCol).cast("array<double>"),
        cb.centsCol, lit(cb.m)).as("__lut"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        call_function("pq_adc", col("codes"), col("__lut")).as("adc_d2"))
    Similarity.topKPerQuery(scored, k,
      score = "adc_d2", smallerIsBetter = true)
  }

  /** ADC shortlist + exact re-rank (the production IVFADC tail, Jégou
    * et al. §V): `pq_adc` prunes the corpus to `shortlist` candidates
    * per query — reading CODES only — then just those candidates'
    * true vectors are fetched (a join carrying |queries|·shortlist
    * rows, nothing corpus-sized) and re-ranked with exact distances.
    * Recall approaches the exact scan while the full-precision reads
    * stay O(shortlist/corpus). */
  def adcRerankTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                    idCol: String, k: Int, cb: Codebooks,
                    shortlist: Int = 0): DataFrame = {
    val r = if (shortlist > 0) shortlist else 4 * k
    val cand = adcTopK(corpus, queries, vecCol, idCol, r, cb)
      .select("query_id", "corpus_id")
    val dp = (a: Column, b: Column) => call_function("dot_product", a, b)
    val cv = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = cand.join(cv, "corpus_id").join(broadcast(qv), "query_id")
      .select(col("query_id"), col("corpus_id"),
        (dp(col("cv"), col("cv")) - lit(2.0) * dp(col("cv"), col("qv")) +
          dp(col("qv"), col("qv"))).as("d2"))
    Similarity.topKPerQuery(scored, k,
      score = "d2", smallerIsBetter = true)
  }

  /** Persisted PQ index: codes + full vectors + the flat codebook.
    * Codes are the SCAN side (m ints/vector — the table the ADC pass
    * reads); vectors exist only for the re-rank fetch, stored as their
    * own column-pruned table. The codebook and params are driver-sized.
    * Same durability contract as [[AnnIndex]]/[[LshIndex]]: appends
    * assign under the FROZEN codebook (no refit, no rewrite), deletes
    * are tombstoned ids filtered at load (Hadoop-FS probe, works on
    * hdfs/s3a), rebuild to reclaim. */
  case class PqIndex(cb: Codebooks, codes: DataFrame, vectors: DataFrame)

  def saveIndex(df: DataFrame, vecCol: String, idCol: String, cb: Codebooks,
                path: String, mode: String = "error"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    encode(df, vecCol, idCol, cb).write.mode(mode).parquet(s"$path/codes")
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .write.mode(mode).parquet(s"$path/vectors")
    Seq((cb.m, cb.k, cb.dim, cb.cents.toSeq)).toDF("m", "k", "dim", "cents")
      .write.mode("overwrite").parquet(s"$path/codebook")
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): PqIndex = {
    val cbRow = spark.read.parquet(s"$path/codebook").head()
    val cb = Codebooks(cbRow.getAs[Int]("m"), cbRow.getAs[Int]("k"),
      cbRow.getAs[Int]("dim"), cbRow.getSeq[Double](3).toArray)
    def tombFiltered(t: DataFrame, id: String): DataFrame =
      if (LshIndex.hadoopExists(spark, s"$path/tombstones"))
        t.join(broadcast(spark.read.parquet(s"$path/tombstones")
          .toDF(id)), Seq(id), "left_anti")
      else t
    val id = spark.read.parquet(s"$path/codes").columns.head
    PqIndex(cb, tombFiltered(spark.read.parquet(s"$path/codes"), id),
      tombFiltered(spark.read.parquet(s"$path/vectors"), id))
  }

  /** Append new vectors under the frozen codebook. */
  def appendIndex(newVecs: DataFrame, vecCol: String, idCol: String,
                  cb: Codebooks, path: String): Unit = {
    encode(newVecs, vecCol, idCol, cb).write.mode("append").parquet(s"$path/codes")
    newVecs.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .write.mode("append").parquet(s"$path/vectors")
  }

  /** Tombstone ids out of the index (filtered by [[loadIndex]]). */
  def removeFromIndex(ids: DataFrame, idCol: String, path: String): Unit =
    ids.select(col(idCol)).write.mode("append").parquet(s"$path/tombstones")

  /** ADC shortlist + exact re-rank against a LOADED index: the scan
    * reads codes only; true vectors join in for just the shortlist. */
  def indexTopK(ix: PqIndex, queries: DataFrame, vecCol: String,
                idCol: String, k: Int, shortlist: Int = 0): DataFrame = {
    val r = if (shortlist > 0) shortlist else 4 * k
    val idName = ix.codes.columns.head
    val q = queries.select(col(idCol).as("query_id"),
      call_function("pq_lut", col(vecCol).cast("array<double>"),
        ix.cb.centsCol, lit(ix.cb.m)).as("__lut"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = ix.codes.withColumnRenamed(idName, "corpus_id")
      .crossJoin(broadcast(q.select("query_id", "__lut")))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        call_function("pq_adc", col("codes"), col("__lut")).as("adc_d2"))
    val cand = Similarity.topKPerQuery(scored, r,
      score = "adc_d2", smallerIsBetter = true).select("query_id", "corpus_id")
    val dp = (a: Column, b: Column) => call_function("dot_product", a, b)
    val cv = ix.vectors.withColumnRenamed(idName, "corpus_id")
      .withColumnRenamed("v", "cv")
    val rescored = cand.join(cv, "corpus_id")
      .join(broadcast(q.select("query_id", "qv")), "query_id")
      .select(col("query_id"), col("corpus_id"),
        (dp(col("cv"), col("cv")) - lit(2.0) * dp(col("cv"), col("qv")) +
          dp(col("qv"), col("qv"))).as("d2"))
    Similarity.topKPerQuery(rescored, k,
      score = "d2", smallerIsBetter = true)
  }

  /** IVFADC (Jégou et al. 2011 §V: coarse quantizer + PQ codes): the
    * k-means cell assignment becomes the parquet PARTITION layout of
    * the code table, so a probe reads only its nprobe cells' code
    * directories (dynamic partition pruning) AND scans them as codes,
    * not vectors — the two pruning axes of billion-scale ANN composed.
    * Vectors are partitioned the same way; the re-rank fetch is both
    * cell-pruned and shortlist-sized. This variant quantizes RAW
    * vectors (not residuals) — one codebook serves every cell, trading
    * some quantization error for a driver-trivial artifact. */
  case class IvfAdc(cb: Codebooks, nlist: Int, centroids: DataFrame,
                    codes: DataFrame, vectors: DataFrame)

  def saveIvfAdc(df: DataFrame, vecCol: String, idCol: String, cb: Codebooks,
                 nlist: Int, path: String, seed: Long = 42L,
                 mode: String = "error"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val ix = AnnIndex.build(df, vecCol, idCol, nlist, seed)
    ix.cells.select(col("corpus_id"), col("cell"),
        call_function("pq_encode", col("cv"), cb.centsCol, lit(cb.m)).as("codes"))
      .write.mode(mode).partitionBy("cell").parquet(s"$path/codes")
    ix.cells.select("corpus_id", "cell", "cv")
      .write.mode(mode).partitionBy("cell").parquet(s"$path/vectors")
    ix.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Seq((cb.m, cb.k, cb.dim, cb.cents.toSeq, nlist))
      .toDF("m", "k", "dim", "cents", "nlist")
      .write.mode("overwrite").parquet(s"$path/codebook")
  }

  def loadIvfAdc(spark: org.apache.spark.sql.SparkSession,
                 path: String): IvfAdc = {
    val r = spark.read.parquet(s"$path/codebook").head()
    IvfAdc(Codebooks(r.getAs[Int]("m"), r.getAs[Int]("k"),
        r.getAs[Int]("dim"), r.getSeq[Double](3).toArray),
      r.getAs[Int]("nlist"),
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/vectors"))
  }

  /** Probe a loaded IVFADC index: nprobe nearest cells per query
    * (broadcast centroids), ADC over just those cells' CODE partitions,
    * exact re-rank over the shortlist's cell-pruned vectors. */
  def ivfAdcTopK(ix: IvfAdc, queries: DataFrame, vecCol: String,
                 idCol: String, k: Int, nprobe: Int = 2,
                 shortlist: Int = 0): DataFrame = {
    val r = if (shortlist > 0) shortlist else 4 * k
    val dp = (a: Column, b: Column) => call_function("dot_product", a, b)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      call_function("pq_lut", col(vecCol).cast("array<double>"),
        ix.cb.centsCol, lit(ix.cb.m)).as("__lut"))
    val qc = q.crossJoin(broadcast(ix.centroids))
      .select(col("query_id"), col("cell").as("corpus_id"),
        (dp(col("qv"), col("qv")) - lit(2.0) * dp(col("qv"), col("__cv")) +
          dp(col("__cv"), col("__cv"))).as("__d2"))
    val probes = Similarity.topKPerQuery(
        qc.select(col("query_id"), col("corpus_id"),
          col("__d2").as("adc_d2")), nprobe,
        score = "adc_d2", smallerIsBetter = true)
      .select(col("query_id"), col("corpus_id").as("cell"))
    val qp = q.select("query_id", "__lut").join(probes, "query_id")
    val scored = ix.codes.join(broadcast(qp), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("cell"),
        call_function("pq_adc", col("codes"), col("__lut")).as("adc_d2"))
    val cand = Similarity.topKPerQuery(scored, r,
        score = "adc_d2", smallerIsBetter = true)
      .select("query_id", "corpus_id", "cell")
    val rescored = cand.join(ix.vectors, Seq("cell", "corpus_id"))
      .join(broadcast(q.select("query_id", "qv")), "query_id")
      .select(col("query_id"), col("corpus_id"),
        (dp(col("cv"), col("cv")) - lit(2.0) * dp(col("cv"), col("qv")) +
          dp(col("qv"), col("qv"))).as("d2"))
    Similarity.topKPerQuery(rescored, k,
      score = "d2", smallerIsBetter = true)
  }

  /** Exact squared-L2 top-k (the recall reference for [[adcTopK]]):
    * same broadcast cross-join shape, native dot products. */
  def exactL2TopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                  idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val dp = (a: Column, b: Column) => call_function("dot_product", a, b)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (dp(col("cv"), col("cv")) - lit(2.0) * dp(col("cv"), col("qv")) +
          dp(col("qv"), col("qv"))).as("d2"))
    Similarity.topKPerQuery(scored, k,
      score = "d2", smallerIsBetter = true)
  }
}
