package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed n-gram profile looks like a
  * TARGET domain sample. The classifier-free cousin of quality-model
  * filtering — the selection signal most open LLM-data pipelines run
  * when they have "some in-domain text" rather than labels.
  *
  * Model: features are lowercased whitespace unigrams AND bigrams,
  * hashed into `buckets` cells (hashed n-gram bag, the paper's §3
  * parameterization). Two multinomials over the cells — target p̂ and
  * raw q̂, each add-1 smoothed — give every document a log importance
  * weight `log w(x) = Σ_features log p̂[b] − log q̂[b]`, and selection
  * takes the top-k weights (the zero-temperature limit of the paper's
  * Gumbel resample, chosen here for exact replayability).
  *
  * Scale shape (100 TB raw corpus, MB-scale target sample):
  *  - both cell-count tables partial-aggregate on the hash key to at
  *    most `buckets` rows — driver/broadcast-sized BY CONSTRUCTION
  *    regardless of corpus size (this is why DSIR hashes);
  *  - the log-ratio table joins into the raw feature stream as a
  *    BROADCAST, so scoring is explode → broadcast-join → one
  *    repartition-by-doc rollup: a single corpus exchange end to end;
  *  - top-k plans as TakeOrderedAndProject (per-partition heaps, no
  *    global sort).
  *
  * Determinism: cell ids come from [[Hashing.md5Int]] (engine-portable
  * md5 arithmetic), the per-cell log ratio is an identical IEEE
  * expression tree in SQL, and ranking applies the t12 rule (round to
  * 6 decimals BEFORE the rank, ties on doc id), so the driver oracle
  * replays the selection exactly.
  */
object Dsir {

  /** Hashed feature OCCURRENCE rows (id, bucket): one row per unigram
    * and per adjacent-pair bigram ("v w"), bucket = md5Int(feature) mod
    * `buckets`. Unigrams never contain whitespace and bigrams always
    * do, so the two families only meet through hash collisions — which
    * hashed-feature models accept by design. Map-only. */
  def featureRows(df: DataFrame, textCol: String, idCol: String,
                  buckets: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      Text.tokens(lower(col(textCol))).as("__t"))
    val sz = size(col("__t"))
    val uni = base.select(col("id"), explode(col("__t")).as("__f"))
      .filter(col("__f") =!= "")
    val bi = base.filter(sz >= 2).select(col("id"),
      explode(zip_with(
        slice(col("__t"), lit(1), sz - 1),
        slice(col("__t"), lit(2), sz - 1),
        (v, w) => concat(v, lit(" "), w))).as("__f"))
    uni.unionByName(bi)
      .select(col("id"),
        pmod(Hashing.md5Int(col("__f")), lit(buckets.toLong)).as("bucket"))
  }

  /** Per-cell smoothed log importance ratio
    * `ln((tc+1)/(T+B)) − ln((rc+1)/(R+B))` over every cell observed in
    * either corpus (absent cells smooth to count 0). At most `buckets`
    * rows — tiny by construction, broadcast by the caller. */
  private def logRatio(raw: DataFrame, target: DataFrame, textCol: String,
                       idCol: String, buckets: Int): DataFrame = {
    val rc = featureRows(raw, textCol, idCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("__rc"))
    val tc = featureRows(target, textCol, idCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("__tc"))
    val cells = rc.join(tc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("__rc"), lit(0L)).as("__rc"),
        coalesce(col("__tc"), lit(0L)).as("__tc"))
    val tot = cells.agg(sum("__rc").as("__R"), sum("__tc").as("__T"))
    val b = lit(buckets.toLong)
    cells.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("__tc") + 1L).cast(DoubleType) /
             (col("__T") + b).cast(DoubleType)) -
         log((col("__rc") + 1L).cast(DoubleType) /
             (col("__R") + b).cast(DoubleType))).as("__lr"))
  }

  /** Log importance weight per raw document: (id, n_feats, logw) with
    * `logw = round(Σ c_b · lr_b, 6)` (the t13 rounding contract) and
    * `n_feats` the doc's total feature occurrences. Documents with no
    * features (empty text) are absent — nothing to weigh. */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        idCol: String, buckets: Int = 512): DataFrame =
    featureRows(raw, textCol, idCol, buckets)
      .repartition(col("id"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("__c"))
      .join(broadcast(logRatio(raw, target, textCol, idCol, buckets)), "bucket")
      .groupBy("id")
      .agg(sum("__c").as("n_feats"),
        round(sum(col("__c").cast(DoubleType) * col("__lr")), 6).as("logw"))
      .withColumnRenamed("id", idCol)

  /** Top-`k` raw documents by importance weight, ties on doc id — the
    * deterministic selection step. */
  def selectTopK(raw: DataFrame, target: DataFrame, textCol: String,
                 idCol: String, k: Int, buckets: Int = 512): DataFrame =
    importanceWeights(raw, target, textCol, idCol, buckets)
      .orderBy(col("logw").desc, col(idCol).asc)
      .limit(k)

  /** The trained log-ratio table as `buckets` driver doubles (cells
    * unseen in either corpus get the fully-smoothed default) — the
    * artifact [[scoreMapOnly]] ships as a plan literal. One O(buckets)
    * collect by construction. */
  def logRatioTable(raw: DataFrame, target: DataFrame, textCol: String,
                    idCol: String, buckets: Int = 512): Array[Double] = {
    val lr = logRatio(raw, target, textCol, idCol, buckets)
    val tot = featureRows(raw, textCol, idCol, buckets)
      .agg(count(lit(1)).as("r")).crossJoin(
        featureRows(target, textCol, idCol, buckets).agg(count(lit(1)).as("t")))
      .head()
    // absent-cell default: both counts smooth to 1
    val default = math.log(1.0 / (tot.getLong(1).toDouble + buckets)) -
      math.log(1.0 / (tot.getLong(0).toDouble + buckets))
    val out = Array.fill(buckets)(default)
    lr.collect().foreach(r => out(r.getLong(0).toInt) = r.getDouble(1))
    out
  }

  /** MAP-ONLY scoring under a trained table (native `dsir_score`): the
    * fit-once / score-anywhere seam — zero shuffles, zero state, so the
    * same call scores a 100 TB batch at scan speed or an unbounded
    * STREAMING DataFrame (the d15 decontamination design applied to
    * domain selection). Emits the raw unrounded weight; agreement with
    * [[importanceWeights]] is FP-associativity-tolerant (the aggregate
    * path sums per cell, this one per occurrence). */
  def scoreMapOnly(df: DataFrame, textCol: String, idCol: String,
                   table: Array[Double]): DataFrame =
    df.select(col(idCol),
      call_function("dsir_score", col(textCol),
        typedLit(table.toSeq)).as("logw_raw"))
}
