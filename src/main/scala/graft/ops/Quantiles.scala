package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based quantile panels over the native mergeable
  * [[graft.functions.KllQuantiles]] aggregate (`kll_quantiles`) — the
  * streaming-legal, single-pass complement of the EXACT
  * histogram-rank selection (`Relational.exactValuesAtRanks`).
  *
  * Reference behavior: the per-column describe()/quantile panels
  * (`data_analysis_ui.py` summary tabs) compute exact percentiles on
  * eager in-memory frames — fine at 500k rows, impossible as one pass
  * at 100 TB. The sketch panel here is ONE map-side-combined aggregate
  * whose state is O(k log(n/k)) doubles per group and whose merge is
  * associative, so it runs identically in batch groupBy, incremental
  * (per-partition then merged) shapes, and Structured Streaming
  * windowed aggregations — with a SELF-REPORTED worst-case rank-error
  * bound that [[auditEstimates]] turns into an oracle-checkable
  * contract.
  */
object Quantiles {

  /** Per-group quantile ESTIMATES: one row per (group, percentile) with
    * the group's exact row count, the sketch's worst-case rank-error
    * bound, and the estimate. One aggregate, no second scan. */
  def sketchQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                      probs: Seq[Double], k: Int = 256): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__x"))
    base.groupBy("__g")
      .agg(call_function("kll_quantiles", col("__x"), lit(k),
        array(probs.map(lit): _*)).as("__sk"))
      .select(col("__g").as(groupCol), col("__sk.n").as("n"),
        col("__sk.err").as("rank_err_bound"),
        posexplode(col("__sk.est")))
      .select(col(groupCol), col("n"), col("rank_err_bound"),
        element_at(array(probs.map(lit): _*), col("pos") + 1)
          .as("percentile"),
        col("col").as("estimate"))
  }

  /** The exact-vs-bound CONTRACT check shared by a46 and st15: each
    * estimate's TRUE rank interval [count_lt+1, count_le] must
    * intersect [r - err, r + err], where r = greatest(1, ceil(p*n)) is
    * the target rank (the IDENTICAL IEEE tree the sketch's eval and
    * the DuckDB oracle compute) and `err` the sketch's self-reported
    * bound — guaranteed by the compaction accounting under ANY
    * partition/merge order, so `within_bound` is deterministically
    * TRUE even though the estimate itself is not deterministic.
    *
    * `est` must be [[sketchQuantiles]]-shaped: (groupOut, n,
    * rank_err_bound, percentile, estimate). Output: (groupOut,
    * percentile, n, exact_value, within_bound); `exact_value` (the
    * true value at rank r, via the per-key global-rank sort) and `n`
    * are exact and cross-engine checkable, `within_bound` is the
    * in-engine verification the oracle pins to literal TRUE.
    *
    * Scale shape: one broadcast-join rank-count aggregate plus one
    * range sort — the audit is O(n log n) BY DESIGN (it exists to
    * verify the sketch); production callers use [[sketchQuantiles]]
    * alone. */
  def auditEstimates(df: DataFrame, valueCol: String, est: DataFrame,
                     groupOut: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupOut).isNotNull)
      .select(col(groupOut).as("__g"), col(valueCol).cast("double").as("__x"))
    val spine = est.select(col(groupOut).as("__g"), col("n").as("__n"),
        col("rank_err_bound").as("__e"), col("percentile"),
        col("estimate").as("__est"))
      .withColumn("__tr",
        greatest(lit(1L), ceil(col("percentile") * col("__n").cast("double"))))
    val rankCounts = base
      .join(broadcast(spine.select(col("__g"), col("percentile"), col("__est"))),
        Seq("__g"))
      .groupBy(col("__g"), col("percentile"))
      .agg(count(when(col("__x") < col("__est"), 1)).as("__lt"),
        count(when(col("__x") <= col("__est"), 1)).as("__le"))
    val ranked = Ordinals.withPerKeyRank(base, "__g", Seq(col("__x").asc), "__r")
    val exacts = ranked
      .join(broadcast(spine.select(col("__g"), col("percentile"), col("__tr"))
        .withColumnRenamed("__g", "__gk")),
        col("__g") === col("__gk") && (col("__r") === col("__tr")))
      .select(col("__g"), col("percentile"), col("__x").as("__exact"))
    spine.join(rankCounts, Seq("__g", "percentile"))
      .join(exacts, Seq("__g", "percentile"))
      .select(col("__g").as(groupOut), col("percentile"),
        col("__n").as("n"),
        round(col("__exact"), 6).as("exact_value"),
        (((col("__lt") + lit(1L)) <= (col("__tr") + col("__e"))) &&
          (col("__le") >= (col("__tr") - col("__e")))).as("within_bound"))
  }

  /** [[sketchQuantiles]] + [[auditEstimates]] in one call (a46's shape). */
  def sketchQuantileAudit(df: DataFrame, valueCol: String, groupCol: String,
                          probs: Seq[Double], k: Int = 256): DataFrame =
    auditEstimates(df, valueCol,
      sketchQuantiles(df, valueCol, groupCol, probs, k), groupCol)
}
