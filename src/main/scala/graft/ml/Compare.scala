package graft.ml

import org.apache.spark.sql.{Column, DataFrame}

import graft.ml.Models.Task

/** M5 — multi-model comparison: fit+score each spec sequentially with
  * wall-time per model (`model_evaluation_logic.py:27-79,281-314`;
  * reference keeps <=6 result cards — callers slice). Executor-parallel
  * inside each fit; the loop itself is driver-side like the reference's
  * worker thread. */
object Compare {

  case class ModelResult(model: String, metrics: Map[String, Double], seconds: Double)

  def run(train: DataFrame, test: DataFrame, labelCol: String, task: Task,
          models: Seq[String], params: Map[String, Models.Params] = Map.empty,
          seed: Long = 42L): Seq[ModelResult] =
    models.map { name =>
      val t0 = System.nanoTime()
      val m = Models.fit(train, labelCol, name, task,
        params.getOrElse(name, Map.empty), seed)
      val pred = Models.transformLabeled(m, test, labelCol, task, train = Some(train))
      val metrics = task match {
        case Models.Classification => Metrics.classificationMetrics(pred, "label", "prediction")
        case Models.Regression => Metrics.regressionMetrics(pred, "label", "prediction")
      }
      ModelResult(name, metrics, (System.nanoTime() - t0) / 1e9)
    }

  /** McNemar's test for PAIRED classifier comparison: one row
    * (n, n_a_only, n_b_only, mcnemar_chi2) where n_a_only = rows only
    * model A got right, n_b_only = rows only model B got right, and the
    * statistic is the continuity-corrected (|b-c|-1)^2/(b+c) — the
    * correct significance test when two models are evaluated on the
    * SAME rows (accuracy deltas ignore the pairing; m5's compare
    * reports them, this tests them). Truth/predictions are arbitrary
    * Columns so rule-based and model-based classifiers both fit.
    *
    * Scale shape: ONE aggregate of three counters; the statistic is a
    * fixed double tree over exact longs. b + c = 0 (identical models)
    * yields null, the honest "no discordant pairs" readout. */
  def mcnemar(df: DataFrame, truth: Column, predA: Column,
              predB: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val okA = predA <=> truth
    val okB = predB <=> truth
    val s = df.agg(count(lit(1)).as("n"),
      count(when(okA && !okB, 1)).as("n_a_only"),
      count(when(!okA && okB, 1)).as("n_b_only"))
    val b = col("n_a_only").cast("double")
    val c = col("n_b_only").cast("double")
    s.select(col("n"), col("n_a_only"), col("n_b_only"),
      round(((abs(b - c) - lit(1.0)) * (abs(b - c) - lit(1.0)))
        / (b + c), 6).as("mcnemar_chi2"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters/models on the same rows: kappa = (p_o - p_e)/(1 - p_e) with
    * p_o the observed agreement and p_e the marginal-product chance
    * agreement. The standard "do these two labelers actually agree?"
    * readout for label-quality audits (raw agreement is inflated by
    * class imbalance; kappa is not). One row (n, p_obs, p_exp, kappa).
    *
    * Scale shape: ONE contingency aggregate (map-side combined,
    * |A| x |B| dictionary-sized), marginals re-aggregate the cells,
    * p_e folds the per-class marginal products (round-9 DECIMAL sum).
    * Identical labels give kappa = 1; marginal-independent labels 0. */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = df.groupBy(aCol.as("__a"), bCol.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val rb = cells.groupBy("__b").agg(sum("__o").as("__rb"))
    val tot = cells.agg(sum("__o").as("__n"),
      sum(when(col("__a") <=> col("__b"), col("__o")).otherwise(lit(0L)))
        .as("__agree"))
    val nD = col("__n").cast("double")
    // chance agreement: sum over classes of (row share * column share)
    // r10 (r9 ADVICE): raters sharing NO class label make the marginal
    // join empty — chance agreement is genuinely 0, not null
    val pe = ra.join(rb, col("__a") <=> col("__b"))
      .crossJoin(broadcast(tot))
      .agg(coalesce(sum(round((col("__ra").cast("double") / nD) *
        (col("__rb").cast("double") / nD), 9).cast("decimal(28,9)")),
        lit(0).cast("decimal(28,9)")).as("__pe"))
    val po = col("__agree").cast("double") / nD
    val peD = col("__pe").cast("double")
    // p_e = 1 (both raters constant and equal) leaves kappa 0/0 —
    // undefined by the formula; read out NULL rather than NaN
    tot.crossJoin(broadcast(pe))
      .select(col("__n").as("n"),
        round(po, 6).as("p_obs"),
        round(peD, 6).as("p_exp"),
        when(peD >= lit(1.0), lit(null).cast("double"))
          .otherwise(round((po - peD) / (lit(1.0) - peD), 6)).as("kappa"))
  }

  /** M17 — target-column heuristic (`model_evaluation_ui.py:238-240`):
    * last column whose distinct count is < 90% of rows and that is not
    * id-like (name ending in 'key'/'id' excluded). */
  def pickTarget(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.functions._
    val n = df.count()
    val candidates = df.columns.filterNot { c =>
      val lc = c.toLowerCase
      lc.endsWith("key") || lc.endsWith("id")
    }
    if (candidates.isEmpty) None
    else {
      val distincts = df.agg(
        count_distinct(col(candidates.head)).as(candidates.head),
        candidates.tail.map(c => count_distinct(col(c)).as(c)): _*).first()
      candidates.reverse.find { c =>
        distincts.getLong(distincts.fieldIndex(c)) < 0.9 * n
      }
    }
  }
}
