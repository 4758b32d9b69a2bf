package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split conformal prediction — distribution-free prediction intervals
  * with finite-sample marginal coverage (Vovk et al.; Lei et al. 2018,
  * "Distribution-Free Predictive Inference for Regression"): fit on a
  * train split, take the ceil(level*(n_cal+1))-th smallest absolute
  * residual on a held-out calibration split as the radius q̂, and emit
  * [pred - q̂, pred + q̂] on the test split. The reference surface stops
  * at point predictions (M12/M16); any pipeline gating data or model
  * admission on uncertainty needs the interval, so this is the natural
  * extension next to m23's ridge.
  *
  * Scale shape: the fit is [[Ridge]]'s one-aggregate sufficient-
  * statistics pass restricted to the train split (one exchange of ONE
  * row); predictions are map-only; the calibration quantile is an exact
  * order statistic from [[graft.ops.Relational.exactValuesAtRanks]]'
  * histogram-refinement selection (never a value collect, a range sort,
  * or a single-partition window) — q̂ is one driver double. Nothing
  * anywhere is sized by the data except the test-split output itself.
  *
  * Exactness contract: identical to m23 — decimal(12,4)/(8,3) sufficient
  * sums (order-independent), one fixed double tree for (w, b), per-row
  * residuals one fixed tree, and the quantile INDEX uses the literal
  * `level` double so ceil(level * (n_cal + 1.0)) is the same IEEE
  * product in any engine. Residual ties at the quantile rank are
  * harmless: the tie-broken rank picks one row but every tied row
  * carries the same score value.
  */
object Conformal {

  /** Interval rows for the test split: idCols ++ (pred, lo, hi), rounded
    * to `roundTo`. `splitCol` must evaluate to 0 (train), 1 (calibration)
    * or 2 (test) — a deterministic function of the row, e.g. a key
    * modulus, so the split is replayable. */
  def splitConformal(df: DataFrame, targetCol: String, featureCol: String,
                     splitCol: Column, idCols: Seq[String],
                     lambda: Double, level: Double = 0.9,
                     roundTo: Int = 4): DataFrame = {
    val both = col(featureCol).isNotNull && col(targetCol).isNotNull
    val tagged = df.withColumn("__split", splitCol)
    // ridge sufficient statistics over the TRAIN split only (m23's
    // exact-decimal contract; see Ridge for the casts' rationale)
    val inTrain = both && (col("__split") === 0)
    val x = when(inTrain, col(featureCol)).cast("decimal(12,4)")
    val y = when(inTrain, col(targetCol)).cast("decimal(8,3)")
    val s = tagged.agg(
      count(when(inTrain, 1)).cast("double").as("__n"),
      sum(x).cast("double").as("__sx"), sum(y).cast("double").as("__sy"),
      sum(x * y).cast("double").as("__sxy"),
      sum(x * x).cast("double").as("__sxx"))
    val n = col("__n")
    val mx = col("__sx") / n
    val my = col("__sy") / n
    val w = (col("__sxy") - (n * (mx * my))) /
      ((col("__sxx") - (n * (mx * mx))) + (lit(lambda) * n))
    val b = my - (w * mx)
    val scored = tagged
      .crossJoin(broadcast(s.select(w.as("__w"), b.as("__b"))))
      .withColumn("__pred", (col("__w") * col(featureCol)) + col("__b"))
    val cal = scored.filter(both && (col("__split") === 1))
      .select(abs(col(targetCol) - col("__pred")).as("__score"))
    // The radius is an ORDER STATISTIC of the scores: the value at rank
    // ceil(level*(n_cal+1)) of the ascending order — ties at the
    // quantile rank all carry the same score, so any tie-break picks the
    // identical double. r14: selected IN-PLAN (one distributed global
    // rank + a broadcast scalar) instead of the former driver-side
    // histogram refinement, which ran ~4 extra actions, each re-running
    // the calibration lineage (ridge aggregate included). The r9
    // refusal guards survive as in-plan assertions: when
    // ceil(level*(n+1)) > n split conformal prescribes an INFINITE
    // interval, and clamping would silently drop the finite-sample
    // coverage guarantee — the caller needs n_cal >= level/(1-level).
    val cnt = cal.agg(count(lit(1)).cast("double").as("__ncal"))
    val qrow = graft.ops.Ordinals.withGlobalRank(cal,
        Seq(col("__score").asc), "__r")
      .crossJoin(broadcast(cnt))
      .filter(col("__r").cast("double") ===
        ceil(lit(level) * (col("__ncal") + lit(1.0))))
      .agg(min("__score").as("__qhat")) // always one row (null if no rank hit)
    // the guards live INSIDE __qhat (coalesce evaluates them in order,
    // both return null on success) — as separate columns the optimizer
    // would prune them away unevaluated
    val qv = cnt.crossJoin(qrow)
      .select(coalesce(
        assert_true(col("__ncal") > 0, lit("empty calibration split")),
        assert_true(lit(level) * (col("__ncal") + lit(1.0)) <= col("__ncal"),
          concat(lit(s"calibration split too small for level=$level: need " +
            s"n_cal >= level/(1-level) = ${level / (1.0 - level)}, got "),
            col("__ncal").cast("long").cast("string"),
            lit(" (split conformal would return infinite intervals)"))),
        col("__qhat")).as("__qhat"))
    scored.filter(col(featureCol).isNotNull && (col("__split") === 2))
      .crossJoin(broadcast(qv))
      .select(idCols.map(col) ++ Seq(
        round(col("__pred"), roundTo).as("pred"),
        round(col("__pred") - col("__qhat"), roundTo).as("lo"),
        round(col("__pred") + col("__qhat"), roundTo).as("hi")): _*)
  }
}
