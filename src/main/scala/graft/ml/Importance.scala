package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.{LogisticRegressionModel, RandomForestClassificationModel, GBTClassificationModel}
import org.apache.spark.ml.regression.{LinearRegressionModel, RandomForestRegressionModel, GBTRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ml.Models.{Task, Classification, Regression}

/** Feature importance (SURVEY §2.7 M6, M13-M14): native impurity/coef
  * importances plus PERMUTATION importance — the documented stand-in for
  * SHAP on the JVM (§7.4(8)): shuffle one feature column (seeded
  * window-reorder, distribution preserved exactly), re-score, report the
  * metric drop.
  */
object Importance {

  /** Native importances from the fitted pipeline's last stage:
    * tree featureImportances or |coefficients| (mean over classes). */
  def native(model: PipelineModel, featureNames: Seq[String]): Seq[(String, Double)] = {
    val vals: Seq[Double] = model.stages.last match {
      case m: RandomForestClassificationModel => m.featureImportances.toArray.toSeq
      case m: RandomForestRegressionModel => m.featureImportances.toArray.toSeq
      case m: GBTClassificationModel => m.featureImportances.toArray.toSeq
      case m: GBTRegressionModel => m.featureImportances.toArray.toSeq
      case m: LogisticRegressionModel =>
        if (m.numClasses <= 2) m.coefficients.toArray.map(math.abs).toSeq
        else {
          val cm = m.coefficientMatrix
          (0 until cm.numCols).map(j =>
            (0 until cm.numRows).map(i => math.abs(cm(i, j))).sum / cm.numRows)
        }
      case m: LinearRegressionModel => m.coefficients.toArray.map(math.abs).toSeq
      case other => throw new IllegalArgumentException(s"no importances for ${other.getClass}")
    }
    featureNames.zip(vals)
  }

  /** Dummy-column aggregation (M14): `col_value` one-hot columns grouped
    * back to `col` by prefix before the underscore. */
  def aggregateByBase(imps: Seq[(String, Double)]): Seq[(String, Double)] =
    imps.groupBy { case (n, _) => n.split("_")(0) }
      .map { case (base, xs) => base -> xs.map(_._2).sum }
      .toSeq.sortBy(-_._2)

  /** Shuffle ONE column: reassign its values to rows in seeded-random
    * order (exact permutation — the value multiset is unchanged). The
    * two random ordinals come from `Ordinals.withGlobalRank` (sort +
    * zipWithIndex), NOT a single-partition global window; the rejoin
    * shuffles on the ordinal — everything O(partition) per task. */
  def shuffleColumn(df: DataFrame, c: String, seed: Long): DataFrame = {
    val others = df.columns.filterNot(_ == c)
    val left = graft.ops.Ordinals.withGlobalRank(
      df.select(others.map(col): _*).withColumn("__r", rand(seed)),
      Seq(col("__r")), "__rid").drop("__r")
    val right = graft.ops.Ordinals.withGlobalRank(
      df.select(col(c)).withColumn("__r", rand(seed + 1)),
      Seq(col("__r")), "__rid").drop("__r")
    left.join(right, "__rid").drop("__rid")
  }

  /** EXACT SHAP for linear models (Lundberg & Lee 2017's Linear SHAP:
    * with an independent-features background, phi_i(x) = w_i (x_i -
    * mu_i) with mu_i the background mean) — closes M13's SHAP gap
    * exactly for the linear family: no sampling, no permutation
    * stand-in, and completeness sum_i phi_i(x) = f(x) - f(mu) holds by
    * construction. Background means come from ONE aggregate pass with
    * DECIMAL(19,4)-exact sums — order-exact across partitions, so the
    * attribution is replayable bit-for-bit by any engine (the scale-4
    * quantization of background values perturbs mu by <= 5e-5;
    * attribution itself uses the raw feature values). The per-row
    * attribution is a map-only plan-time-generated projection: phi
    * columns (`phi_<feature>`) appended to `df`. */
  def linearShap(df: DataFrame, features: Seq[String], weights: Seq[Double],
                 background: Option[DataFrame] = None): DataFrame = {
    require(features.length == weights.length,
      s"one weight per feature: ${features.length} vs ${weights.length}")
    val bg = background.getOrElse(df)
    val sums = bg.select(
      features.map(f => sum(col(f).cast("decimal(19,4)")).cast("double")
        .as(s"__s_$f")) :+ count(lit(1)).cast("double").as("__n"): _*).head()
    val n = sums.getDouble(features.length)
    val phis = features.zipWithIndex.map { case (f, i) =>
      (lit(weights(i)) * (col(f) - lit(sums.getDouble(i) / n))).as(s"phi_$f")
    }
    df.select(df.columns.map(col) ++ phis: _*)
  }

  /** Permutation importance: metric drop when each feature is shuffled.
    * `nRepeats` seeds averaged (sklearn permutation_importance semantics). */
  def permutation(model: PipelineModel, test: DataFrame, labelCol: String,
                  features: Seq[String], task: Task, metric: String = "f1",
                  nRepeats: Int = 3, seed: Long = 42L): Seq[(String, Double)] = {
    def score(d: DataFrame): Double = {
      val pred = Models.transformLabeled(model, d, labelCol, task)
      task match {
        case Classification => Metrics.classificationMetrics(pred, "label", "prediction")(metric)
        case Regression => Metrics.regressionMetrics(pred, "label", "prediction")(metric)
      }
    }
    val base = score(test)
    features.map { f =>
      val drops = (0 until nRepeats).map { r =>
        base - score(shuffleColumn(test, f, seed + 1000L * r + f.hashCode))
      }
      f -> drops.sum / nRepeats
    }.sortBy(-_._2)
  }
}
