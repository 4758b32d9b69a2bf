package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ml.Models.{Task, Classification, Regression}

/** Cross-validation, random hyperparameter search, learning curves
  * (SURVEY §2.7 M7-M11).
  *
  * Folds are EXPLICIT columns (deterministic given order columns, or
  * seeded-random): fold i of k = row_number within class partition mod k —
  * stratified by construction, one narrow shuffle to assign, then each
  * fold's train/eval runs executor-parallel. This is the per-fold-scores
  * API MLlib's CrossValidator hides (`cross_validation_optuna_logic.py:89-114`).
  */
object Validation {

  /** Stratified fold assignment: row_number over (class, order) mod k.
    * With orderCols empty the order is seeded-random. */
  def withFold(df: DataFrame, labelCol: String, k: Int,
               orderCols: Seq[String] = Nil, seed: Long = 42L): DataFrame = {
    val ord = if (orderCols.nonEmpty) struct(orderCols.map(col): _*) else rand(seed)
    val w = Window.partitionBy(col(labelCol)).orderBy(ord)
    df.withColumn("fold", pmod(row_number().over(w), lit(k)))
  }

  /** Per-fold CV scores for a model spec. Returns (foldIndex, metric). */
  def crossValidate(df: DataFrame, labelCol: String, model: String, task: Task,
                    k: Int = 3, params: Models.Params = Map.empty,
                    metric: String = "f1", seed: Long = 42L,
                    orderCols: Seq[String] = Nil): Seq[(Int, Double)] = {
    val folded = withFold(df, labelCol, k, orderCols, seed).persist()
    val scores = (0 until k).map { i =>
      val train = folded.filter(col("fold") =!= i).drop("fold")
      val test = folded.filter(col("fold") === i).drop("fold")
      val m = Models.fit(train, labelCol, model, task, params, seed)
      val pred = Models.transformLabeled(m, test, labelCol, task, train = Some(train))
      val score = task match {
        case Classification =>
          Metrics.classificationMetrics(pred, "label", "prediction")(metric)
        case Regression =>
          Metrics.regressionMetrics(pred, "label", "prediction")(metric)
      }
      i -> score
    }
    folded.unpersist()
    scores
  }

  /** Per-fold CV with the FULL metric map per fold (multi-scoring). */
  def crossValidateAll(df: DataFrame, labelCol: String, model: String, task: Task,
                       k: Int = 3, params: Models.Params = Map.empty,
                       seed: Long = 42L,
                       orderCols: Seq[String] = Nil): Seq[(Int, Map[String, Double])] = {
    val folded = withFold(df, labelCol, k, orderCols, seed).persist()
    val scores = (0 until k).map { i =>
      val train = folded.filter(col("fold") =!= i).drop("fold")
      val test = folded.filter(col("fold") === i).drop("fold")
      val m = Models.fit(train, labelCol, model, task, params, seed)
      val pred = Models.transformLabeled(m, test, labelCol, task, train = Some(train))
      val all = task match {
        case Classification => Metrics.classificationMetrics(pred, "label", "prediction")
        case Regression => Metrics.regressionMetrics(pred, "label", "prediction")
      }
      i -> all
    }
    folded.unpersist()
    scores
  }

  /** Random hyperparameter search (M8/M9): n seeded uniform draws from a
    * param space, each trial CV-scored on EVERY metric (the reference's
    * multi-scoring dict), ranked by the `refit` metric — sklearn
    * RandomizedSearchCV(scoring={...}, refit=metric) semantics.
    * Param space: name -> list of candidate values (None-style sentinels
    * allowed as values). */
  case class Trial(params: Models.Params, mean: Double, std: Double,
                   metrics: Map[String, Double] = Map.empty)

  def randomSearch(df: DataFrame, labelCol: String, model: String, task: Task,
                   space: Map[String, Seq[Any]], nTrials: Int, k: Int = 3,
                   metric: String = "f1", seed: Long = 42L,
                   orderCols: Seq[String] = Nil): Seq[Trial] = {
    val rng = new scala.util.Random(seed)
    val higherIsBetter = true
    val trials = (1 to nTrials).map { _ =>
      val draw: Models.Params = space.map { case (k2, vs) => k2 -> vs(rng.nextInt(vs.size)) }
      val perFold = crossValidateAll(df, labelCol, model, task, k, draw, seed, orderCols)
      val metricNames = perFold.head._2.keySet
      val means = metricNames.map(mn =>
        mn -> perFold.map(_._2(mn)).sum / perFold.size).toMap
      val scores = perFold.map(_._2(metric))
      val mean = means(metric)
      val std = math.sqrt(scores.map(s => (s - mean) * (s - mean)).sum / scores.size)
      Trial(draw, mean, std, means)
    }
    trials.sortBy(t => if (higherIsBetter) -t.mean else t.mean)
  }

  /** Learning curve (M11): for each train fraction, fit on a seeded sample
    * and score train + validation — overfit gap per point
    * (`learning_curve_worker.py:35-104`). */
  case class CurvePoint(fraction: Double, trainScore: Double, valScore: Double)

  def learningCurve(train: DataFrame, test: DataFrame, labelCol: String,
                    model: String, task: Task, fractions: Seq[Double],
                    params: Models.Params = Map.empty, metric: String = "f1",
                    seed: Long = 42L): Seq[CurvePoint] = {
    fractions.map { f =>
      val sub = if (f >= 1.0) train else train.sample(withReplacement = false, f, seed)
      val m = Models.fit(sub, labelCol, model, task, params, seed)
      def score(d: DataFrame): Double = {
        val pred = Models.transformLabeled(m, d, labelCol, task, train = Some(sub))
        task match {
          case Classification => Metrics.classificationMetrics(pred, "label", "prediction")(metric)
          case Regression => Metrics.regressionMetrics(pred, "label", "prediction")(metric)
        }
      }
      CurvePoint(f, score(sub), score(test))
    }
  }
}
