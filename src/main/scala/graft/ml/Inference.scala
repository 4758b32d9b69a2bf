package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.Models.Task

/** Final training + persistence + questionnaire inference
  * (SURVEY §2.7 M12, M16; reference `load_params_and_train_final_model.py`,
  * `inference_models/inference_trained_models.py`).
  */
object Inference {

  /** M12 — final train: fit with chosen params, score on test, persist
    * with the reference's `model_dataset_metric_value` naming scheme. */
  case class FinalResult(modelPath: String, metrics: Map[String, Double])

  def finalTrain(train: DataFrame, test: DataFrame, labelCol: String,
                 model: String, task: Task, params: Models.Params,
                 primaryMetric: String, outDir: String, datasetName: String,
                 seed: Long = 42L): FinalResult = {
    val fitted = Models.fit(train, labelCol, model, task, params, seed)
    val pred = Models.transformLabeled(fitted, test, labelCol, task, train = Some(train))
    val metrics = task match {
      case Models.Classification =>
        val base = Metrics.classificationMetrics(pred, "label", "prediction")
        // M3 parity: ROC-AUC from the probability column — binary AUC of
        // P(class 1), or weighted OvR for multiclass
        val withAuc =
          if (!pred.columns.contains("probability")) base
          else {
            import org.apache.spark.sql.functions.{col => fcol}
            import org.apache.spark.ml.functions.vector_to_array
            val probAt = (i: Int) => vector_to_array(fcol("probability"))(i)
            val classes = pred.select("label").distinct()
              .collect().map(_.getDouble(0)).sorted.toSeq
            val auc =
              if (classes.size == 2)
                Metrics.binaryAuc(pred.withColumn("__p1", probAt(1)), "__p1",
                  fcol("label") === 1.0)
              else Metrics.weightedOvrAuc(pred, "label",
                c => probAt(c.toDouble.toInt), classes)
            base + ("roc_auc" -> auc)
          }
        withAuc
      case Models.Regression => Metrics.regressionMetrics(pred, "label", "prediction")
    }
    val v = metrics(primaryMetric)
    val path = f"$outDir/${model}_${datasetName}_${primaryMetric}_$v%.4f"
    fitted.write.overwrite().save(path)
    FinalResult(path, metrics)
  }

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** M16 — questionnaire template: per feature, enumerated choices when
    * <=`enumMax` distinct values else free numeric — one pass of
    * approx+exact distincts (`inference_trained_models.py:147-183`). */
  def questionTemplate(df: DataFrame, features: Seq[String], enumMax: Int = 10): Map[String, Seq[String]] =
    features.map { f =>
      val distinct = df.select(col(f).cast(StringType)).filter(col(f).isNotNull)
        .distinct().limit(enumMax + 1).collect().map(_.getString(0)).toSeq
      f -> (if (distinct.size <= enumMax) distinct.sorted else Nil)
    }.toMap

  /** M16 — single-row inference with feature-set/order validation against
    * the saved pipeline's expected input columns
    * (`inference_trained_models.py:355-435`). */
  def inferOne(spark: SparkSession, model: PipelineModel,
               answers: Map[String, Double], features: Seq[String]): Double = {
    val missing = features.filterNot(answers.contains)
    require(missing.isEmpty, s"missing answers for: ${missing.mkString(",")}")
    val row = Row.fromSeq(features.map(answers))
    val schema = StructType(features.map(f => StructField(f, DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
    model.transform(df).select("prediction").first().getDouble(0)
  }
}
