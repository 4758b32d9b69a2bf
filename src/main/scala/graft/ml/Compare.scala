package graft.ml

import org.apache.spark.sql.DataFrame

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
