package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Metric suite (SURVEY §2.7 M3/M4): classification accuracy / weighted
  * precision-recall-F1, rank-statistic ROC-AUC (binary + weighted OvR
  * multiclass), regression R2/MSE/MAE/explained-variance.
  *
  * Everything is computed as DataFrame aggregations:
  * - confusion-matrix metrics reduce to a groupBy over (label, pred) —
  *   cardinality = nClasses^2, tiny at any data scale;
  * - AUC uses the Mann-Whitney U statistic over per-score aggregates, so
  *   the only ordered pass runs on DISTINCT scores, not rows;
  * - regression metrics are single-pass aggregates.
  */
object Metrics {

  /** Long-format (metric, value) helper. */
  private def kv(pairs: (String, Double)*): Seq[(String, Double)] = pairs

  /** Binary/multiclass classification metrics from a predictions frame.
    * Returns Map(metric -> value): accuracy, precision/recall/f1 — binary
    * when nClasses == 2 (positive = `positiveLabel`), else weighted. */
  def classificationMetrics(pred: DataFrame, labelCol: String, predCol: String,
                            positiveLabel: Option[Any] = None): Map[String, Double] = {
    val cm = pred.groupBy(col(labelCol).cast(StringType).as("label"),
        col(predCol).cast(StringType).as("pred"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val labels = (cm.keys.map(_._1) ++ cm.keys.map(_._2)).toSeq.distinct.sorted
    val total = cm.values.sum.toDouble
    val correct = cm.collect { case ((l, p), n) if l == p => n }.sum.toDouble
    def tp(c: String) = cm.getOrElse((c, c), 0L).toDouble
    def predicted(c: String) = cm.collect { case ((_, p), n) if p == c => n }.sum.toDouble
    def actual(c: String) = cm.collect { case ((l, _), n) if l == c => n }.sum.toDouble
    def prec(c: String) = if (predicted(c) == 0) 0.0 else tp(c) / predicted(c)
    def rec(c: String) = if (actual(c) == 0) 0.0 else tp(c) / actual(c)
    def f1(c: String) = { val p = prec(c); val r = rec(c); if (p + r == 0) 0.0 else 2 * p * r / (p + r) }

    positiveLabel.map(_.toString).foreach { pos =>
      require(labels.contains(pos),
        s"positiveLabel '$pos' not among observed labels ${labels.mkString(",")} " +
          "(note labels are stringified: a double column yields '1.0', not '1')")
    }
    val (p, r, f) = positiveLabel.map(_.toString) match {
      case Some(pos) if labels.size <= 2 => (prec(pos), rec(pos), f1(pos))
      case _ =>
        val weighted = labels.map(c => (actual(c) / total, c))
        (weighted.map { case (wi, c) => prec(c) * wi }.sum,
          weighted.map { case (wi, c) => rec(c) * wi }.sum,
          weighted.map { case (wi, c) => f1(c) * wi }.sum)
    }
    Map("accuracy" -> correct / total, "precision" -> p, "recall" -> r, "f1" -> f)
  }

  /** Binary ROC-AUC via Mann-Whitney U with tie correction:
    * AUC = sum over distinct scores of npos_s * (cumNegBelow + nneg_s/2),
    * normalized by npos * nneg. One groupBy(score), then the cumulative
    * negative count comes from `Ordinals.withRunningTotal` (range-sorted
    * two-phase prefix sum) — NOT a global window: continuous scores make
    * the distinct-score frame O(data), and a single-partition window
    * there is the classic rank-AUC scale killer. */
  def binaryAucDf(pred: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val perScore = pred.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("npos"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nneg"))
    val u = graft.ops.Ordinals.withRunningTotal(perScore, Seq(col("s")), "nneg", "__cn")
      .withColumn("cumneg", col("__cn") - col("nneg"))
      .select(sum(col("npos") * (col("cumneg") + col("nneg") / 2.0)).as("u"),
        sum("npos").as("np"), sum("nneg").as("nn"))
    u.select((col("u") / (col("np") * col("nn"))).as("auc"))
  }

  def binaryAuc(pred: DataFrame, scoreCol: String, labelCol: Column): Double =
    binaryAucDf(pred, scoreCol, labelCol).first().getDouble(0)

  /** Weighted one-vs-rest multiclass AUC (sklearn roc_auc_score
    * multi_class='ovr', average='weighted'): per class, binary AUC of its
    * probability column vs label==class, weighted by class support. */
  def weightedOvrAuc(pred: DataFrame, labelCol: String,
                     probOf: String => Column, classes: Seq[Any]): Double = {
    val total = pred.count().toDouble
    val parts = classes.map { c =>
      val support = pred.filter(col(labelCol) === lit(c)).count().toDouble
      val auc = binaryAuc(pred.withColumn("__p", probOf(c.toString)),
        "__p", col(labelCol) === lit(c))
      auc * (support / total)
    }
    parts.sum
  }

  /** Regression metrics: R2, MSE, MAE, explained variance — one aggregate
    * pass (`model_evaluation_logic.py:62-70`). R2 = 1 - SSE/SST with
    * SST = n * var_pop(y); explained variance matches sklearn
    * (1 - var(err)/var(y)). */
  def regressionMetrics(pred: DataFrame, labelCol: String, predCol: String): Map[String, Double] = {
    val agg = pred.agg(
      sum((col(labelCol) - col(predCol)) * (col(labelCol) - col(predCol))).as("sse"),
      avg((col(labelCol) - col(predCol)) * (col(labelCol) - col(predCol))).as("mse"),
      avg(abs(col(labelCol) - col(predCol))).as("mae"),
      var_pop(col(labelCol)).as("vary"),
      var_samp(col(labelCol) - col(predCol)).as("varerr"),
      var_samp(col(labelCol)).as("varys"),
      count(lit(1)).as("n")).first()
    val n = agg.getLong(6).toDouble
    Map(
      "r2" -> (1.0 - agg.getDouble(0) / (agg.getDouble(3) * n)),
      "mse" -> agg.getDouble(1),
      "mae" -> agg.getDouble(2),
      "explained_variance" -> (1.0 - agg.getDouble(4) / agg.getDouble(5)))
  }

  /** Orientation of a metric: true when larger values are better. Loss
    * metrics (mse/mae/rmse) invert the ranking a search loop must apply
    * (sklearn encodes the same fact as `neg_mean_squared_error`). */
  def higherIsBetter(metric: String): Boolean =
    !Set("mse", "mae", "rmse", "loss")(metric.toLowerCase)
}
