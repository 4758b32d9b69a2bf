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

  /** Precision-recall curve over equal-width score buckets: one row per
    * OCCUPIED bucket (bin, threshold = the bucket's lower edge, n_ge,
    * tp, precision, recall, f1) where the classifier at `threshold`
    * predicts positive for every row scoring in bucket >= bin — the
    * operating-point table m3's single rank-AUC number summarizes away.
    * Scores are probabilities in [0, 1] (the m28 binning rule; the top
    * edge clamps into the last bin). f1 is null at tp = 0 (undefined),
    * reported honestly rather than zero-filled.
    *
    * Scale shape: ONE map-side-combined bucket aggregate, then the
    * descending cumulative counts ride RunningTotal over the
    * bins-sized frame — nothing after the first aggregate touches data.
    * Exactness: all counts exact longs; every ratio a fixed double
    * tree rounded to 6. */
  def prCurve(pred: DataFrame, scoreCol: String, pos: Column,
              bins: Int = 20): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val p = col(scoreCol).cast(DoubleType)
    val per = pred.filter(p.isNotNull)
      .withColumn("bin",
        // r10 (r9 ADVICE): clamp BOTH edges — scores < 0 land in bin 1
        // symmetric to the top-edge least(), instead of emitting
        // negative-threshold rows that corrupt the descending cumsum
        greatest(least(floor(p * lit(bins)) + lit(1), lit(bins.toLong)),
          lit(1L)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), count(when(pos, 1)).as("n_pos"))
    val cum = graft.ops.Ordinals.withRunningTotals(per,
      Seq(col("bin").desc), Seq("n" -> "__cn", "n_pos" -> "__cp"))
    val tot = per.agg(sum("n_pos").as("__tp"))
    val prec = col("__cp").cast("double") / col("__cn").cast("double")
    val rec = col("__cp").cast("double") / col("__tp").cast("double")
    cum.crossJoin(broadcast(tot))
      .select(col("bin"),
        round((col("bin").cast("double") - lit(1.0)) / lit(bins), 6)
          .as("threshold"),
        col("__cn").cast("long").as("n_ge"),
        col("__cp").cast("long").as("tp"),
        round(prec, 6).as("precision"),
        round(rec, 6).as("recall"),
        when(col("__cp") === 0, lit(null).cast("double"))
          .otherwise(round((lit(2.0) * (prec * rec)) / (prec + rec), 6))
          .as("f1"))
  }


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

  /** Decile lift / cumulative-gains table: rank by `scoreCol`
    * descending (tie-broken by `tieCols` into a total order), cut into
    * `buckets` equi-depth buckets, and report per bucket
    * (bucket, n_rows, n_pos, cum_pos, lift, cum_gain, cum_lift) — the
    * campaign-targeting readout ("the top decile captures X% of all
    * positives at Y× the base rate") that complements [[binaryAucDf]]'s
    * single number with a per-depth curve.
    *
    * Scale shape: the global rank rides [[graft.ops.Ordinals
    * .withGlobalRank]]'s range-sorted prefix sum (never a keyless
    * window); the bucket cut is the e8 integer-division rule
    * ((rank-1)·buckets/n + 1), so bucket depths differ by at most one
    * row; everything after the per-bucket aggregate is buckets-sized,
    * including the cumulative sums. Exactness: every reported ratio is
    * a fixed double tree over exact longs, rounded to 6 —
    * order-independent and cross-engine replayable. */
  def liftGains(pred: DataFrame, scoreCol: String, pos: Column,
                tieCols: Seq[String], buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val nn = pred.filter(col(scoreCol).isNotNull)
    val n = nn.count()
    require(n >= buckets.toLong, s"$n rows; need >= $buckets")
    val sort = col(scoreCol).desc +: tieCols.map(col(_).asc)
    val per = graft.ops.Ordinals.withGlobalRank(nn, sort, "__lg_r")
      .withColumn("bucket",
        (floor(((col("__lg_r") - lit(1)) * lit(buckets)) / lit(n)) + lit(1))
          .cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        count(when(pos, 1)).as("n_pos"))
    val cum = graft.ops.Ordinals.withRunningTotals(per,
      Seq(col("bucket").asc),
      Seq("n_pos" -> "cum_pos", "n_rows" -> "cum_rows"))
    val tot = per.agg(sum("n_rows").as("__t"), sum("n_pos").as("__p"))
    val base = col("__p").cast("double") / col("__t").cast("double")
    val rate = col("n_pos").cast("double") / col("n_rows").cast("double")
    cum.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        col("cum_pos").cast("long").as("cum_pos"),
        round(rate / base, 6).as("lift"),
        round(col("cum_pos").cast("double") / col("__p").cast("double"), 6)
          .as("cum_gain"),
        round((col("cum_pos").cast("double") / col("cum_rows").cast("double"))
          / base, 6).as("cum_lift"))
  }

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
