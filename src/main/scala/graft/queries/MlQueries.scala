package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.{Metrics, Validation}
import Q.QueryFn

/** Driver-checked queries for the ML layer. MLlib model fits aren't
  * SQL-reproducible, but every METRIC and FOLD computation is — so the
  * evaluators (the part that must agree with sklearn semantics) are
  * oracle-checked on deterministic rule-based predictions, and the model
  * paths are covered by MlSpec.
  */
object MlQueries {

  /** HALF_UP rounding to match SQL round() exactly. */
  private def r(x: Double, digits: Int): Double =
    BigDecimal(x).setScale(digits, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def oneRow(s: org.apache.spark.sql.SparkSession, m: Map[String, Double],
                     keys: Seq[String]) = {
    import s.implicits._
    Seq(keys.map(k => r(m(k), 6))).map {
      case Seq(a, b, c, d) => (a, b, c, d)
    }.toDF(keys: _*)
  }

  val queries: Map[String, QueryFn] = Map(
    "m1_binary_metrics" -> ((s, dir) => {
      // Deterministic rule classifier: pred = totalprice > 150k,
      // label = priority is urgent. Checks the evaluator arithmetic.
      val pred = Tables.orders(s, dir).select(
        (col("o_orderpriority") === "1-URGENT").cast("int").as("label"),
        (col("o_totalprice") > 150000).cast("int").as("prediction"))
      val m = Metrics.classificationMetrics(pred, "label", "prediction",
        positiveLabel = Some(1))
      oneRow(s, m, Seq("accuracy", "precision", "recall", "f1"))
    }),

    "m2_weighted_metrics" -> ((s, dir) => {
      // Multiclass: label = o_orderstatus, pred from totalprice bands.
      val pred = Tables.orders(s, dir).select(
        col("o_orderstatus").as("label"),
        when(col("o_totalprice") < 100000, "F")
          .when(col("o_totalprice") < 250000, "O")
          .otherwise("P").as("prediction"))
      val m = Metrics.classificationMetrics(pred, "label", "prediction")
      oneRow(s, m, Seq("accuracy", "precision", "recall", "f1"))
    }),

    "m3_rank_auc" -> ((s, dir) =>
      Metrics.binaryAucDf(
        Tables.orders(s, dir).select(col("o_totalprice").as("score"),
          (col("o_orderpriority") === "1-URGENT").as("y")),
        "score", col("y"))
        .select(round(col("auc"), 6).as("auc"))),

    "m4_regression_metrics" -> ((s, dir) => {
      val pred = Tables.orders(s, dir).select(
        col("o_totalprice").as("label"),
        (col("o_custkey") * 2.0 + 100000.0).as("prediction"))
      val m = Metrics.regressionMetrics(pred, "label", "prediction")
      import s.implicits._
      Seq((r(m("r2"), 6), r(m("mse") / 1e6, 0) * 1e6,
        r(m("mae"), 3), r(m("explained_variance"), 6)))
        .toDF("r2", "mse", "mae", "explained_variance")
    }),

    "m5_fold_assign" -> ((s, dir) =>
      Validation.withFold(Tables.orders(s, dir), "o_orderpriority", 3,
        orderCols = Seq("o_orderkey"))
        .groupBy("fold", "o_orderpriority").agg(count(lit(1)).as("n"))))

  val oracles: Map[String, String] = Map(
    "m1_binary_metrics" -> """
      WITH p AS (SELECT CAST(o_orderpriority = '1-URGENT' AS INT) AS label,
                        CAST(o_totalprice > 150000 AS INT) AS pred
                 FROM orders),
      c AS (SELECT
              CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS acc,
              CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
              CAST(sum(CASE WHEN pred = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS pp,
              CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS ap
            FROM p)
      SELECT round(acc, 6) AS accuracy,
             round(tp / pp, 6) AS precision,
             round(tp / ap, 6) AS recall,
             round(2 * (tp/pp) * (tp/ap) / ((tp/pp) + (tp/ap)), 6) AS f1
      FROM c""",

    "m2_weighted_metrics" -> """
      WITH p AS (SELECT o_orderstatus AS label,
                        CASE WHEN o_totalprice < 100000 THEN 'F'
                             WHEN o_totalprice < 250000 THEN 'O'
                             ELSE 'P' END AS pred
                 FROM orders),
      cls AS (SELECT label AS c FROM p GROUP BY 1),
      stat AS (SELECT c,
                 (SELECT count(*) FROM p WHERE label = c AND pred = c) AS tp,
                 (SELECT count(*) FROM p WHERE pred = c) AS pp,
                 (SELECT count(*) FROM p WHERE label = c) AS ap,
                 (SELECT count(*) FROM p) AS total
               FROM cls),
      pr AS (SELECT c,
               CASE WHEN pp = 0 THEN 0 ELSE CAST(tp AS DOUBLE)/pp END AS prec,
               CASE WHEN ap = 0 THEN 0 ELSE CAST(tp AS DOUBLE)/ap END AS rec,
               CAST(ap AS DOUBLE)/total AS w
             FROM stat)
      SELECT round((SELECT CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS DOUBLE)/count(*) FROM p), 6) AS accuracy,
             round(sum(prec * w), 6) AS precision,
             round(sum(rec * w), 6) AS recall,
             round(sum(CASE WHEN prec + rec = 0 THEN 0
                            ELSE 2 * prec * rec / (prec + rec) END * w), 6) AS f1
      FROM pr""",

    "m3_rank_auc" -> """
      WITH s AS (SELECT o_totalprice AS score,
                        CAST(o_orderpriority = '1-URGENT' AS INT) AS y
                 FROM orders),
      g AS (SELECT score, sum(y) AS npos, sum(1 - y) AS nneg FROM s GROUP BY 1),
      w AS (SELECT npos, nneg,
                   sum(nneg) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nneg AS cumneg
            FROM g)
      SELECT round(sum(npos * (cumneg + nneg / 2.0))
                   / ((SELECT sum(npos) FROM g) * (SELECT sum(nneg) FROM g)), 6) AS auc
      FROM w""",

    "m4_regression_metrics" -> """
      WITH p AS (SELECT o_totalprice AS y, o_custkey * 2.0 + 100000.0 AS yh FROM orders),
      a AS (SELECT sum((y - yh) * (y - yh)) AS sse,
                   avg((y - yh) * (y - yh)) AS mse,
                   avg(abs(y - yh)) AS mae,
                   var_pop(y) AS varpop,
                   var_samp(y - yh) AS varerr,
                   var_samp(y) AS varys,
                   count(*) AS n
            FROM p)
      SELECT round(1.0 - sse / (varpop * n), 6) AS r2,
             round(mse / 1000000.0) * 1000000.0 AS mse,
             round(mae, 3) AS mae,
             round(1.0 - varerr / varys, 6) AS explained_variance
      FROM a""",

    "m5_fold_assign" -> """
      WITH f AS (
        SELECT CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) % 3 AS INT) AS fold,
               o_orderpriority
        FROM orders)
      SELECT fold, o_orderpriority, count(*) AS n
      FROM f GROUP BY 1, 2""")
}
