package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Imputation._
import Q.QueryFn

/** Driver-checked queries for imputers (I1-I4, I7, I8). Deterministic
  * imputers get exact DuckDB oracles (closed-form OLS = regr_slope/
  * regr_intercept); the EM imputer is seeded-random so its check is
  * aggregate-level (rows-only + spec invariants).
  */
object ImputationQueries {

  /** lineitem with l_quantity nulled at l_linenumber=3 (Q helper) AND
    * l_discount nulled at l_linenumber=5 — a two-column missing pattern
    * for MICE. Mirrored in SQL below. */
  private def liTwoNulls(s: org.apache.spark.sql.SparkSession, dir: String) =
    Q.lineitemWithNulls(s, dir)
      .withColumn("l_discount",
        when(col("l_linenumber") === 5, lit(null)).otherwise(col("l_discount")))

  private val QSql = Q.NullifiedQtySql
  private val DSql = "CASE WHEN l_linenumber = 5 THEN NULL ELSE l_discount END"

  val queries: Map[String, QueryFn] = Map(
    "i1_mean_fill" -> ((s, dir) =>
      FillMean("l_quantity")(Q.lineitemWithNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))),

    "i11_locf_fill" -> ((s, dir) => {
      // forward fill per user in event-time order: every 7th event's
      // value nulled, then carried forward; leading nulls survive
      val e = Tables.events(s, dir).withColumn("value",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      ForwardFill("value", Seq("ts", "event_id"), Seq("user_id"))(e)
        .select(col("event_id"), round(col("value"), 4).as("value"))
    }),

    "i10_group_mean_fill" -> ((s, dir) =>
      // groupwise refinement of i1: nulls take their returnflag group's
      // mean (integer-valued quantities sum exactly, so the per-group
      // means are order-exact doubles)
      FillMeanBy("l_quantity", "l_returnflag")(Q.lineitemWithNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))),

    "i2_median_fill" -> ((s, dir) =>
      FillMedian("l_quantity")(Q.lineitemWithNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))),

    "i3_mode_fill" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir).withColumn("l_returnflag",
        when(col("l_linenumber") === 4, lit(null)).otherwise(col("l_returnflag")))
      FillMode("l_returnflag")(df)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    }),

    "i4_interpolate" -> ((s, dir) =>
      Interpolate("l_quantity",
        orderCols = Seq("l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"),
        partitionBy = Seq("l_orderkey"))(Q.lineitemWithNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))),

    "i7_em_impute" -> ((s, dir) =>
      // Seeded-random fill: the oracle-checkable part is that no nulls
      // remain and non-null cells are untouched; distribution asserted in
      // the ScalaTest spec. Rows-only here.
      EmImpute("l_quantity", seed = 42L, maxIter = 5)(Q.lineitemWithNulls(s, dir))
        .agg(count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_notnull"))),

    "i8_regression_impute" -> ((s, dir) =>
      RegressionImpute("l_quantity", "l_extendedprice")(Q.lineitemWithNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))),

    "i8_mice" -> ((s, dir) =>
      MiceImpute(targets = Seq("l_quantity", "l_discount"),
        predictors = Seq("l_extendedprice"), maxIter = 2)(liTwoNulls(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"),
          round(col("l_discount"), 6).as("l_discount"))))

  val oracles: Map[String, String] = Map(
    // i7: the fill VALUES are seeded-random (spec-checked); the hashed
    // contract is total preservation and zero remaining nulls
    "i7_em_impute" -> """
      SELECT count(*) AS n_rows, count(*) AS n_notnull FROM lineitem""",

    "i1_mean_fill" -> s"""
      SELECT l_orderkey, l_linenumber,
             round(COALESCE($QSql, (SELECT avg($QSql) FROM lineitem)), 4) AS l_quantity
      FROM lineitem""",

    "i11_locf_fill" -> """
      WITH t AS (SELECT event_id, user_id, ts,
                   CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
                 FROM events)
      SELECT event_id,
             round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value
      FROM t""",

    "i10_group_mean_fill" -> s"""
      SELECT l_orderkey, l_linenumber,
             round(COALESCE($QSql,
               avg($QSql) OVER (PARTITION BY l_returnflag),
               (SELECT avg($QSql) FROM lineitem)), 4) AS l_quantity
      FROM lineitem""",

    "i2_median_fill" -> s"""
      SELECT l_orderkey, l_linenumber,
             round(COALESCE($QSql, (SELECT median($QSql) FROM lineitem)), 4) AS l_quantity
      FROM lineitem""",

    "i3_mode_fill" -> """
      WITH t AS (SELECT l_orderkey, l_linenumber,
                        CASE WHEN l_linenumber = 4 THEN NULL ELSE l_returnflag END AS l_returnflag
                 FROM lineitem),
      m AS (SELECT l_returnflag AS v FROM t WHERE l_returnflag IS NOT NULL
            GROUP BY 1 ORDER BY count(*) DESC, l_returnflag ASC LIMIT 1)
      SELECT l_orderkey, l_linenumber, COALESCE(l_returnflag, (SELECT v FROM m)) AS l_returnflag
      FROM t""",

    "i4_interpolate" -> s"""
      WITH t AS (
        SELECT l_orderkey, l_linenumber, $QSql AS q, l_extendedprice, l_partkey, l_suppkey,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey) AS rn
        FROM lineitem),
      w AS (
        SELECT l_orderkey, l_linenumber, q, rn,
          last_value(q IGNORE NULLS) OVER wp AS prev_v,
          first_value(q IGNORE NULLS) OVER wn AS next_v,
          last_value(CASE WHEN q IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS prev_r,
          first_value(CASE WHEN q IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS next_r
        FROM t
        WINDOW
          wp AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wn AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT l_orderkey, l_linenumber,
             round(CASE WHEN q IS NOT NULL THEN q
                        WHEN prev_v IS NULL THEN next_v
                        WHEN next_v IS NULL THEN prev_v
                        ELSE prev_v + (next_v - prev_v) * (rn - prev_r) / (next_r - prev_r)
                   END, 4) AS l_quantity
      FROM w""",

    "i8_regression_impute" -> s"""
      WITH t AS (SELECT l_orderkey, l_linenumber, $QSql AS q, l_extendedprice FROM lineitem),
      fit AS (SELECT regr_slope(q, l_extendedprice) AS m, regr_intercept(q, l_extendedprice) AS b
              FROM t WHERE q IS NOT NULL)
      SELECT l_orderkey, l_linenumber,
             round(COALESCE(q, fit.m * l_extendedprice + fit.b), 4) AS l_quantity
      FROM t, fit""",

    "i8_mice" -> s"""
      WITH t AS (SELECT l_orderkey, l_linenumber, $QSql AS q, $DSql AS d, l_extendedprice FROM lineitem),
      fq AS (SELECT regr_slope(q, l_extendedprice) AS m, regr_intercept(q, l_extendedprice) AS b
             FROM t WHERE q IS NOT NULL),
      fd AS (SELECT regr_slope(d, l_extendedprice) AS m, regr_intercept(d, l_extendedprice) AS b
             FROM t WHERE d IS NOT NULL)
      SELECT l_orderkey, l_linenumber,
             round(COALESCE(q, fq.m * l_extendedprice + fq.b), 4) AS l_quantity,
             round(COALESCE(d, fd.m * l_extendedprice + fd.b), 6) AS l_discount
      FROM t, fq, fd""")
}
