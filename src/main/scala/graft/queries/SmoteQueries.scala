package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{NnImpute, Smote}
import Q.QueryFn

/** Driver-checked queries for the SMOTE family and neighbor imputers.
  * Synthesis values are hash-stream random (not SQL-reproducible), but the
  * RESAMPLED SIZES are exact by construction — count-level oracles; the
  * exact-kNN imputers (width=0) get full value-level oracles.
  */
object SmoteQueries {

  /** orders restricted to numeric features + class (what the reference
    * feeds imblearn). */
  private def ordersNumeric(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  /** Occupancy-scaled grid width — a constant would make the candidate
    * join super-linear as the SF grows (Neighbors.autoWidth scaladoc);
    * counts-based oracles are width-invariant, so this is oracle-safe. */
  private def ow(s: org.apache.spark.sql.SparkSession, dir: String): Double =
    graft.ops.Neighbors.autoWidth(Tables.orders(s, dir).count())

  /** customer with c_acctbal nulled where c_custkey % 10 = 0 (planted
    * missing pattern; mirrored in the oracles). */
  private def customerWithNulls(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.customer(s, dir).withColumn("c_acctbal",
      when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_acctbal")))

  val queries: Map[String, QueryFn] = Map(
    "b2_smote" -> ((s, dir) =>
      Smote.SmoteOp("o_orderstatus", k = 5, width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b4_cluster_centroids" -> ((s, dir) => {
      // skewed two-class frame: ~5% minority; centroids replace majority
      val df = Tables.customer(s, dir).select(
        col("c_custkey").cast("double").as("c_custkey"),
        col("c_acctbal"),
        (col("c_custkey") % 20 === 0).cast("string").as("is_vip"))
      graft.ops.Balancing.ClusterCentroids("is_vip",
        Seq("c_custkey", "c_acctbal"))(df)
        .groupBy("is_vip").agg(count(lit(1)).as("n"))
    }),

    "b21_hash_sample" -> ((s, dir) =>
      // deterministic per-status 100-row sample (r10): bottom-k by
      // seeded row hash through the bounded-state topk_pairs aggregate
      // — O(k) state per group, no data shuffle, partitioning-proof
      graft.ops.Balancing.hashSample(Tables.orders(s, dir),
        "o_orderstatus", "o_orderkey", k = 100)),

    "b22_weighted_sample" -> ((s, dir) =>
      // systematic PPS sample (r10): 50 picks proportional to document
      // length — integer tick arithmetic over one hash-ordered
      // RunningTotal, no transcendentals, Σ n_picks = 50 exactly
      graft.ops.Balancing.weightedSystematicSample(
        Tables.documents(s, dir), "doc_id", "n_chars", k = 50)),

    "b5_nearmiss" -> ((s, dir) =>
      Smote.NearMissOp("o_orderstatus", width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b7_adasyn" -> ((s, dir) =>
      Smote.AdasynOp("o_orderstatus", k = 5, width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b8_borderline_smote" -> ((s, dir) =>
      Smote.BorderlineSmoteOp("o_orderstatus", k = 5, width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b9_smote_tomek" -> ((s, dir) => {
      // SMOTE-to-parity then Tomek-link cleaning: exact counts depend on
      // the kNN cleaning pass, so the hashed contract (full oracle, r5)
      // is what the construction GUARANTEES: every class survives, and
      // no class exceeds the majority size (SMOTE targets parity,
      // cleaning only removes). SmoteSpec pins the cleaning semantics.
      val maj = ordersNumeric(s, dir).groupBy("o_orderstatus").count()
        .agg(max("count")).head().getLong(0)
      Smote.SmoteTomekOp("o_orderstatus", k = 5, width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"), (col("n") > 0).as("nonempty"),
          (col("n") <= maj).as("le_majority"))
    }),

    "b10_smote_enn" -> ((s, dir) => {
      // same invariant contract as b9 for the ENN cleaning variant
      val maj = ordersNumeric(s, dir).groupBy("o_orderstatus").count()
        .agg(max("count")).head().getLong(0)
      Smote.SmoteEnnOp("o_orderstatus", k = 5, width = ow(s, dir))(ordersNumeric(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"), (col("n") > 0).as("nonempty"),
          (col("n") <= maj).as("le_majority"))
    }),

    "b11_bagging_passthrough" -> ((s, dir) =>
      Smote.BaggingPassthroughOp("o_orderstatus")(ordersNumeric(s, dir))),

    "i5_knn_impute" -> ((s, dir) =>
      NnImpute.KnnImpute("c_acctbal", features = Seq("c_custkey", "c_nationkey"),
        k = 5, width = 0.0, idCol = Some("c_custkey"))(customerWithNulls(s, dir))
        .select(col("c_custkey"), round(col("c_acctbal"), 4).as("c_acctbal"))),

    "i6_hotdeck_impute" -> ((s, dir) =>
      NnImpute.HotDeckImpute("c_acctbal", numFeatures = Seq("c_custkey", "c_nationkey"),
        catFeatures = Seq("c_mktsegment"), width = 0.0, idCol = Some("c_custkey"))(
        customerWithNulls(s, dir))
        .select(col("c_custkey"), round(col("c_acctbal"), 4).as("c_acctbal"))),

    "i9_model_impute" -> ((s, dir) =>
      // MLlib 'linear' at regParam=0 is exact two-predictor OLS
      // (affine-invariant through the pipeline scaler), so the imputed
      // SUM is a full oracle via the 2x2 normal equations in SQL.
      NnImpute.ModelImpute("c_acctbal")(
        customerWithNulls(s, dir).select("c_custkey", "c_nationkey", "c_acctbal"))
        .agg(count(lit(1)).as("n_rows"), count(col("c_acctbal")).as("n_notnull"),
          round(sum(when(col("c_custkey") % 10 =!= 0, col("c_acctbal"))), 2).as("sum_untouched"),
          round(sum(when(col("c_custkey") % 10 === 0, col("c_acctbal"))), 1).as("sum_imputed"))))

  /** Shared SQL fragments for the exact-kNN oracles. */
  private val NullBalSql = "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END"
  private def scaledCte = s"""
    t AS (SELECT c_custkey, c_nationkey, c_mktsegment, $NullBalSql AS tgt FROM customer),
    p AS (SELECT avg(c_custkey) AS m1, stddev_pop(c_custkey) AS s1,
                 avg(c_nationkey) AS m2, stddev_pop(c_nationkey) AS s2 FROM t),
    sc AS (SELECT c_custkey, c_nationkey, c_mktsegment, tgt,
                  (c_custkey - p.m1) / p.s1 AS f1, (c_nationkey - p.m2) / p.s2 AS f2
           FROM t, p),
    pr AS (SELECT * FROM sc WHERE tgt IS NULL),
    dn AS (SELECT * FROM sc WHERE tgt IS NOT NULL)"""

  val oracles: Map[String, String] = Map(
    "b9_smote_tomek" -> """
      SELECT * FROM (VALUES ('F', true, true), ('O', true, true), ('P', true, true))
        AS t(o_orderstatus, nonempty, le_majority)""",

    "b10_smote_enn" -> """
      SELECT * FROM (VALUES ('F', true, true), ('O', true, true), ('P', true, true))
        AS t(o_orderstatus, nonempty, le_majority)""",

    "b2_smote" -> """
      WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
      SELECT o_orderstatus, (SELECT max(n) FROM c) AS n FROM c""",

    "b4_cluster_centroids" -> """
      WITH c AS (SELECT CAST(c_custkey % 20 = 0 AS VARCHAR) AS is_vip, count(*) AS n
                 FROM customer GROUP BY 1)
      SELECT is_vip, (SELECT min(n) FROM c) AS n FROM c""",

    "b5_nearmiss" -> """
      WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
      SELECT o_orderstatus, (SELECT min(n) FROM c) AS n FROM c""",

    // b18: the 52-bit md5("id_42") prefix replayed; bottom-100 per
    // status as a (hash, id)-ordered row_number — the aggregate's
    // lexicographic buffer order makes the two forms identical
    "b21_hash_sample" -> """
      WITH base AS (
        SELECT o_orderstatus AS g, o_orderkey AS id,
               CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
                                           || '_42'), 1, 13)) AS BIGINT) AS h
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderkey IS NOT NULL),
      rk AS (SELECT g, id,
                    row_number() OVER (PARTITION BY g ORDER BY h, id) AS r
             FROM base)
      SELECT g AS o_orderstatus, CAST(r AS BIGINT) AS sample_rank,
             id AS o_orderkey
      FROM rk WHERE r <= 100""",

    // b19: same md5 order, cumulative weights as a window sum, picks
    // as the integer floor-division tick count — all 64-bit exact
    "b22_weighted_sample" -> """
      WITH base AS (
        SELECT doc_id AS id,
               CAST(round(CAST(n_chars AS DOUBLE) * 1000.0, 0) AS BIGINT)
                 AS w,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                           || '_42'), 1, 13)) AS BIGINT) AS h
        FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
      bp AS (SELECT id, w, h FROM base WHERE w > 0),
      c AS (SELECT id, w, sum(w) OVER (ORDER BY h, id) AS cum FROM bp),
      t AS (SELECT max(cum) AS tw FROM c)
      SELECT c.id AS doc_id, CAST(c.w AS BIGINT) AS weight_milli,
             CAST(((c.cum * 50) // t.tw)
                  - (((c.cum - c.w) * 50) // t.tw) AS BIGINT) AS n_picks
      FROM c CROSS JOIN t
      WHERE ((c.cum * 50) // t.tw)
            - (((c.cum - c.w) * 50) // t.tw) > 0""",

    // largest-remainder quota makes ADASYN's fill exact: every class
    // reaches majority size, same count contract as SMOTE
    "b7_adasyn" -> """
      WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
      SELECT o_orderstatus, (SELECT max(n) FROM c) AS n FROM c""",

    "b8_borderline_smote" -> """
      WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
      SELECT o_orderstatus, (SELECT max(n) FROM c) AS n FROM c""",

    "b11_bagging_passthrough" -> """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders""",

    "i5_knn_impute" -> s"""
      WITH $scaledCte,
      nn AS (SELECT pr.c_custkey AS pid, dn.tgt AS dtv,
               row_number() OVER (PARTITION BY pr.c_custkey
                 ORDER BY sqrt((pr.f1 - dn.f1) * (pr.f1 - dn.f1)
                             + (pr.f2 - dn.f2) * (pr.f2 - dn.f2)), dn.c_custkey) AS rn
             FROM pr, dn),
      f AS (SELECT pid, avg(dtv) AS fill FROM nn WHERE rn <= 5 GROUP BY pid)
      SELECT t.c_custkey, round(COALESCE(t.tgt, f.fill), 4) AS c_acctbal
      FROM t LEFT JOIN f ON f.pid = t.c_custkey""",

    "i9_model_impute" -> s"""
      WITH t AS (SELECT c_custkey AS x1, c_nationkey AS x2, $NullBalSql AS tgt FROM customer),
      c AS (SELECT * FROM t WHERE tgt IS NOT NULL),
      m AS (SELECT var_pop(x1) AS s11, var_pop(x2) AS s22,
                   covar_pop(x1, x2) AS s12,
                   covar_pop(x1, tgt) AS s1y, covar_pop(x2, tgt) AS s2y,
                   avg(x1) AS m1, avg(x2) AS m2, avg(tgt) AS my FROM c),
      b AS (SELECT (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
                   (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2,
                   m1, m2, my FROM m),
      f AS (SELECT my - b1 * m1 - b2 * m2 AS b0, b1, b2 FROM b),
      filled AS (SELECT COALESCE(tgt, f.b0 + f.b1 * x1 + f.b2 * x2) AS v,
                        tgt IS NULL AS was_null, x1 FROM t, f)
      SELECT count(*) AS n_rows, count(v) AS n_notnull,
             round(sum(CASE WHEN NOT was_null THEN v END), 2) AS sum_untouched,
             round(sum(CASE WHEN was_null THEN v END), 1) AS sum_imputed
      FROM filled""",

    "i6_hotdeck_impute" -> s"""
      WITH $scaledCte,
      cand AS (SELECT pr.c_custkey AS pid, dn.tgt AS dtv,
                 sqrt((pr.f1 - dn.f1) * (pr.f1 - dn.f1)
                    + (pr.f2 - dn.f2) * (pr.f2 - dn.f2)) AS dist,
                 CASE WHEN pr.c_mktsegment = dn.c_mktsegment THEN 0.0 ELSE 1.0 END AS ham,
                 dn.c_custkey AS did,
                 row_number() OVER (PARTITION BY pr.c_custkey
                   ORDER BY sqrt((pr.f1 - dn.f1) * (pr.f1 - dn.f1)
                               + (pr.f2 - dn.f2) * (pr.f2 - dn.f2)), dn.c_custkey) AS rn
               FROM pr, dn),
      best AS (SELECT pid, dtv,
                 row_number() OVER (PARTITION BY pid ORDER BY dist + ham, did) AS r
               FROM cand WHERE rn <= 20)
      SELECT t.c_custkey, round(COALESCE(t.tgt, b.dtv), 4) AS c_acctbal
      FROM t LEFT JOIN (SELECT pid, dtv FROM best WHERE r = 1) b ON b.pid = t.c_custkey""")
}
