package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Balancing._
import Q.QueryFn

/** Driver-checked queries for sampling/balancing/trim (B1, B3, B6,
  * B12-B14). Deterministic trims get exact row-level oracles; seeded-random
  * paths get count-level oracles where the op guarantees exact sizes
  * (undersample) and rows-only otherwise.
  */
object BalancingQueries {

  val queries: Map[String, QueryFn] = Map(
    "b1_random_split" -> ((s, dir) => {
      // Random partition: oracle-checkable invariant is the total per class
      // (train + test = all rows, no dupes/losses).
      val (train, test) = randomSplit(Tables.orders(s, dir), 0.2, seed = 42L)
      train.select(col("o_orderpriority"), lit("train").as("bucket"))
        .unionByName(test.select(col("o_orderpriority"), lit("test").as("bucket")))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    }),

    "b1_stratified_split" -> ((s, dir) => {
      // exact stratification: per-class test count = floor(n_c * 0.2)
      val (train, test) = stratifiedSplit(Tables.orders(s, dir), "o_orderpriority",
        0.2, seed = 42L)
      train.select(col("o_orderpriority"), lit("train").as("bucket"))
        .unionByName(test.select(col("o_orderpriority"), lit("test").as("bucket")))
        .groupBy("o_orderpriority", "bucket").agg(count(lit(1)).as("n"))
    }),

    "b3_undersample" -> ((s, dir) =>
      // Exact-size undersample: every class lands on the minority count.
      Undersample("o_orderstatus")(Tables.orders(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b6_oversample" -> ((s, dir) =>
      // Exact-size oversample: every class lands on the majority count.
      Oversample("o_orderstatus")(Tables.orders(s, dir))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    "b19_class_weights" -> ((s, dir) =>
      // the weighting alternative to resampling: n/(k*n_c) per class,
      // fed to MLlib's weightCol — no rows moved
      graft.ops.Balancing.classWeights(Tables.orders(s, dir), "o_orderstatus")
        .select(col("o_orderstatus"), col("n_rows"),
          round(col("weight"), 6).as("weight"))),

    "b12_trim_equal" -> ((s, dir) =>
      TrimEqual("o_orderpriority", 100, orderCols = Seq("o_orderkey"))(
        Tables.orders(s, dir))
        .select("o_orderkey", "o_orderpriority")),

    "b13_trim_proportional" -> ((s, dir) =>
      TrimProportional("o_orderpriority", 3000, orderCols = Seq("o_orderkey"))(
        Tables.orders(s, dir))
        .select("o_orderkey", "o_orderpriority")),

    "b14_trim_majority" -> ((s, dir) =>
      TrimMajority("o_orderpriority", 500, orderCols = Seq("o_orderkey"))(
        Tables.orders(s, dir))
        .select("o_orderkey", "o_orderpriority")))

  val oracles: Map[String, String] = Map(
    "b1_random_split" -> """
      SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1""",

    "b1_stratified_split" -> """
      WITH c AS (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1)
      SELECT o_orderpriority, 'test' AS bucket, CAST(floor(cnt * 0.2) AS BIGINT) AS n FROM c
      UNION ALL
      SELECT o_orderpriority, 'train', cnt - CAST(floor(cnt * 0.2) AS BIGINT) FROM c""",

    "b3_undersample" -> """
      WITH m AS (SELECT min(cnt) AS mn FROM
                 (SELECT count(*) AS cnt FROM orders GROUP BY o_orderstatus))
      SELECT o_orderstatus, (SELECT mn FROM m) AS n
      FROM orders GROUP BY o_orderstatus""",

    "b6_oversample" -> """
      WITH m AS (SELECT max(cnt) AS mx FROM
                 (SELECT count(*) AS cnt FROM orders GROUP BY o_orderstatus))
      SELECT o_orderstatus, (SELECT mx FROM m) AS n
      FROM orders GROUP BY o_orderstatus""",

    "b19_class_weights" -> """
      WITH c AS (SELECT o_orderstatus, count(*) AS n_rows FROM orders GROUP BY 1),
      t AS (SELECT sum(n_rows) AS n, count(*) AS k FROM c)
      SELECT o_orderstatus, n_rows,
             round(CAST(n AS DOUBLE) / (CAST(k AS DOUBLE) * n_rows), 6) AS weight
      FROM c, t""",

    "b12_trim_equal" -> """
      SELECT o_orderkey, o_orderpriority FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) <= 100""",

    "b13_trim_proportional" -> """
      WITH t AS (SELECT o_orderkey, o_orderpriority,
                        row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn,
                        count(*) OVER (PARTITION BY o_orderpriority) AS cnt,
                        (SELECT count(*) FROM orders) AS total
                 FROM orders)
      SELECT o_orderkey, o_orderpriority FROM t
      WHERE rn <= greatest(1, floor(cnt * (3000.0 / total)))""",

    "b14_trim_majority" -> """
      WITH mj AS (SELECT o_orderpriority AS v FROM orders GROUP BY 1
                  ORDER BY count(*) DESC, o_orderpriority ASC LIMIT 1)
      SELECT o_orderkey, o_orderpriority FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)
              <= CASE WHEN o_orderpriority = (SELECT v FROM mj) THEN 500
                      ELSE count(*) OVER (PARTITION BY o_orderpriority) END""")
}
