package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query packs live in graft.queries.*; each contributes
  * (name -> query fn) and (name -> DuckDB oracle SQL) pairs.
  */
object SparkEntry {

  private val packs: Seq[(Map[String, Q.QueryFn], Map[String, String])] = Seq(
    (SourceQueries.queries, SourceQueries.oracles),
    (RelationalQueries.queries, RelationalQueries.oracles),
    (EncodingQueries.queries, EncodingQueries.oracles),
    (ImputationQueries.queries, ImputationQueries.oracles),
    (BalancingQueries.queries, BalancingQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (DedupQueries.queries, DedupQueries.oracles),
    (MlQueries.queries, MlQueries.oracles),
    (StreamingQueries.queries, StreamingQueries.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles),
    (SmoteQueries.queries, SmoteQueries.oracles),
    (MiscQueries.queries, MiscQueries.oracles),
    (JoinQueries.queries, JoinQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_._2).toMap
}
