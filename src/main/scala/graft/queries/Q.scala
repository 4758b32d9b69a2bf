package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the driver-checked query packs. Every pack exposes
  * `queries` (name -> (spark, sfDir) => DataFrame) and `oracles`
  * (name -> equivalent DuckDB SQL over the same parquet tables). Column
  * names are aliased identically on both sides — the driver sorts columns
  * by name before hashing. Floating aggregates are rounded on BOTH sides
  * so double summation order can't flip the hash.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** lineitem with deterministic synthetic nulls: l_quantity nulled where
    * l_linenumber = 3 (the testdata has no nulls; imputation/missing-
    * profile operators need some). Mirrored in oracle SQL as
    * CASE WHEN l_linenumber = 3 THEN NULL ELSE l_quantity END.
    */
  def lineitemWithNulls(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.lineitem(s, dir)
      .withColumn("l_quantity",
        when(col("l_linenumber") === 3, lit(null)).otherwise(col("l_quantity")))

  val NullifiedQtySql: String =
    "CASE WHEN l_linenumber = 3 THEN NULL ELSE l_quantity END"

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
