package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** JSONL corpus ingestion with corrupt-line quarantine — the web-crawl
  * interchange format. Read is text-lines + `from_json` (both map-only,
  * fully codegen) instead of `spark.read.json`'s `_corrupt_record`
  * column: the corrupt-column route requires caching the frame before
  * the corrupt rows can even be filtered (a Spark limitation since 2.3),
  * which is exactly the kind of library-owned persist this engine bans.
  * `from_json` yields a null struct for an unparseable line, so good
  * rows and quarantine split with two filters off one scan — at 100 TB
  * the quarantine is a free byproduct, not a second pass.
  *
  * Semantics match `spark.read.json` PERMISSIVE: a line is quarantined
  * when it is structurally invalid OR a field value can't take its
  * schema type (the corrupt-record column fires for both). Blank lines
  * are skipped entirely.
  */
object Jsonl {

  /** (good rows, quarantined raw lines). */
  def read(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "__corrupt"
    require(!schema.fieldNames.contains(corrupt),
      s"schema may not contain the reserved column name $corrupt")
    val pschema = schema.add(corrupt, "string")
    val lines = spark.read.text(path).filter(trim(col("value")) =!= "")
    val parsed = lines.select(col("value"), from_json(col("value"), pschema,
      Map("columnNameOfCorruptRecord" -> corrupt).asJava).as("__j"))
    // a line holding the JSON literal `null` parses to a NULL STRUCT
    // (corrupt column included) — without the isNotNull guard it would
    // land in the GOOD output as an all-null row; it belongs in the
    // quarantine, matching spark.read.json PERMISSIVE
    (parsed.filter(col("__j").isNotNull && col(s"__j.$corrupt").isNull)
       .select(col("__j.*")).drop(corrupt),
     parsed.filter(col("__j").isNull || col(s"__j.$corrupt").isNotNull)
       .select(col("value").as("raw")))
  }

  def write(df: DataFrame, path: String, mode: String = "error"): Unit =
    df.write.mode(mode).json(path)
}
