package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the harness's star-schema parquet tables (TESTDATA.md).
  * At 100 TB these would be partitioned/bucketed table paths behind a
  * catalog; the parquet scan + Catalyst pushdown path is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  /** events.ts is parquet TIMESTAMP(NANOS) — read as long (see Sessions
    * nanosAsLong) and truncated to microseconds, matching engines whose
    * native timestamp is us (floor division: exact, no double rounding). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
        // TIMESTAMP_NTZ under Spark 4's NTZ inference, but watermarks
        // and unix_micros need the instant type. The session time zone
        // is pinned UTC (Sessions.tune), so this cast relabels the same
        // wall-clock values — microsecond-identical to the oracle's
        // naive-timestamp reading.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
