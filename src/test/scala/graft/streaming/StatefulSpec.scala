package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec
import graft.core.Tables

class StatefulSpec extends SparkSpec {

  test("flatMapGroupsWithState big-spender stream equals the batch window") {
    import spark.implicits._
    val events = Tables.events(spark, sf).orderBy("ts")
    val expected = Stateful.bigSpenderBatch(events, 500.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted

    // stage time-ordered events so streaming arrival order == ts order
    val dir = java.nio.file.Files.createTempDirectory("stateful_stream").toString
    events.select("user_id", "value", "ts", "event_id")
      .coalesce(1).sortWithinPartitions("ts", "event_id")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(events.select("user_id", "value", "ts", "event_id").schema)
      .parquet(dir)
      .select(col("user_id"), col("value")).as[Stateful.Event]
    val q = Stateful.bigSpenderStream(stream, 500.0)
      .writeStream.format("memory").queryName("spender_sink")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("spender_sink").collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4) / 1e4)).sorted
    assert(got.length == expected.length,
      s"stream ${got.length} vs batch ${expected.length}")
    assert(got.map(_._1).sameElements(expected.map(_._1)))
  }

  test("streaming as-of enrich equals the batch asOf join on the real file stream") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val buys = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errs = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val expected = graft.ops.RangeJoin.asOf(buys, errs, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

    val tagged = buys.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("us"), lit(1).as("side"), col("event_id").as("id"))
      .unionByName(errs.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("us"), lit(0).as("side"), col("event_id").as("id")))
    val dir = java.nio.file.Files.createTempDirectory("asof_stream").toString
    tagged.coalesce(1).sortWithinPartitions("us", "side")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(tagged.schema).parquet(dir)
      .as[Stateful.TaggedEvent]
    val q = Stateful.asOfEnrichStream(stream)
      .writeStream.format("memory").queryName("asof_sink")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("asof_sink").collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == expected, s"stream ${got.size} rows vs batch ${expected.size}")
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }
}
