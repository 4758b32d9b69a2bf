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
}
