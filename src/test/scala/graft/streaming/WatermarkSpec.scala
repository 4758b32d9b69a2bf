package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkSpec

/** Proves watermark semantics with real multi-batch streaming: an event
  * arriving after the watermark has passed its window is DROPPED from the
  * appended results. */
class WatermarkSpec extends SparkSpec {

  private def writeBatch(target: java.nio.file.Path, name: String,
                         rows: Seq[(java.sql.Timestamp, String, Double)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("wm_batch")
    rows.toDF("ts", "event_type", "value").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-")).get
    Files.move(part, target.resolve(name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("late events beyond the watermark are dropped; on-time windows finalize") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val dir = Files.createTempDirectory("wm_stream")
    // batch 1: events in the 10:00 and 13:00 windows — watermark advances
    // to 13:30 - 2h = 11:30 after the batch, expiring the 10:00 window
    writeBatch(dir, "b1.parquet", Seq(
      (ts(10), "click", 1.0), (ts(10), "click", 2.0), (ts(13), "view", 3.0)))

    val schema = Seq((ts(10), "x", 1.0)).toDF("ts", "event_type", "value").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val agg = stream.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("w.start").as("start"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // batch 2, AFTER the watermark advanced: one LATE event in the
    // already-expired 10:00 window + one on-time at 14:30
    writeBatch(dir, "b2.parquet", Seq(
      (ts(10), "click", 99.0), (ts(14), "view", 4.0)))
    q.processAllAvailable()
    // one more empty-ish advance so appendable windows flush
    writeBatch(dir, "b3.parquet", Seq((ts(17), "view", 5.0)))
    q.processAllAvailable()
    q.stop()

    val byWindow = spark.table("wm_sink").collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    // the 10:00 window finalized with ONLY the two on-time events — the
    // late 99.0 never entered it
    assert(byWindow.get("2024-01-01 10:00:00.0").contains((2L, 3.0)), byWindow.toString)
  }
}
