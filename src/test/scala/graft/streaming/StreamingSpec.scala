package graft.streaming

import graft.SparkSpec
import graft.core.Tables

class StreamingSpec extends SparkSpec {

  /** File stream sources need a DIRECTORY; stage the events table (with
    * the nanos->micros ts conversion applied) as parquet once. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(d)
    d
  }

  test("tumbling counts: real file stream equals batch result") {
    val batchDf = Tables.events(spark, sf)
    val schema = batchDf.schema
    val expected = Streams.tumblingCounts(batchDf)
      .collect().map(_.toString).sorted

    val q = Streams.runFileStream(spark, eventsDir, schema,
      Streams.tumblingCounts(_), "tumbling_sink")
    q.awaitTermination(120000)
    val got = spark.table("tumbling_sink").collect().map(_.toString).sorted
    assert(got.sameElements(expected),
      s"stream rows ${got.length} vs batch ${expected.length}")
  }

  test("session windows: real file stream equals batch result") {
    val batchDf = Tables.events(spark, sf)
    val expected = Streams.userSessions(batchDf).collect().map(_.toString).sorted
    val q = Streams.runFileStream(spark, eventsDir, batchDf.schema,
      Streams.userSessions(_), "session_sink")
    q.awaitTermination(120000)
    val got = spark.table("session_sink").collect().map(_.toString).sorted
    assert(got.sameElements(expected),
      s"stream rows ${got.length} vs batch ${expected.length}")
  }
}
