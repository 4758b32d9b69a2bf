package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("funnelSteps: order, strictness, window anchor, partial funnels") {
    import spark.implicits._
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      // u2: purchase BEFORE click -> stops at click (step 2)
      (2L, ts(0), "view"), (2L, ts(30), "click"), (2L, ts(5), "purchase"),
      // u3: click at the SAME time as view -> strictness stops at step 1
      (3L, ts(0), "view"), (3L, ts(0), "click"),
      // u4: click outside the 60-minute window of the FIRST view,
      // even though a later view would qualify (earliest-anchored)
      (4L, ts(0), "view"), (4L, ts(100), "view"), (4L, ts(110), "click"),
      // u5 never views -> absent from the result
      (5L, ts(0), "click"), (5L, ts(10), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowMicros = 60L * 60000000)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1), got.toString)
    // unbounded window lets u4 through to step 2
    val unbounded = Funnel.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(unbounded(4L) == 2)
    // single-step funnel degenerates to "has the event"
    val one = Funnel.funnelSteps(events, "user_id", "ts", "event_type",
      Seq("purchase")).as[(Long, Int)].collect().toMap
    assert(one == Map(1L -> 1, 2L -> 1, 5L -> 1))
  }
}
