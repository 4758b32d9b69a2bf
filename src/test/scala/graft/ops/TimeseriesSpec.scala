package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("sessionize: gap rule, numbering, counts, durations") {
    import spark.implicits._
    val events = Seq(
      // u1: two sessions — 10-min gaps inside, a 45-min gap between
      (1L, ts(0), 10L), (1L, ts(10), 11L), (1L, ts(20), 12L),
      (1L, ts(65), 13L), (1L, ts(70), 14L),
      // u2: one single-event session
      (2L, ts(5), 20L),
      // u3: boundary — exactly 30 minutes is NOT a break (> gap, not >=)
      (3L, ts(0), 30L), (3L, ts(30), 31L), (3L, ts(61), 32L))
      .toDF("user_id", "ts", "event_id")
    val got = Timeseries.sessionize(events, "user_id", "ts", "event_id",
        gapMicros = 30L * 60000000)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (u, s, n, st, en, d) => (u, s) -> (n, st, en, d) }.toMap
    assert(got((1L, 1L)) == (3L, 0L, 20L * 60000000, 20L * 60000000))
    assert(got((1L, 2L)) == (2L, 65L * 60000000, 70L * 60000000, 5L * 60000000))
    assert(got((2L, 1L)) == (1L, 5L * 60000000, 5L * 60000000, 0L))
    // u3: 30-min gap keeps the session, the 31-min gap breaks it
    assert(got((3L, 1L))._1 == 2L && got((3L, 2L))._1 == 1L)
    assert(got.size == 5)
  }

  test("sessionize agrees with Spark's session_window on the real events table") {
    // same gap rule, two implementations: the window/running-count
    // sessionize and Structured Streaming's session_window aggregation
    // (run in batch mode) must carve identical sessions — (user, start,
    // n_events) multisets equal. (session_window's `end` is last+gap by
    // definition, so only start/count are directly comparable.)
    val events = graft.core.Tables.events(spark, sf)
    val mine = Timeseries.sessionize(events, "user_id", "ts", "event_id",
        gapMicros = 10L * 60 * 1000000)
      .select("user_id", "start_us", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val sw = graft.streaming.Streams.userSessions(events, "10 minutes")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("session_start")).as("start_us"),
        org.apache.spark.sql.functions.col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(mine.nonEmpty && mine.sameElements(sw))
  }

  test("rollingRange: trailing window, inclusive bound, timestamp peers") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(30), 2.0), (1L, ts(70), 4.0), (1L, ts(200), 8.0),
      // u2: two events at the SAME timestamp — RANGE peers see each other
      (2L, ts(5), 10.0), (2L, ts(5), 20.0))
      .toDF("user_id", "ts", "value")
    val got = Timeseries.rollingRange(events, "user_id", "ts", "value",
        windowMicros = 60L * 60000000)
      .as[(Long, Timestamp, Long, Double)].collect()
      .map { case (u, t, n, sm) => (u, t.getTime / 60000) -> (n, sm) }.toSet
    assert(got.contains((1L, 0L) -> (1L, 1.0)))
    assert(got.contains((1L, 30L) -> (2L, 3.0)))
    // t=70: the 60-min trailing window [10, 70] drops t=0
    assert(got.contains((1L, 70L) -> (2L, 6.0)))
    assert(got.contains((1L, 200L) -> (1L, 8.0)))
    // both peer rows carry the full peer frame
    assert(got.count(_._1._1 == 2L) == 1 || got.contains((2L, 5L) -> (2L, 30.0)))
    assert(got.filter(_._1._1 == 2L).forall(_._2 == (2L, 30.0)))
  }

  test("stateIslands: consecutive same-state runs collapse to intervals") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(1), 2L, "A"), (1L, ts(2), 3L, "B"),
      (1L, ts(3), 4L, "A"),
      (2L, ts(0), 5L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Timeseries.stateIslands(events, "user_id", "ts", "event_id",
        "event_type")
      .as[(Long, String, Long, Long, Long)].collect()
      .map { case (u, st, s0, s1, n) => (u, s0 / 60000000) -> (st, s1 / 60000000, n) }
      .toMap
    assert(got((1L, 0L)) == ("A", 1L, 2L))   // first A-run spans t0..t1
    assert(got((1L, 2L)) == ("B", 2L, 1L))
    assert(got((1L, 3L)) == ("A", 3L, 1L))   // later A-run is a NEW island
    assert(got((2L, 0L)) == ("C", 0L, 1L))
    assert(got.size == 4)
  }

  test("cumulativeFirstSeen: new vs returning, running total") {
    import spark.implicits._
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    val events = Seq(
      (1L, day(1)), (2L, day(1)),          // two new on day 1
      (1L, day(2)),                         // returning only
      (3L, day(3)), (1L, day(3)), (4L, day(3))) // two new on day 3
      .toDF("user_id", "ts")
    val got = Timeseries.cumulativeFirstSeen(events, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (d, n, c) => d.toString -> (n, c) }.toMap
    assert(got == Map("2024-03-01" -> (2L, 2L), "2024-03-03" -> (2L, 4L)))
  }

  test("cohortRetention: offsets, sizes, self-retention = 1.0") {
    import spark.implicits._
    // Mondays: 2024-03-04, 2024-03-11, 2024-03-18
    def ts(s: String): Timestamp = Timestamp.valueOf(s + " 09:00:00")
    val events = Seq(
      // cohort A (wk of Mar 4): u1 active wk0, wk1, wk2; u2 wk0 only
      (1L, ts("2024-03-05")), (1L, ts("2024-03-12")), (1L, ts("2024-03-20")),
      (2L, ts("2024-03-06")),
      // cohort B (wk of Mar 11): u3 active wk0 and wk1
      (3L, ts("2024-03-13")), (3L, ts("2024-03-19")))
      .toDF("user_id", "ts")
    val got = Timeseries.cohortRetention(events, "user_id", "ts")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
      .map { case (cw, off, na, cs, r) => (cw.toString, off) -> (na, cs, r) }
      .toMap
    assert(got(("2024-03-04", 0L)) == (2L, 2L, 1.0))
    assert(got(("2024-03-04", 1L)) == (1L, 2L, 0.5))
    assert(got(("2024-03-04", 2L)) == (1L, 2L, 0.5))
    assert(got(("2024-03-11", 0L)) == (1L, 1L, 1.0))
    assert(got(("2024-03-11", 1L)) == (1L, 1L, 1.0))
    assert(got.size == 5)
  }

  test("transitionMatrix: lag pairs, row-normalized probabilities") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(1), 2L, "B"), (1L, ts(2), 3L, "A"),
      (1L, ts(3), 4L, "B"),
      (2L, ts(0), 5L, "A"), (2L, ts(1), 6L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Timeseries.transitionMatrix(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map { case (f, t, n, p) => (f, t) -> (n, p) }.toMap
    // from A: A->B twice (u1), A->A once (u2) => p = 2/3, 1/3
    assert(got(("A", "B")) == (2L, 0.666667))
    assert(got(("A", "A")) == (1L, 0.333333))
    // from B: B->A once => p = 1.0; no cross-user pair (u1 end -> u2 start)
    assert(got(("B", "A")) == (1L, 1.0))
    assert(got.size == 3)
  }

  test("twap: duration weights, last observation unweighted, singletons drop") {
    import spark.implicits._
    val events = Seq(
      // u1: 10 held 10 min, 20 held 20 min, 40 unweighted
      (1L, ts(0), 1L, 10.0), (1L, ts(10), 2L, 20.0), (1L, ts(30), 3L, 40.0),
      // u2: single event -> zero weight -> absent
      (2L, ts(5), 4L, 99.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Timeseries.twap(events, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Double)].collect()
      .map { case (u, t, v) => u -> (t, v) }.toMap
    // (10*10 + 20*20) / 30 = 500/30 = 16.666667
    assert(got == Map(1L -> (30L * 60000000, 16.666667)))
  }

  test("ohlcBars: open/close by time order, high/low, per-hour bars") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(5), 1L, 5.0), (1L, ts(10), 2L, 9.0), (1L, ts(20), 3L, 1.0),
      (1L, ts(50), 4L, 7.0),   // hour 0
      (1L, ts(65), 5L, 3.0))   // hour 1
      .toDF("user_id", "ts", "event_id", "value")
    val got = Timeseries.ohlcBars(events, "user_id", "ts", "event_id", "value")
      .as[(Long, Timestamp, Double, Double, Double, Double, Long)].collect()
      .map { case (u, b, o, h, l, c, n) => (u, b.getTime / 3600000) -> (o, h, l, c, n) }
      .toMap
    assert(got((1L, 0L)) == (5.0, 9.0, 1.0, 7.0, 4L))
    assert(got((1L, 1L)) == (3.0, 3.0, 3.0, 3.0, 1L))
  }

  test("resampleDailyLocf: grid spans min..max, gaps carry forward") {
    import spark.implicits._
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val events = Seq(
      // u1: events on Jan 1 (two rows summed) and Jan 4 — Jan 2/3 filled
      (1L, day(1), 1.5), (1L, day(1), 2.5), (1L, day(4), 7.0),
      // u2: single day — one grid row, no gaps
      (2L, day(10), 3.25))
      .toDF("user_id", "ts", "value")
    val got = Timeseries.resampleDailyLocf(events, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Double, Boolean)].collect()
      .map { case (u, d, v, g) => (u, d.toString) -> (v, g) }.toMap
    assert(got.size == 5)
    assert(got((1L, "2024-01-01")) == (4.0, false))
    assert(got((1L, "2024-01-02")) == (4.0, true))
    assert(got((1L, "2024-01-03")) == (4.0, true))
    assert(got((1L, "2024-01-04")) == (7.0, false))
    assert(got((2L, "2024-01-10")) == (3.25, false))
  }

  test("kaplanMeier: hand-computed curve with censoring and tied deaths") {
    import spark.implicits._
    def h(hours: Long) = new Timestamp(hours * 3600000L)
    // u1,u2: 10h lifetimes (churned); u3: 20h (churned); u4: 90h but
    // last event inside the 24h edge -> censored; u5: single event at
    // the edge -> 0h lifetime, censored
    val events = Seq(
      (1L, h(0)), (1L, h(10)), (2L, h(0)), (2L, h(10)),
      (3L, h(0)), (3L, h(20)), (4L, h(5)), (4L, h(95)), (5L, h(100)))
      .toDF("user_id", "ts")
    val got = Timeseries.kaplanMeier(events, "user_id", "ts", 24)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val H = 3600000000L
    assert(got(0L) == ((5L, 0L, 1L, 1.0)), got.toString)
    assert(got(10 * H) == ((4L, 2L, 0L, 0.5)))   // 1 * (1 - 2/4)
    assert(got(20 * H) == ((2L, 1L, 0L, 0.25)))  // 0.5 * (1 - 1/2)
    assert(got(90 * H) == ((1L, 0L, 1L, 0.25)))  // censoring: no drop
    // partitioning invariance (scaled-integer log prefix is exact)
    val again = Timeseries.kaplanMeier(events.repartition(7), "user_id",
      "ts", 24).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(again == got.map { case (k, v) => k -> v._4 })
  }

  test("logRank: hand-computed O/E/V with a censored sentinel") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when => w}
    def h(hours: Long) = new Timestamp(hours * 3600000L)
    // A lifetimes {1h, 2h}, B {3h, 4h} (all churned); sentinel in B at
    // the edge (censored, lifetime 0 — leaves every later risk set)
    val events = Seq(
      (1L, h(0)), (1L, h(1)), (2L, h(0)), (2L, h(2)),
      (11L, h(0)), (11L, h(3)), (12L, h(0)), (12L, h(4)),
      (99L, h(100)))
      .toDF("user_id", "ts")
    val Array(r) = Timeseries.logRank(events, "user_id", "ts",
      w(col("user_id") < 10, "A").otherwise("B"), aVal = "A", 24).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 2L)))
    assert(r.getDouble(3) == 0.833333, "e_a")   // 1/2 + 1/3
    assert(r.getDouble(4) == 0.472222, "v")     // 1/4 + 2/9
    assert(r.getDouble(5) == 2.882353, "chi2")  // (2-5/6)^2 / (17/36)
  }

  test("nelsonAalen: hand-computed hazard on the KM fixture") {
    import spark.implicits._
    def h(hours: Long) = new Timestamp(hours * 3600000L)
    val events = Seq(
      (1L, h(0)), (1L, h(10)), (2L, h(0)), (2L, h(10)),
      (3L, h(0)), (3L, h(20)), (4L, h(5)), (4L, h(95)), (5L, h(100)))
      .toDF("user_id", "ts")
    val got = Timeseries.nelsonAalen(events, "user_id", "ts", 24)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    val H = 3600000000L
    assert(got(0L) == ((0.0, 0.0)))
    assert(got(10 * H) == ((0.5, 0.125)))      // 2/4, 2/16
    assert(got(20 * H) == ((1.0, 0.375)))      // +1/2, +1/4
    assert(got(90 * H) == ((1.0, 0.375)))      // censoring adds nothing
  }

  test("acf: alternating hourly series gives -1-ish at lag 1, +1-ish at lag 2") {
    import spark.implicits._
    // 48 hours alternating 10/20: mean 15, denom 48*25;
    // lag1 = 47*(-25)/1200, lag2 = 46*25/1200
    val events = (0 until 48).map(h =>
      (new Timestamp(h * 3600000L), if (h % 2 == 0) 10.0 else 20.0))
      .toDF("ts", "value")
    val got = Timeseries.acf(events, "ts", "value", maxLag = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1) == ((47L, -0.979167)), got.toString)
    assert(got(2) == ((46L, 0.958333)))
    assert(got(3)._2 == -0.9375) // 45*(-25)/1200
  }

  test("seasonalNaiveMase: exactly periodic series gives mase 0; " +
    "gappy hours skip pairs") {
    import spark.implicits._
    // 72 hours, perfect 24h period (value = hour-of-day), hour 50 missing
    val events = (0 until 72).filter(_ != 50).map(h =>
      (new Timestamp(h * 3600000L), (h % 24).toDouble)).toDF("ts", "value")
    val Array(r) = Timeseries.seasonalNaiveMase(events, "ts", "value",
      season = 24).collect()
    // naive pairs: 71 candidate t's minus t=50 (missing) and t=51
    // (predecessor missing) = 69; seasonal: t in 24..71 minus t=50 = 47
    assert(r.getLong(0) == 69L, s"n_naive ${r.getLong(0)}")
    assert(r.getLong(2) == 47L, s"n_seasonal ${r.getLong(2)}")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0) // mae_seasonal, mase
  }

  test("seasonalDecompose: pure period-4 signal recovered exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // y(h) = 100 + s[h % 4], s = (+8, -2, -4, -2): seasonal sums to 0,
    // so trend must be the constant 100, seasonal s, residual 0 on the
    // interior; the 2 edge hours each side have null trend/residual
    val pat = Seq(8.0, -2.0, -4.0, -2.0)
    val rows = (0 until 24).map { h =>
      (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(h * 3600L)), 100.0 + pat(h % 4))
    }
    val df = rows.toDF("ts", "v")
    val out = Timeseries.seasonalDecompose(df, "ts", "v", period = 4)
      .orderBy("h_us").collect()
    assert(out.length == 24)
    val interior = out.drop(2).dropRight(2)
    interior.foreach { r =>
      assert(math.abs(r.getDouble(3) - 100.0) < 1e-6, r.toString) // trend
      assert(math.abs(r.getDouble(4)) < 1e-6, r.toString)         // resid
      val ph = ((r.getLong(0) / 3600000000L) % 4).toInt
      assert(math.abs(r.getDouble(2) - pat(ph)) < 1e-6, r.toString)
    }
    (out.take(2) ++ out.takeRight(2)).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4), r.toString)
    }
  }
}
