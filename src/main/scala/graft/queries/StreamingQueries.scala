package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Streams
import Q.QueryFn

/** Driver-checked queries for the streaming transforms, evaluated in batch
  * mode (Spark's batch/stream unification makes the logical plan
  * identical); StreamingSpec runs the same transforms through a real
  * readStream → memory sink and asserts equality with these results.
  */
object StreamingQueries {

  val queries: Map[String, QueryFn] = Map(
    "st1_tumbling_window" -> ((s, dir) =>
      Streams.tumblingCounts(Tables.events(s, dir))),

    "st2_sliding_window" -> ((s, dir) =>
      Streams.slidingCounts(Tables.events(s, dir))),

    "st3_session_window" -> ((s, dir) =>
      Streams.userSessions(Tables.events(s, dir))),

    "st4_json_props" -> ((s, dir) =>
      Streams.withProps(Tables.events(s, dir))
        .groupBy("event_type").agg(sum("k").as("sum_k"), count(lit(1)).as("n"))),

    "st5_big_spender" -> ((s, dir) =>
      graft.streaming.Stateful.bigSpenderBatch(Tables.events(s, dir), threshold = 500.0)),

    "st6_stream_dedup" -> ((s, dir) => {
      // batch path of the unified dedup call site over a dup-planted
      // stream; the REAL-stream path (watermark state eviction) is
      // proven by StreamingSpec against this same function
      val e = Tables.events(s, dir)
      Streams.dedupByKey(e.unionByName(e), Seq("event_id"))
        .agg(count(lit(1)).as("n_rows"), count_distinct(col("event_id")).as("n_ids"))
    }))

  val oracles: Map[String, String] = Map(
    "st1_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1, 2""",

    "st2_sliding_window" -> """
      WITH cand AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
               event_type, ts
        FROM events, (SELECT unnest([0, 1]) AS k))
      SELECT window_start, event_type, count(*) AS n
      FROM cand
      WHERE ts < window_start + INTERVAL '1 hour' AND ts >= window_start
      GROUP BY 1, 2""",

    "st3_session_window" -> """
      WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '10 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      s AS (SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM g)
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             round(sum(value), 4) AS sum_value
      FROM s GROUP BY user_id, sid""",

    "st4_json_props" -> """
      SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(*) AS n
      FROM events GROUP BY 1""",

    "st5_big_spender" -> """
      WITH r AS (SELECT user_id, value,
                        sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
                 FROM events)
      SELECT user_id, round(running, 4) AS total_at_crossing
      FROM r WHERE running >= 500.0 AND running - value < 500.0""",

    "st6_stream_dedup" -> """
      WITH doubled AS (SELECT event_id FROM events UNION ALL SELECT event_id FROM events)
      SELECT count(DISTINCT event_id) AS n_rows, count(DISTINCT event_id) AS n_ids
      FROM doubled""")
}
