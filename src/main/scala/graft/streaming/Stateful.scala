package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via KeyValueGroupedDataset.flatMapGroupsWithState —
  * the escape hatch for stream semantics windows can't express. The
  * running example: per-user cumulative spend with a "big spender" flag
  * the first time a user crosses a threshold.
  *
  * In batch mode the same semantics are a running-sum window (used by the
  * oracle-checked query `st5_big_spender`); the streaming path keeps one
  * small state record per user, bounded by processing-time timeout.
  */
object Stateful {

  case class Event(user_id: Long, value: Double)
  case class SpendState(total: Double, flagged: Boolean)
  case class Crossing(user_id: Long, total_at_crossing: Double)

  /** Streaming path: emits one record per user when their cumulative
    * value first crosses `threshold`. */
  def bigSpenderStream(events: Dataset[Event], threshold: Double): Dataset[Crossing] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SpendState]) =>
          var s = state.getOption.getOrElse(SpendState(0.0, flagged = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[Crossing]
          rows.foreach { e =>
            val nt = s.total + e.value
            if (!s.flagged && nt >= threshold) {
              out += Crossing(user, nt)
              s = SpendState(nt, flagged = true)
            } else s = s.copy(total = nt)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming as-of enrichment — the stream form of
    * [[graft.ops.RangeJoin.asOf]]: every left event is paired with the
    * LATEST right event of the same key at-or-before its (microsecond)
    * timestamp, or None. Both sides arrive as one tagged stream
    * (side 0 = right/state, side 1 = left/probe); per-key state is ONE
    * small record (the newest right event so far) — O(keys) state total,
    * not O(events), no watermark buffering needed.
    *
    * Within a micro-batch events are sorted by (us, side), so intra-batch
    * disorder is repaired exactly like the batch operator's window sort;
    * ACROSS batches a right event that arrives after a left event it
    * should have matched cannot retro-match (already emitted — the
    * inherent append-mode tradeoff; feed time-ordered batches, as any
    * log-compacted source does, and stream == batch, which
    * `StatefulSpec` proves on the real file stream). */
  case class TaggedEvent(key: Long, us: Long, side: Int, id: Long)
  case class LatestRight(us: Long, id: Long)
  case class AsOfMatch(key: Long, left_id: Long, right_id: Option[Long])

  def asOfEnrichStream(events: Dataset[TaggedEvent]): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[TaggedEvent], state: GroupState[LatestRight]) =>
          val batch = rows.toArray.sortBy(e => (e.us, e.side))
          var s = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfMatch]
          batch.foreach { e =>
            if (e.side == 0) {
              if (s.forall(_.us <= e.us)) s = Some(LatestRight(e.us, e.id))
            } else
              out += AsOfMatch(key, e.id, s.filter(_.us <= e.us).map(_.id))
          }
          s.foreach(state.update)
          out.iterator
      }
  }

  /** Batch equivalent (oracle-checkable): the first event per user whose
    * running sum (in ts order, event_id tiebreak) crosses the threshold.
    * NOTE: streaming arrival order is file order; the batch oracle fixes
    * ts order — equal only when input is time-ordered (testdata is). */
  def bigSpenderBatch(events: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .withColumn("running", sum("value").over(w))
      .filter(col("running") >= threshold &&
        (col("running") - col("value")) < threshold)
      .select(col("user_id"), round(col("running"), 4).as("total_at_crossing"))
  }
}
