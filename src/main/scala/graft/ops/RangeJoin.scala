package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-window (range) joins without the O(n²)-per-key blowup.
  *
  * A naive `l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + gap` join
  * gives Spark only the equality to plan with: every key's whole history
  * meets in one task and the range filter runs over the cartesian of the
  * key group — quadratic in the hot key's size. The scale recipe is the
  * standard one: quantize time into gap-sized buckets and EQUI-join on
  * (key, bucket), probing each left row's own bucket and the next — a
  * right row at most `gap` later is always in one of the two — then
  * apply the exact range predicate. Shuffle volume is 2× the left side
  * on short uniform (key, bucket) longs; per-task fan-out is bounded by
  * a bucket's event density, never a key's full history.
  *
  * Arithmetic is integer microseconds (`unix_micros`) end to end — no
  * floating-point boundary cases, and a SQL oracle (`epoch_us`)
  * reproduces pairs exactly. The same (bucket ∪ next-bucket, range
  * filter) shape runs under Structured Streaming as a stream-stream
  * interval join with watermarks bounding the bucket state.
  */
object RangeJoin {

  /** Pairs (l, r) with `l.key == r.key` and `r.ts` in
    * `[l.ts, l.ts + gapSec]` (inclusive both ends). Both inputs must
    * carry `keyCol` and a TimestampType `tsCol`; output columns are the
    * left's prefixed `l_` and the right's prefixed `r_`. */
  def within(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
             gapSec: Long): DataFrame = {
    val gapUs = gapSec * 1000000L
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("__lus", unix_micros(col(s"l_$tsCol")))
      .withColumn("__lb", explode(array(
        floor(col("__lus") / gapUs).cast(LongType),
        floor(col("__lus") / gapUs).cast(LongType) + 1L)))
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__rus", unix_micros(col(s"r_$tsCol")))
      .withColumn("__rb", floor(col("__rus") / gapUs).cast(LongType))
    l.join(r,
        col(s"l_$keyCol") === col(s"r_$keyCol") &&
          col("__lb") === col("__rb") &&
          col("__rus") >= col("__lus") &&
          col("__rus") <= col("__lus") + gapUs)
      .drop("__lus", "__lb", "__rus", "__rb")
  }
}
