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

  /** As-of join (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics):
    * every left row paired with the LATEST right row of the same key
    * whose timestamp is <= the left timestamp (inclusive), at
    * microsecond granularity; unmatched left rows keep null right
    * columns (left-join semantics). With `toleranceSec`, matches older
    * than the tolerance are nulled out, as in pandas. Output columns are
    * the left's prefixed `l_` and the right's prefixed `r_`.
    *
    * Implementation is the union-ordered-state shape (what Flink calls a
    * temporal join): tag both sides, hash-shuffle ONCE by key, and let a
    * per-key running `last(payload, ignoreNulls)` window carry the most
    * recent right payload forward into each left row — one exchange, one
    * sort, no per-key cartesian and no unbounded lookback scan. The
    * window partitions BY KEY (bounded by a key's history — the standard
    * shape; a pathologically hot key should pre-split upstream or use
    * [[within]]'s bucketed form when a gap bound exists).
    *
    * Right rows with a null key never match (SQL join semantics), and a
    * null-key left row gets null right columns. Ties INSIDE the right
    * side (same key, same microsecond) are resolved arbitrarily — keep
    * (key, ts) unique on the right, as any engine's as-of requires for a
    * deterministic answer. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           toleranceSec: Option[Long] = None): DataFrame = {
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("__k", col(s"l_$keyCol"))
      .withColumn("__us", unix_micros(col(s"l_$tsCol")))
      .withColumn("__side", lit(1))
    // null keys and null timestamps never match (SQL comparison
    // semantics — an ASOF oracle's l.ts >= r.ts is false for NULL);
    // dropping them here keeps a null-ts right row from masquerading as
    // "earliest" under the window's nulls-first sort
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")): _*)
      .filter(col(s"r_$keyCol").isNotNull && col(s"r_$tsCol").isNotNull)
      .withColumn("__k", col(s"r_$keyCol"))
      .withColumn("__us", unix_micros(col(s"r_$tsCol")))
      .withColumn("__side", lit(0))
      .select(col("__k"), col("__us"), col("__side"),
        struct((col("__us").as("__rus") +:
          right.columns.map(c => col(s"r_$c"))): _*).as("__pay"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__k")
      .orderBy(col("__us").asc, col("__side").asc)
      .rowsBetween(Long.MinValue, 0)
    val matched = u
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__m", when(col("__k").isNull, lit(null)).otherwise(
        toleranceSec.map(t => when(
          col("__us") - col("__m.__rus") <= t * 1000000L, col("__m")))
          .getOrElse(col("__m"))))
    matched.select(left.columns.map(c => col(s"l_$c")) ++
      right.columns.map(c => col(s"__m.r_$c").as(s"r_$c")): _*)
  }
}
