package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global ordinals WITHOUT the single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the whole frame
  * through ONE partition — the r1/r2 verdict's SMOTE/NearMiss scale
  * killer. The fix SCALING.md names: sort (range-partitioned, each
  * partition O(partition)) then `zipWithIndex` (one lightweight
  * partition-size count job, then a narrow map). For a TOTAL sort order
  * the assigned ordinal is identical to the global window's row_number
  * regardless of where the range boundaries fall.
  */
object Ordinals {

  /** Append `out` = 1-based global rank of the row under `sortCols`
    * (must be a total order for a deterministic result).
    *
    * Stays entirely in DataFrame/Tungsten land (no `.rdd` round trip —
    * the old zipWithIndex shape deserialized EVERY row to a GenericRow
    * and back, and the rebuilt frame was a codegen/pruning barrier):
    * after the range sort, `monotonically_increasing_id` is contiguous
    * within each partition in row order, so global rank = local id -
    * partition's first id + the preceding partitions' cumulative count.
    * The per-partition (count, first-id) frame is O(#partitions) —
    * dictionary-sized — so its cumulative sum may run through the one
    * deliberate keyless window (SCALING.md's accepted class), and the
    * broadcast join back happens IN THE SAME ACTION as the output: the
    * range-sort exchange appears twice in the static plan and AQE stage
    * reuse materializes it ONCE (no separate collect job, no second
    * sort pass, nothing persisted). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("__pid").rowsBetween(Long.MinValue, -1)
    val offsets = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), min("__mid").as("__m0"))
      .withColumn("__off", coalesce(sum("__c").over(w), lit(0L)) - col("__m0") + 1L)
      .select("__pid", "__off")
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__mid") + col("__off"))
      .drop("__pid", "__mid", "__off")
  }

  /** Rows at chosen 1-based GLOBAL ranks under `sortCols` (a total
    * order), without materializing a rank column: range-sort once,
    * locate each wanted rank's (partition, local offset) on the driver
    * from the per-partition counts — 2 jobs, no join, O(#partitions)
    * driver data, bounded executor memory at any scale. `ranksOf`
    * receives the total row count and returns the wanted ranks;
    * out-of-range ranks are ignored. Backs [[graft.ops.Relational.exactMedian]]
    * (order statistics without buffering a column in an agg). */
  def rowsAtRanks(df: DataFrame, sortCols: Seq[Column],
                  ranksOf: Long => Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val parts = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), min("__mid").as("__m0"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = parts.map(_._2).sum
    val targets = ranksOf(n).distinct.filter(r => r >= 1 && r <= n).map { r =>
      var rem = r; var i = 0
      while (rem > parts(i)._2) { rem -= parts(i)._2; i += 1 }
      (parts(i)._1, parts(i)._3 + rem - 1)
    }
    if (targets.isEmpty) sorted.filter(lit(false)).drop("__pid", "__mid")
    else sorted.filter(targets.map { case (p, m) =>
        col("__pid") === p && col("__mid") === m
      }.reduce(_ || _)).drop("__pid", "__mid")
  }

  /** Per-key 1-based rank under `sortCols` WITHOUT a per-key window
    * reducer: global rank over (key, sortCols) via [[withGlobalRank]],
    * then subtract each key's first global index (a broadcast dictionary
    * — the key column must be low-cardinality, which class/target
    * columns are by definition). A pathologically hot key (a 50 TB
    * majority class) no longer sorts through ONE reducer: the range
    * sort spreads it across many partitions. */
  def withPerKeyRank(df: DataFrame, key: String, sortCols: Seq[Column],
                     out: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val idx = withGlobalRank(df, col(key).asc +: sortCols, "__gidx")
    val firsts = idx.groupBy(col(key).as("__k")).agg(min("__gidx").as("__first"))
    idx.join(broadcast(firsts), col(key) <=> col("__k"))
      .withColumn(out, col("__gidx") - col("__first") + 1L)
      .drop("__gidx", "__first", "__k")
  }

  /** Append `out` = INCLUSIVE running total of numeric `valueCol` under
    * the total order `sortCols` — the distributed form of
    * `sum(v).over(Window.orderBy(...))`, now a CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.RunningTotalPlan]], planned by the injected
    * [[graft.plans.RunningTotalStrategy]]): the exec declares the range
    * sort as its required child distribution (no extra exchange) and
    * runs the two-phase offset scan over the materialized shuffle in
    * Tungsten rows — no `.rdd` GenericRow round trip, no codegen
    * barrier. (The previous RDD shape deserialized every row twice.) */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                       out: String): DataFrame =
    graft.plans.RunningTotal(df, sortCols, valueCol, out)
}
