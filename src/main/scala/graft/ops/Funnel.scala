package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event funnels — the `windowFunnel` analytic (which step of
  * view -> click -> purchase did each user reach, with all steps inside
  * a time window of step 1?) composed from declarative joins instead of
  * a per-user sequence scan.
  *
  * Semantics: step 1 is the user's EARLIEST occurrence of `steps(0)`;
  * step k is the earliest occurrence of `steps(k-1)` STRICTLY after the
  * user's step-(k-1) time and within `windowMicros` of their step-1
  * time. (Earliest-anchored, the common funnel definition; a user who
  * converts on a later attempt but not the first is out of window by
  * design — documented.)
  *
  * Scale: K steps cost K type-filtered scans (each `event_type`
  * predicate reaches the parquet scan) + K user-keyed joins of
  * SHRINKING per-user step tables; every aggregate is a
  * map-side-combined min; no window functions, no per-user sequence
  * buffering. All comparisons are integer microseconds — engine-exact.
  */
object Funnel {

  /** (user, step_reached) for every user who completed at least step 1. */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  windowMicros: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    def occ(step: String): DataFrame =
      df.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__ts"))
    var cur = occ(steps.head).groupBy("__u").agg(min("__ts").as("__t1"))
    val frames = scala.collection.mutable.ArrayBuffer(cur)
    for (i <- 2 to steps.length) {
      val carried = (1 until i).map(j => s"__t$j")
      cur = occ(steps(i - 1))
        .join(cur, "__u")
        .filter(col("__ts") > col(s"__t${i - 1}") &&
          col("__ts") - col("__t1") <= windowMicros)
        .groupBy(("__u" +: carried).map(col): _*)
        .agg(min("__ts").as(s"__t$i"))
      frames += cur
    }
    var out = frames.head.select(col("__u"), col("__t1"))
    for (i <- 2 to steps.length)
      out = out.join(frames(i - 1).select(col("__u"), col(s"__t$i")),
        Seq("__u"), "left")
    // build 2..K so the DEEPEST step lands outermost in the CASE chain
    val reached = (2 to steps.length).foldLeft(lit(1)) { (acc, i) =>
      when(col(s"__t$i").isNotNull, lit(i)).otherwise(acc)
    }
    out.select(col("__u").as(userCol), reached.as("step_reached"))
  }
}
