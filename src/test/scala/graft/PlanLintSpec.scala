package graft

import graft.SparkSpec

/** Plan lint over the whole bench headline: no query may plan an
  * interpreted array higher-order function (ArrayAggregate / ZipWith /
  * ArrayTransform / ArrayFilter — the ~100x path), a Scala UDF, or a
  * non-broadcast cartesian product. This is the durable regression gate
  * for the engine's codegen story — a new operator that sneaks a lambda
  * or UDF onto a scale path fails here, not in a 100 TB run.
  *
  * (Known justified UDF OUTSIDE the headline: `Hashing.CountMinFreq`
  * closes over a driver-built mergeable sketch — no column-expression
  * equivalent exists.)
  */
class PlanLintSpec extends SparkSpec {

  private val banned = Seq(
    "ArrayAggregate" -> "interpreted aggregate() lambda",
    "ZipWith" -> "interpreted zip_with() lambda",
    "ArrayTransform" -> "interpreted transform() lambda",
    "ArrayFilter" -> "interpreted filter() lambda",
    "UDF(" -> "Scala UDF",
    "CartesianProduct" -> "non-broadcast cartesian product")

  test("no headline query plans an interpreted lambda, UDF, or cartesian product") {
    val all = SparkEntry.queries
    val issues = Bench.headline.filter(all.contains).flatMap { name =>
      val plan =
        try all(name)(spark, sf).queryExecution.optimizedPlan.toString
        catch { case e: Throwable => s"<failed to plan: ${e.getMessage}>" }
      banned.collect {
        case (marker, why) if plan.contains(marker) => s"$name: $why ($marker)"
      }
    }
    assert(issues.isEmpty, issues.mkString("\n"))
  }

  test("no headline query plans a KEYLESS window (single-partition funnel)") {
    // Ordinals used to push its dictionary-sized offsets cumsum through
    // one deliberate keyless window; the thousands of benign WindowExec
    // warnings it emitted drowned the signal. Now that the cumsum rides
    // RunningTotal, ANY keyless window in a headline plan is a
    // regression — this pin keeps the count at zero.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val all = SparkEntry.queries
    val offenders = Bench.headline.filter(all.contains).flatMap { name =>
      val keyless =
        try all(name)(spark, sf).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.size
        catch { case _: Throwable => 0 }
      if (keyless > 0) Some(s"$name: $keyless keyless window(s)") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
