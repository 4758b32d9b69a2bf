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
    * (must be a total order for a deterministic result). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
