package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.io.MetaTracker

/** Every engine operator is a described DataFrame→DataFrame transform —
  * the Scala analogue of the reference's method-map dispatch
  * (`dataset_processing_check_nan.py:321-330`,
  * `data_balancing_list_method_ui.py:71-82`). Ops stay lazy: applying one
  * only extends the Catalyst logical plan; provenance goes to the
  * driver-side [[MetaTracker]].
  */
trait TableOp extends Serializable {
  def describe: String
  def apply(df: DataFrame): DataFrame
}

/** Applies ops while accumulating provenance for the versioned sink. */
final case class PipelineRunner(tracker: MetaTracker) {
  def run(df: DataFrame, ops: TableOp*): DataFrame =
    ops.foldLeft(df) { (d, op) =>
      tracker.addChange(op.describe)
      op(d)
    }
}
