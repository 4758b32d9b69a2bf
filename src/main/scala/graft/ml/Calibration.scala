package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Score calibration (Platt 1999): fit `sigmoid(a*score + b)` to a binary
  * label by Newton/IRLS — the standard recipe for turning a cheap,
  * uncalibrated quality signal into a probability (here: calibrating the
  * rule-based quality score against the expensive Gopher panel, so a
  * threshold can be chosen as "keep docs with >= p% chance of passing").
  *
  * Scale: each Newton step is ONE distributed aggregate of the five
  * sufficient statistics (weighted 2x2 Hessian + gradient); the solve is
  * two doubles of driver arithmetic — the I7/I8 EM/MICE pattern: loop on
  * the driver, data passes distributed, O(1) driver state.
  *
  * Determinism: iteration-1 weights are exactly 0.25 (sigmoid(0) is
  * exact); later iterations carry the usual float-sum order tolerance
  * (~1e-12), absorbed by the callers' 6-decimal rounding — the same
  * contract the t13 LM scores ship under.
  */
object Calibration {

  /** `iterations` Newton steps from (a,b) = (0,0). Labels must be 0/1
    * (numeric or boolean-castable); scores finite doubles. */
  def plattFit(df: DataFrame, scoreCol: String, labelCol: String,
               iterations: Int = 3): (Double, Double) = {
    require(iterations >= 1)
    var a = 0.0
    var b = 0.0
    for (_ <- 1 to iterations) {
      val s = col(scoreCol).cast(DoubleType)
      val y = col(labelCol).cast(DoubleType)
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) * s + lit(b))))
      val w = p * (lit(1.0) - p)
      val r = df.agg(
        sum(w * s * s).as("h11"), sum(w * s).as("h12"), sum(w).as("h22"),
        sum((p - y) * s).as("g1"), sum(p - y).as("g2")).head()
      val (h11, h12, h22) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val (g1, g2) = (r.getDouble(3), r.getDouble(4))
      val det = h11 * h22 - h12 * h12
      a = a - (h22 * g1 - h12 * g2) / det
      b = b - (h11 * g2 - h12 * g1) / det
    }
    (a, b)
  }

  /** The fitted calibrator as a map-only column. */
  def plattApply(score: Column, ab: (Double, Double)): Column =
    lit(1.0) / (lit(1.0) + exp(-(lit(ab._1) * score + lit(ab._2))))
}
