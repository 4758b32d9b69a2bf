package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CalibrationSpec extends SparkSpec {

  // non-separable fixture: labels mostly follow the score with overlap
  // in the middle, so the MLE is finite
  private lazy val fixture = {
    import spark.implicits._
    (-20 to 20).map { i =>
      val y = if (i > 0) { if (Set(1, 2, 3)(i)) 0.0 else 1.0 }
              else { if (Set(-1, -2)(i)) 1.0 else 0.0 }
      (i / 10.0, y)
    }.toDF("s", "y")
  }

  test("plattFit converges: gradient vanishes, slope positive, deterministic") {
    val (a, b) = Calibration.plattFit(fixture, "s", "y", iterations = 8)
    assert(a > 0, s"positively-correlated labels need a > 0, got $a")
    // at the optimum both gradient components are ~0
    val p = Calibration.plattApply(col("s"), (a, b))
    val g = fixture.agg(
      sum((p - col("y")) * col("s")), sum(p - col("y"))).head()
    assert(math.abs(g.getDouble(0)) < 1e-8 && math.abs(g.getDouble(1)) < 1e-8,
      s"gradient not vanished: $g")
    val again = Calibration.plattFit(fixture, "s", "y", iterations = 8)
    assert((a, b) == again, "driver loop must be deterministic")
  }

  test("plattApply is monotone and bounded") {
    import spark.implicits._
    val ab = Calibration.plattFit(fixture, "s", "y", iterations = 8)
    val ps = Seq(-5.0, -1.0, 0.0, 1.0, 5.0).toDF("s")
      .select(Calibration.plattApply(col("s"), ab)).collect().map(_.getDouble(0))
    assert(ps.sameElements(ps.sorted), "calibrated probs must be monotone")
    assert(ps.forall(p => p > 0 && p < 1))
  }
}
