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

  test("isotonicFit: pools violators exactly, preserves monotone input") {
    import spark.implicits._
    // bucket rates (0.5, 0.2, 0.8): PAV pools 1+2 to 2/7, leaves 3
    val df = (Seq.fill(1)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(1)((2, 1)) ++ Seq.fill(4)((2, 0)) ++
      Seq.fill(4)((3, 1)) ++ Seq.fill(1)((3, 0))).toDF("b", "y")
    val out = Calibration.isotonicFit(df, "b", col("y") === 1)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) == ((2L, 1L, 0.285714)), out.toString) // 2/7
    assert(out(2) == ((5L, 1L, 0.285714)))
    assert(out(3) == ((5L, 4L, 0.8)))

    // already-monotone input is returned unchanged
    val mono = (Seq.fill(9)((1, 0)) ++ Seq.fill(1)((1, 1)) ++
      Seq.fill(5)((2, 0)) ++ Seq.fill(5)((2, 1)) ++
      Seq.fill(1)((3, 0)) ++ Seq.fill(9)((3, 1))).toDF("b", "y")
    val fit = Calibration.isotonicFit(mono, "b", col("y") === 1)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(fit == Map(1 -> 0.1, 2 -> 0.5, 3 -> 0.9))
  }

  test("isotonicFit: cascade pooling, monotone output, mass preserved") {
    import spark.implicits._
    // strictly DECREASING rates force a full cascade into one block
    val df = (Seq.fill(9)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(5)((2, 1)) ++ Seq.fill(5)((2, 0)) ++
      Seq.fill(1)((3, 1)) ++ Seq.fill(9)((3, 0))).toDF("b", "y")
    val rows = Calibration.isotonicFit(df, "b", col("y") === 1).collect()
    assert(rows.forall(_.getDouble(3) == 0.5), rows.mkString(","))
    // weighted fitted mass equals the positive count (PAV invariant)
    val mass = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(mass - 15.0) < 1e-6)
    // output is monotone under any random rates
    val rng = new scala.util.Random(3)
    val noisy = (1 to 2000).map { _ =>
      val b = rng.nextInt(15) + 1
      (b, if (rng.nextDouble() < (15 - b) / 20.0) 1 else 0)
    }.toDF("b", "y")
    val fs = Calibration.isotonicFit(noisy, "b", col("y") === 1)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(3))
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b })
  }

  test("reliability: hand-computed bins, Brier terms, edge clamping") {
    import spark.implicits._
    // 4 rows at p=0.1 (1 pos), 4 at p=0.9 (3 pos); N=8, base=0.5
    val df = (Seq.fill(1)((0.1, 1)) ++ Seq.fill(3)((0.1, 0)) ++
      Seq.fill(3)((0.9, 1)) ++ Seq.fill(1)((0.9, 0))).toDF("p", "y")
    val out = Calibration.reliability(df, "p", col("y") === 1)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set(2, 10)) // floor(.1*10)+1=2, floor(.9*10)+1=10
    assert(out(2) == ((4L, 0.1, 0.25, 0.01125, 0.03125)), out(2).toString)
    assert(out(10) == ((4L, 0.9, 0.75, 0.01125, 0.03125)))

    // p = 0 lands in bin 1; p = 1.0 clamps into the top bin
    val edges = Seq((0.0, 0), (1.0, 1)).toDF("p", "y")
    val bins = Calibration.reliability(edges, "p", col("y") === 1, bins = 10)
      .collect().map(_.getInt(0)).sorted
    assert(bins.sameElements(Array(1, 10)))
  }

  test("calibrationError: hand ECE/MCE on the reliability fixture") {
    import spark.implicits._
    // bins 2 and 10 both have |avg - frac| = 0.15: ECE = 0.15, MCE = 0.15
    val df = (Seq.fill(1)((0.1, 1)) ++ Seq.fill(3)((0.1, 0)) ++
      Seq.fill(3)((0.9, 1)) ++ Seq.fill(1)((0.9, 0))).toDF("p", "y")
    val Array(r) = Calibration.calibrationError(df, "p", col("y") === 1)
      .collect()
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == 0.15, "ece")
    assert(r.getDouble(2) == 0.15, "mce")
    // perfectly calibrated: frac == avg in every bin -> both 0
    val perfect = (Seq.fill(1)((0.25, 1)) ++ Seq.fill(3)((0.25, 0)) ++
      Seq.fill(3)((0.75, 1)) ++ Seq.fill(1)((0.75, 0))).toDF("p", "y")
    val Array(r2) = Calibration.calibrationError(perfect, "p",
      col("y") === 1).collect()
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(2) == 0.0)
  }

  test("reliability is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 400).map(i => ((i % 97) / 100.0, i % 3 == 0))
      .toDF("p", "y")
    val a = Calibration.reliability(df, "p", col("y")).collect().toSet
    val b = Calibration.reliability(df.repartition(13), "p", col("y"))
      .collect().toSet
    assert(a == b)
  }

  test("brierDecomposition: identity holds and perfect forecasts score 0") {
    import spark.implicits._
    // forecasts at bin centers: p in {0.05, 0.95}, labels match rates
    val df = (Seq.fill(8)((0.05, 0)) ++ Seq.fill(2)((0.05, 1)) ++
      Seq.fill(1)((0.95, 0)) ++ Seq.fill(9)((0.95, 1)))
      .toDF("p", "y")
    val Array(r) = Calibration.brierDecomposition(df, "p",
      col("y") === 1).collect()
    val (brier, rel, res, unc, wb) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // within-bin variance is 0: every p sits exactly at one value per bin
    assert(math.abs(wb) < 1e-6, r.toString)
    assert(math.abs(brier - ((rel - res) + unc)) < 2e-6, r.toString)
    // hand: brier = (8*0.0025 + 2*0.9025 + 1*0.9025 + 9*0.0025) / 20
    //   = (0.02 + 1.805 + 0.9025 + 0.0225) / 20 = 0.1375
    assert(math.abs(brier - 0.1375) < 1e-6, brier.toString)
    // perfectly sharp + calibrated: p = y exactly -> brier 0, res = unc
    val perfect = (Seq.fill(5)((0.0, 0)) ++ Seq.fill(5)((1.0, 1)))
      .toDF("p", "y")
    val Array(q) = Calibration.brierDecomposition(perfect, "p",
      col("y") === 1).collect()
    assert(q.getDouble(1) == 0.0 && math.abs(q.getDouble(3) -
      q.getDouble(4)) < 1e-6, q.toString)
  }
}
