package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KernelShapSpec extends SparkSpec {

  /** Brute-force Shapley values of an arbitrary set game v over m players. */
  private def bruteShapley(m: Int, v: Set[Int] => Double): Seq[Double] = {
    def fact(n: Int): Double = (1 to n).map(_.toDouble).product
    (0 until m).map { i =>
      (0 until m).filterNot(_ == i).toSet.subsets().map { s =>
        fact(s.size) * fact(m - s.size - 1) / fact(m) * (v(s + i) - v(s))
      }.sum
    }
  }

  test("full-enumeration WLS combination == brute-force Shapley on an arbitrary nonlinear game") {
    val m = 4
    // arbitrary deterministic game — nothing linear or monotone about it
    def v(s: Set[Int]): Double =
      s.map(i => (i + 1) * (i + 1)).sum * 0.7 +
        (if (s.contains(0) && s.contains(2)) 13.5 else 0.0) +
        math.sin(s.sum.toDouble)
    val masks = KernelShap.allCoalitions(m)
    val comb = KernelShap.wlsCombination(masks, m)
    val v0 = v(Set.empty)
    val v1 = v((0 until m).toSet)
    val vz = masks.map(z => v((0 until m).filter(z(_)).toSet))
    val phi = (0 until m).map { i =>
      comb.coefV0(i) * v0 + comb.coefV1(i) * v1 +
        masks.indices.map(zi => comb.coefVz(i)(zi) * vz(zi)).sum
    }
    val exact = bruteShapley(m, v)
    phi.zip(exact).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    // completeness is structural: sum phi == v1 - v0
    assert(math.abs(phi.sum - (v1 - v0)) < 1e-9)
  }

  test("budgeted coalitions: complete symmetric levels, deterministic, full when budget allows") {
    val m = 6
    val full = KernelShap.budgetedCoalitions(m, 1 << 10)
    assert(full.length == (1 << m) - 2)
    val small = KernelShap.budgetedCoalitions(m, 13) // fits sizes 1 and 5 only
    assert(small.length == 12)
    assert(small.forall(z => z.count(identity) == 1 || z.count(identity) == 5))
    assert(small.map(_.toSeq) == KernelShap.budgetedCoalitions(m, 13).map(_.toSeq))
  }

  test("BUDGETED coalitions (m24b shape): proper subset of full enumeration, yet exact on a linear model") {
    import spark.implicits._
    val m = 6
    val masks = KernelShap.budgetedCoalitions(m, 50)
    // the m24b query's budget keeps levels {1,5} (12) and {2,4} (30)
    assert(masks.length == 42, masks.length)
    assert(masks.length < (1 << m) - 2, "budget must NOT reach full enumeration")
    assert(masks.forall(z => Set(1, 2, 4, 5).contains(z.count(identity))))
    val w = Seq(0.5, 1.25, 2.0, -1.5, 0.75, 3.0)
    val f = (c: Seq[org.apache.spark.sql.Column]) =>
      c.zip(w).map { case (ci, wi) => ci * lit(wi) }.reduce(_ + _) / lit(10.0)
    val rows = (1 to 8).map(i => (i.toLong, (i % 7).toDouble,
      (i % 5).toDouble, (i % 3).toDouble, (i * 2 % 9).toDouble,
      (i * 3 % 11).toDouble, (i * 5 % 13).toDouble))
    val df = rows.toDF("id", "x1", "x2", "x3", "x4", "x5", "x6")
    val feats = (1 to 6).map(i => s"x$i")
    val bg = KernelShap.panel(df, feats, "id", 4)
    val got = KernelShap.explainExpr(df, feats, f, bg, Some(masks))
    // on a LINEAR model every symmetric-complete-level estimator is
    // exact: phi_i = (w_i/10) * (x_i - mean_b(x_i)) (panel means are
    // round-9'd by panelMean, so compare at 1e-6)
    val mu = (0 until 6).map(i => bg.map(_(i)).sum / bg.size)
    got.collect().foreach { r =>
      (0 until 6).foreach { i =>
        val want = w(i) / 10.0 *
          (r.getDouble(r.fieldIndex(s"x${i + 1}")) - mu(i))
        val phi = r.getDouble(r.fieldIndex(s"phi_x${i + 1}"))
        assert(math.abs(phi - want) < 1e-6, s"feature ${i + 1}: $phi vs $want")
      }
    }
  }

  test("explainExpr on a linear model matches exact linear SHAP; completeness holds per row") {
    import spark.implicits._
    val df = Seq(
      (1L, 2.0, 10.0, 1.0), (2L, 4.0, 20.0, 0.0), (3L, 6.0, 15.0, 2.0),
      (4L, 8.0, 5.0, 1.5), (5L, 1.0, 25.0, 0.5), (6L, 3.0, 12.0, 2.5))
      .toDF("id", "x1", "x2", "x3")
    val w = Seq(2.0, -3.0, 0.5)
    val f = (c: Seq[org.apache.spark.sql.Column]) =>
      c(0) * w(0) + c(1) * w(1) + c(2) * w(2) + lit(7.0)
    val bg = KernelShap.panel(df, Seq("x1", "x2", "x3"), "id", 4)
    val got = KernelShap.explainExpr(df, Seq("x1", "x2", "x3"), f, bg)
      .select("id", "x1", "x2", "x3", "phi_x1", "phi_x2", "phi_x3",
        "expected_value").collect()
    // exact linear SHAP vs the PANEL means: phi_i = w_i (x_i - mu_i)
    val mu = (0 until 3).map(i => bg.map(_(i)).sum / bg.size)
    got.foreach { r =>
      val xs = (1 to 3).map(r.getDouble)
      val phis = (4 to 6).map(r.getDouble)
      (0 until 3).foreach { i =>
        assert(math.abs(phis(i) - w(i) * (xs(i) - mu(i))) < 1e-6,
          s"phi($i): ${phis(i)} vs ${w(i) * (xs(i) - mu(i))}")
      }
      // completeness: sum phi = f(x) - expected_value
      val fx = xs.zip(w).map { case (x, wi) => x * wi }.sum + 7.0
      assert(math.abs(phis.sum - (fx - r.getDouble(7))) < 1e-6)
    }
  }

  test("explainExpr on an interaction model == brute-force Shapley of the background game") {
    import spark.implicits._
    val df = Seq((1L, 3.0, 4.0), (2L, -2.0, 5.0), (3L, 7.0, 0.5))
      .toDF("id", "x1", "x2")
    val bg = Seq(Seq(1.0, 2.0), Seq(3.0, -1.0), Seq(0.0, 4.0), Seq(2.0, 2.0))
    val f = (c: Seq[org.apache.spark.sql.Column]) => c(0) * c(1)
    val got = KernelShap.explainExpr(df, Seq("x1", "x2"), f, bg)
      .select("id", "x1", "x2", "phi_x1", "phi_x2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // the background game: v(S) = mean_b prod(i in S ? x_i : b_i)
    def game(x: Seq[Double])(s: Set[Int]): Double =
      bg.map(b => (if (s.contains(0)) x(0) else b(0)) *
        (if (s.contains(1)) x(1) else b(1))).sum / bg.size
    Seq((1L, Seq(3.0, 4.0)), (2L, Seq(-2.0, 5.0)), (3L, Seq(7.0, 0.5))).foreach {
      case (id, x) =>
        val exact = bruteShapley(2, game(x))
        assert(math.abs(got(id)._1 - exact(0)) < 1e-6)
        assert(math.abs(got(id)._2 - exact(1)) < 1e-6)
    }
  }

  test("explainModel (black-box MLlib pipeline) agrees with the closed linear-SHAP form") {
    import spark.implicits._
    val train = (1 to 60).map { i =>
      val x1 = i * 1.0; val x2 = (i % 7) * 3.0
      (i.toLong, x1, x2, 2.5 * x1 - 1.5 * x2 + 4.0)
    }.toDF("id", "x1", "x2", "y")
    val model = Models.fit(train.drop("id"), "y", "linear", Models.Regression)
    // end-to-end the pipeline is linear in the RAW features:
    // pred = sum c_i (x_i - m_i)/s_i + b  =>  effective weight c_i / s_i
    val scaler = model.stages(1)
      .asInstanceOf[org.apache.spark.ml.feature.StandardScalerModel]
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val eff = lr.coefficients.toArray.zip(scaler.std.toArray)
      .map { case (c, s) => c / s }
    val bg = KernelShap.panel(train, Seq("x1", "x2"), "id", 8)
    val got = KernelShap.explainModel(model, train.filter(col("id") <= 5), "id",
      Seq("x1", "x2"), bg)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val mu = (0 until 2).map(i => bg.map(_(i)).sum / bg.size)
    (1L to 5L).foreach { id =>
      val x = Seq(id.toDouble, (id % 7) * 3.0)
      (0 until 2).foreach { i =>
        val expect = eff(i) * (x(i) - mu(i))
        val gotPhi = if (i == 0) got(id)._1 else got(id)._2
        assert(math.abs(gotPhi - expect) < 1e-6, s"id=$id phi($i): $gotPhi vs $expect")
      }
    }
  }
}
