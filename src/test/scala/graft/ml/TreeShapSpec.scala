package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ml.TreeShap.ShapTree

/** Tree SHAP verification: the polynomial Algorithm 2 implementation is
  * cross-checked against a BRUTE-FORCE Shapley computation (subset
  * enumeration over the tree's used features with the path-dependent
  * conditional expectation) — an independent oracle for the subtle
  * EXTEND/UNWIND bookkeeping — plus completeness against real MLlib
  * model predictions and a no-shuffle plan pin for shapFrame. */
class TreeShapSpec extends SparkSpec {

  /** Path-dependent conditional expectation E[f(x) | x_S]: splits on
    * features in S follow x; others average children by cover. */
  private def expTree(t: ShapTree, x: Array[Double], s: Set[Int], j: Int = 0): Double =
    if (t.isLeaf(j)) t.value(j)
    else if (s.contains(t.feature(j)))
      expTree(t, x, s, if (x(t.feature(j)) <= t.threshold(j)) t.left(j) else t.right(j))
    else (t.cover(t.left(j)) * expTree(t, x, s, t.left(j)) +
          t.cover(t.right(j)) * expTree(t, x, s, t.right(j))) / t.cover(j)

  /** Exact Shapley by subset enumeration over the tree's used features
    * (unused features are null players — their presence can't change
    * any coalition value, so restricting to used features is exact). */
  private def bruteShap(t: ShapTree, x: Array[Double], nF: Int): Array[Double] = {
    val used = t.feature.filter(_ >= 0).distinct
    val phi = new Array[Double](nF)
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    for (i <- used) {
      val others = used.filterNot(_ == i)
      for (mask <- 0 until (1 << others.length)) {
        val sub = others.zipWithIndex.collect {
          case (f, b) if (mask & (1 << b)) != 0 => f
        }.toSet
        val w = fact(sub.size) * fact(used.length - sub.size - 1) / fact(used.length)
        phi(i) += w * (expTree(t, x, sub + i) - expTree(t, x, sub))
      }
    }
    phi
  }

  /** The m22 fixture: depth-2 tree on (f0, f1) with hand-set covers. */
  private def handTree: ShapTree = ShapTree(
    feature = Array(1, 0, -1, -1, -1),
    threshold = Array(250000.0, 750.0, Double.NaN, Double.NaN, Double.NaN),
    left = Array(1, 2, -1, -1, -1),
    right = Array(4, 3, -1, -1, -1),
    value = Array(0.0, 0.0, 10.0, 20.0, 40.0),
    cover = Array(100.0, 80.0, 30.0, 50.0, 20.0))

  test("treeShap matches hand-computed closed form on the depth-2 tree") {
    val t = handTree
    // x in region LL: price <= 250000, cust <= 750
    val x = Array(100.0, 1000.0)
    val e0 = (30 * 10.0 + 50 * 20.0 + 20 * 40.0) / 100 // 21.0
    val ef1 = (30 * 10.0 + 50 * 20.0) / 80             // hot branch by price
    val ef0 = (80 * 10.0 + 20 * 40.0) / 100            // cust known -> leaf 10 under L
    val ef01 = 10.0
    val phi0 = 0.5 * ((ef0 - e0) + (ef01 - ef1))
    val phi1 = 0.5 * ((ef1 - e0) + (ef01 - ef0))
    val got = TreeShap.treeShap(t, x, 2)
    assert(math.abs(got(0) - phi0) < 1e-12, s"phi0 ${got(0)} vs $phi0")
    assert(math.abs(got(1) - phi1) < 1e-12, s"phi1 ${got(1)} vs $phi1")
    // completeness: sum phi = f(x) - E[f]
    assert(math.abs(got.sum - (t.predict(x) - t.expectedValue)) < 1e-12)
  }

  test("treeShap == brute-force Shapley on 30 random trees x 20 rows each") {
    val rng = new scala.util.Random(42)
    val nF = 5
    // random binary tree: each node becomes a leaf with rising probability
    def gen(depthLeft: Int): (Array[Int], Array[Double], Array[Int], Array[Int], Array[Double]) = {
      val f = scala.collection.mutable.ArrayBuffer[Int]()
      val th = scala.collection.mutable.ArrayBuffer[Double]()
      val l = scala.collection.mutable.ArrayBuffer[Int]()
      val r = scala.collection.mutable.ArrayBuffer[Int]()
      val v = scala.collection.mutable.ArrayBuffer[Double]()
      def add(d: Int): Int = {
        val id = f.length
        if (d == 0 || rng.nextDouble() < 0.3) {
          f += -1; th += Double.NaN; l += -1; r += -1; v += rng.nextDouble() * 10
        } else {
          f += rng.nextInt(nF); th += rng.nextDouble() * 2 - 1
          l += -1; r += -1; v += 0.0
          val lc = add(d - 1); val rc = add(d - 1)
          l(id) = lc; r(id) = rc
        }
        id
      }
      add(depthLeft)
      (f.toArray, th.toArray, l.toArray, r.toArray, v.toArray)
    }
    for (_ <- 1 to 30) {
      val (f, th, l, r, v) = gen(5)
      // covers: random positive leaf counts, internal = sum of children
      val cover = new Array[Double](f.length)
      def fill(j: Int): Double = {
        cover(j) = if (f(j) < 0) (rng.nextInt(50) + 1).toDouble
                   else fill(l(j)) + fill(r(j))
        cover(j)
      }
      fill(0)
      val t = ShapTree(f, th, l, r, v, cover)
      for (_ <- 1 to 20) {
        val x = Array.fill(nF)(rng.nextDouble() * 2 - 1)
        val fast = TreeShap.treeShap(t, x, nF)
        val slow = bruteShap(t, x, nF)
        for (i <- 0 until nF)
          assert(math.abs(fast(i) - slow(i)) < 1e-10,
            s"feature $i: fast ${fast(i)} vs brute ${slow(i)}\ntree: ${t}")
        // completeness on every tree/row
        assert(math.abs(fast.sum - (t.predict(x) - t.expectedValue)) < 1e-10)
      }
    }
  }

  test("repeated feature along one path: algorithm handles re-splits (vs brute)") {
    // root f0 <= 0 -> left splits f0 <= -0.5 (same feature twice)
    val t = ShapTree(
      feature = Array(0, 0, -1, -1, -1),
      threshold = Array(0.0, -0.5, Double.NaN, Double.NaN, Double.NaN),
      left = Array(1, 2, -1, -1, -1),
      right = Array(4, 3, -1, -1, -1),
      value = Array(0.0, 0.0, 1.0, 2.0, 5.0),
      cover = Array(10.0, 6.0, 2.0, 4.0, 4.0))
    for (xv <- Seq(-1.0, -0.3, 0.5)) {
      val fast = TreeShap.treeShap(t, Array(xv, 9.9), 2)
      val slow = bruteShap(t, Array(xv, 9.9), 2)
      assert(math.abs(fast(0) - slow(0)) < 1e-12, s"x=$xv: ${fast(0)} vs ${slow(0)}")
      assert(math.abs(fast(1)) < 1e-12 && math.abs(slow(1)) < 1e-12)
    }
  }

  test("fitted MLlib models: completeness vs real predictions (DT, RF, GBT)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (1 to 400).map { i =>
      val a = rng.nextDouble() * 10; val b = rng.nextDouble() * 10
      (i.toLong, a, b, 3.0 * a - b + (if (a > 5) 10 else 0))
    }.toDF("id", "a", "b", "y").persist()
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("a", "b")).setOutputCol("features")
    val vec = assembler.transform(df)
    val models: Seq[(String, AnyRef)] = Seq(
      "dt" -> new org.apache.spark.ml.regression.DecisionTreeRegressor()
        .setLabelCol("y").setMaxDepth(4).setSeed(1L).fit(vec),
      "rf" -> new org.apache.spark.ml.regression.RandomForestRegressor()
        .setLabelCol("y").setNumTrees(5).setMaxDepth(4).setSeed(2L).fit(vec),
      "gbt" -> new org.apache.spark.ml.regression.GBTRegressor()
        .setLabelCol("y").setMaxIter(5).setMaxDepth(3).setSeed(3L).fit(vec))
    for ((name, m) <- models) {
      val (raw, weights) = TreeShap.treesOf(m)
      val trees = raw.map(t => TreeShap.withCovers(t, df, Seq("a", "b")))
      val out = TreeShap.shapFrame(df.limit(50), Seq("a", "b"), trees, weights,
        Seq("id", "y"))
      val preds = m.asInstanceOf[org.apache.spark.ml.PredictionModel[_, _]]
        .transform(vec).select($"id", $"prediction")
      val joined = out.join(preds, "id")
        .select($"id", ($"phi_a" + $"phi_b" + $"expected_value").as("recon"),
          $"prediction")
        .collect()
      assert(joined.length == 50)
      joined.foreach { r =>
        val (recon, pred) = (r.getDouble(1), r.getDouble(2))
        assert(math.abs(recon - pred) < 1e-8,
          s"$name id=${r.getLong(0)}: sum phi + E[f] = $recon but f(x) = $pred")
      }
    }
  }

  test("shapFrame plan is map-only: no Exchange, no Window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 1.0, i * 2.0)).toDF("id", "a", "b")
    val t = handTree.copy(feature = Array(1, 0, -1, -1, -1),
      threshold = Array(50.0, 25.0, Double.NaN, Double.NaN, Double.NaN))
    val plan = TreeShap.shapFrame(df, Seq("a", "b"), Seq(t), Seq(1.0), Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"attribution must stay map-only:\n$plan")
  }

  test("withCovers counts per-node membership in one pass; null rows excluded") {
    import spark.implicits._
    val df = Seq((Some(1000.0), 100.0), (Some(1000.0), 900.0),
      (Some(300000.0), 10.0), (None, 5.0)).toDF("p", "c")
    val t = TreeShap.withCovers(handTree, df, Seq("c", "p"))
    // 3 complete rows: two go left on price (one each side of cust 750), one right
    assert(t.cover.toSeq == Seq(3.0, 2.0, 1.0, 1.0, 1.0))
  }
}
