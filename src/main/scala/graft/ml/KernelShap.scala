package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kernel SHAP (Lundberg & Lee 2017, the model-AGNOSTIC explainer) —
  * closes the last explainer-menu gap next to exact Tree SHAP
  * ([[TreeShap]], m22) and exact linear SHAP ([[Importance.linearShap]],
  * m20): `shap.KernelExplainer(model.predict, X_sample)` parity
  * (reference behavior:
  * researching_models/feature_importance/feature_importance_shap_logic.py:205-208).
  *
  * Math: Shapley values are the solution of a weighted least squares over
  * coalition masks z in {0,1}^M with the SHAP kernel weight
  * w(z) = (M-1) / (C(M,|z|) * |z| * (M-|z|)), the value function
  * v(z) = E_b[f(x_S, b_notS)] (masked features replaced from a background
  * sample), and the two constraints phi_0 = v(0), sum_i phi_i = v(1)-v(0).
  * Eliminating the constraints leaves an (M-1)-dim normal-equation solve
  * whose solution matrix depends ONLY on the coalition set — so
  * phi_i(x) = c0_i*v(0) + c1_i*v(full) + sum_z cz_i*v_x(z) with all
  * coefficients DRIVER-side constants ([[wlsCombination]]). The cluster
  * never solves anything: Spark's job is the per-row v_x(z) panel, which
  * is map-only (expression models) or one id-keyed aggregate (black-box
  * MLlib models). With ALL 2^M-2 coalitions enumerated the WLS solution
  * equals exact Shapley values of v (KernelShapSpec pins this against
  * brute-force enumeration); with a sampled subset it is the standard
  * Kernel SHAP approximation for large M.
  *
  * Determinism contract: every per-background model evaluation is rounded
  * to 9 decimals and summed as its exact scaled-long numerator (see
  * [[panelMean]]) — order-independent across partitions/retries and
  * replayable by the SQL oracle; the WLS coefficients are fixed doubles
  * from a pivoted Gaussian solve on the driver, shared by both engines
  * through the completeness identity.
  *
  * Scale shape: the background panel is SMALL by construction (shap's own
  * KernelExplainer docs recommend ~100 rows) and rides into executors as
  * literals (expression path) or one broadcast (model path); cost per
  * explained row is |Z| * |panel| model evals — embarrassingly parallel,
  * no shuffle in the expression path, one map-side-combined aggregate
  * keyed by the explained row's id in the model path. Nothing scales with
  * corpus size except the explained-row count itself.
  */
object KernelShap {

  /** All 2^m - 2 proper nonempty coalition masks, enumeration order =
    * binary counting (deterministic). Guarded to small m — full
    * enumeration is the exact-Shapley path for explainer-menu feature
    * counts; larger m should pass a sampling budget. */
  def allCoalitions(m: Int): Seq[Array[Boolean]] = {
    require(m >= 2 && m <= 20, s"full enumeration wants 2 <= m <= 20, got $m")
    (1 until (1 << m) - 1).map(b => Array.tabulate(m)(i => ((b >> i) & 1) == 1))
  }

  /** Deterministic budgeted coalition set for large m: complete
    * |z|-levels added in descending kernel-weight order (sizes 1 and m-1
    * first, then 2 and m-2, ...) while the whole level fits — shap's own
    * enumeration order for small budgets, with no RNG so the set (and
    * hence the attribution) is bit-reproducible. A partial level is never
    * taken: symmetric complete levels keep the estimator unbiased across
    * features. If every level fits this IS full enumeration. */
  def budgetedCoalitions(m: Int, budget: Int): Seq[Array[Boolean]] = {
    require(m >= 2, s"need >= 2 features, got $m")
    val firstLevel = if (m == 2) 2 else 2 * m
    require(budget >= firstLevel,
      s"budget must cover sizes 1 and m-1 ($firstLevel)")
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Boolean]]
    var spent = 0L
    var s = 1
    var done = false
    while (!done && s <= m - s) {
      val sizes = if (s == m - s) Seq(s) else Seq(s, m - s)
      val levelCount = sizes.map(k => choose(m, k)).sum
      if (spent + levelCount <= budget) {
        for (k <- sizes; mask <- masksOfSize(m, k)) out += mask
        spent += levelCount
        s += 1
      } else done = true
    }
    out.toSeq
  }

  private def masksOfSize(m: Int, k: Int): Seq[Array[Boolean]] =
    (0 until m).combinations(k)
      .map(c => Array.tabulate(m)(c.contains(_))).toSeq

  private def choose(n: Int, k: Int): Long = {
    var r = 1L
    for (i <- 1 to k) r = r * (n - k + i) / i
    r
  }

  /** SHAP kernel weight for a coalition of size s among m features. */
  def kernelWeight(m: Int, s: Int): Double =
    (m - 1).toDouble / (choose(m, s).toDouble * s * (m - s))

  /** phi_i = coefV0(i)*v(empty) + coefV1(i)*v(full) + sum_z coefVz(i)(z)*v(z).
    * Public (not just private[ml]) so an oracle builder can inline the
    * driver-constant coefficients as SQL literals — the coefficients
    * depend only on the coalition SET, never on data. */
  case class Combination(coefV0: Array[Double],
                         coefV1: Array[Double],
                         coefVz: Array[Array[Double]])

  /** Driver-side constrained-WLS solve (the shap-library reduction):
    * eliminate phi_m via the completeness constraint, solve the
    * (m-1)-dim normal equations by pivoted Gaussian elimination, fold
    * the constraint back. Cost: O(|Z| m^2 + m^3) on the driver — m is an
    * explainer feature count, never data-sized. */
  def wlsCombination(masks: Seq[Array[Boolean]], m: Int): Combination = {
    require(masks.nonEmpty, "no coalitions")
    require(masks.forall(z => z.length == m && z.exists(identity) && !z.forall(identity)),
      "masks must be proper nonempty subsets")
    val nz = masks.length
    val w = masks.map(z => kernelWeight(m, z.count(identity))).toArray
    // X[z][i] = z_i - z_last for i < m-1; y(z) = v(z) - (1-z_last)v0 - z_last*v1
    val x = Array.tabulate(nz, m - 1) { (zi, i) =>
      (if (masks(zi)(i)) 1.0 else 0.0) - (if (masks(zi)(m - 1)) 1.0 else 0.0)
    }
    val g = Array.tabulate(m - 1, m - 1) { (a, b) =>
      (0 until nz).map(zi => w(zi) * x(zi)(a) * x(zi)(b)).sum
    }
    val ginv = invert(g)
    // H = G^-1 X' W : (m-1) x nz
    val h = Array.tabulate(m - 1, nz) { (i, zi) =>
      (0 until m - 1).map(a => ginv(i)(a) * x(zi)(a)).sum * w(zi)
    }
    val coefVz = Array.ofDim[Double](m, nz)
    val coefV0 = Array.ofDim[Double](m)
    val coefV1 = Array.ofDim[Double](m)
    for (i <- 0 until m - 1) {
      for (zi <- 0 until nz) {
        coefVz(i)(zi) = h(i)(zi)
        val zLast = if (masks(zi)(m - 1)) 1.0 else 0.0
        coefV0(i) -= h(i)(zi) * (1.0 - zLast)
        coefV1(i) -= h(i)(zi) * zLast
      }
    }
    // phi_last = (v1 - v0) - sum_{i<m-1} phi_i
    coefV0(m - 1) = -1.0 - (0 until m - 1).map(coefV0(_)).sum
    coefV1(m - 1) = 1.0 - (0 until m - 1).map(coefV1(_)).sum
    for (zi <- 0 until nz)
      coefVz(m - 1)(zi) = -(0 until m - 1).map(coefVz(_)(zi)).sum
    Combination(coefV0, coefV1, coefVz)
  }

  /** Pivoted Gauss-Jordan inverse of a small SPD-ish matrix. */
  private def invert(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val m = Array.tabulate(n, 2 * n)((i, j) =>
      if (j < n) a(i)(j) else if (j - n == i) 1.0 else 0.0)
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(m(r)(c)))
      require(math.abs(m(p)(c)) > 1e-12, "singular WLS system — degenerate coalition set")
      val t = m(c); m(c) = m(p); m(p) = t
      val pv = m(c)(c)
      for (j <- 0 until 2 * n) m(c)(j) /= pv
      for (r <- 0 until n if r != c) {
        val f = m(r)(c)
        if (f != 0.0) for (j <- 0 until 2 * n) m(r)(j) -= f * m(c)(j)
      }
    }
    Array.tabulate(n, n)((i, j) => m(i)(j + n))
  }

  /** Order-independent panel mean of `evals`: each evaluation rounded to
    * 9 decimals and converted to its EXACT scaled-long numerator
    * (round(d*1e9) — d*1e9 sits within 0.22 of the integer n for
    * |eval| < 2e6, so the final round recovers n exactly in any engine),
    * then summed as longs — exact integer arithmetic with no
    * decimal-precision growth (a decimal(38,9) fold trims scale on every
    * add and drifts ~1e-7 over 20 terms), order-independent, and
    * replayable by the SQL oracle. Contract: |f| < 2e6 per evaluation
    * and panel size <= ~1000 keep everything inside long/double
    * exactness. */
  private def panelMean(evals: Seq[Column]): Column =
    evals.map(e => round(round(e, 9) * lit(1.0e9), 0).cast("long"))
      .reduce(_ + _).cast("double") / lit(1.0e9) / lit(evals.size.toDouble)

  /** Expression-model Kernel SHAP — `f` builds the model's prediction
    * Column from per-feature input Columns (any expression-representable
    * model: linear, tree CASE, interaction, a scored formula). The
    * background panel is a driver-side Seq of feature vectors (collect it
    * deterministically — see [[panel]]); coalitions default to full
    * enumeration (exact Shapley). Appends `phi_<feature>` columns plus
    * `expected_value` (= v(empty)); the whole thing is ONE map-only
    * projection — |Z|*|panel| inlined f-evaluations per row, zero
    * shuffles, whole-stage codegen. */
  def explainExpr(df: DataFrame, features: Seq[String],
                  f: Seq[Column] => Column,
                  background: Seq[Seq[Double]],
                  masks: Option[Seq[Array[Boolean]]] = None): DataFrame = {
    val m = features.length
    require(background.nonEmpty && background.forall(_.length == m),
      "background rows must match the feature count")
    val zs = masks.getOrElse(allCoalitions(m))
    val comb = wlsCombination(zs, m)
    val v0 = panelMean(background.map(b => f(b.map(lit(_)))))
    val v1 = f(features.map(col))
    val vz = zs.map { z =>
      panelMean(background.map(b =>
        f(features.indices.map(i => if (z(i)) col(features(i)) else lit(b(i))))))
    }
    val phis = features.indices.map { i =>
      val base = lit(comb.coefV0(i)) * v0 + lit(comb.coefV1(i)) * v1
      zs.indices.foldLeft(base)((acc, zi) =>
        acc + lit(comb.coefVz(i)(zi)) * vz(zi)).as(s"phi_${features(i)}")
    }
    df.select(df.columns.map(col) ++ phis :+ v0.as("expected_value"): _*)
  }

  /** Deterministic background panel: the first `k` rows by `orderCol` —
    * the seedless analogue of shap's X_sample (a panel chosen by a stable
    * key is replayable; a random one is not). */
  def panel(df: DataFrame, features: Seq[String], orderCol: String,
            k: Int): Seq[Seq[Double]] =
    df.select(col(orderCol) +: features.map(f => col(f).cast("double")): _*)
      .na.drop(features) // a null feature cannot be a background value
      .orderBy(col(orderCol)).limit(k)
      .collect().map(r => features.indices.map(i => r.getDouble(i + 1)).toSeq)
      .toSeq

  /** Black-box Kernel SHAP over a fitted MLlib pipeline — the true
    * KernelExplainer shape: the model is opaque, evaluated only through
    * `transform`. Builds ONE expanded frame (explained rows x (|Z| panel
    * variants + the unmasked row)) via a literal-array explode (map-only),
    * scores it with a single `model.transform` (distributed, codegen),
    * then reassembles v_x(z) with one aggregate keyed by the explained
    * row's id — the only shuffle, map-side combined. The per-(row,
    * coalition) means use the same round-9 DECIMAL sums as
    * [[explainExpr]], so both paths agree bit-for-bit on the same model
    * (KernelShapSpec pins this).
    *
    * `model` must map a frame with `features` columns to a `prediction`
    * column ([[Models.fitPipeline]] output does; it standardizes inside).
    */
  def explainModel(model: PipelineModel, df: DataFrame, idCol: String,
                   features: Seq[String],
                   background: Seq[Seq[Double]],
                   masks: Option[Seq[Array[Boolean]]] = None): DataFrame = {
    val m = features.length
    require(background.nonEmpty && background.forall(_.length == m),
      "background rows must match the feature count")
    val zs = masks.getOrElse(allCoalitions(m))
    val comb = wlsCombination(zs, m)
    // variant structs: cid = -1 is the unmasked row; cid = zi masks with
    // background row b (bid distinguishes panel members for the mean)
    val variants: Seq[Column] =
      struct(lit(-1).as("__cid"), lit(-1).as("__bid"),
        struct(features.map(col): _*).as("__fv")) +:
      (for (zi <- zs.indices; (b, bi) <- background.zipWithIndex) yield {
        val fv = struct(features.indices.map(i =>
          (if (zs(zi)(i)) col(features(i)) else lit(b(i))).as(features(i))): _*)
        struct(lit(zi).as("__cid"), lit(bi).as("__bid"), fv.as("__fv"))
      })
    val expandedCols = Seq(col(idCol)) ++
      Seq("__cid", "__bid").map(c => col(s"__v.$c")) ++
      features.map(f => col(s"__v.__fv.$f"))
    val expanded = df.select(col(idCol), explode(array(variants: _*)).as("__v"))
      .select(expandedCols: _*)
    val scored = model.transform(expanded)
      .select(col(idCol), col("__cid"), col("prediction"))
    // one id-keyed aggregate: v1 from cid = -1, v(z) = round-9 scaled-long
    // mean (panelMean's exact-numerator recipe, aggregate form)
    def dmean(c: Column): Column =
      sum(round(round(c, 9) * lit(1.0e9), 0).cast("long"))
        .cast("double") / lit(1.0e9) / lit(background.size.toDouble)
    val vAgg = scored.groupBy(col(idCol)).agg(
      first(when(col("__cid") === -1, col("prediction")), ignoreNulls = true)
        .as("__v1"),
      zs.indices.map(zi =>
        dmean(when(col("__cid") === zi, col("prediction"))).as(s"__vz$zi")): _*)
    // v0 is row-independent: score the panel once (tiny local frame)
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val panelDf = spark.createDataFrame(
      background.map(b => org.apache.spark.sql.Row.fromSeq(b)).asJava,
      org.apache.spark.sql.types.StructType(features.map(f =>
        org.apache.spark.sql.types.StructField(f,
          org.apache.spark.sql.types.DoubleType))))
    val v0 = model.transform(panelDf).agg(dmean(col("prediction")).as("__v0"))
    val phis = features.indices.map { i =>
      val base = lit(comb.coefV0(i)) * col("__v0") +
        lit(comb.coefV1(i)) * col("__v1")
      zs.indices.foldLeft(base)((acc, zi) =>
        acc + lit(comb.coefVz(i)(zi)) * col(s"__vz$zi"))
        .as(s"phi_${features(i)}")
    }
    vAgg.crossJoin(broadcast(v0))
      .select(col(idCol) +: phis :+ col("__v0").as("expected_value"): _*)
  }
}
