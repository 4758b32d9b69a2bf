package graft.ml

import org.apache.spark.ml.regression.{DecisionTreeRegressionModel, GBTRegressionModel, RandomForestRegressionModel}
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** EXACT Tree SHAP (Lundberg, Erion & Lee 2018, "Consistent
  * Individualized Feature Attribution for Tree Ensembles", Algorithm 2
  * — the path-dependent explainer): per-row Shapley values phi_i with
  * the conditional expectation E[f(x) | x_S] defined by tree traversal
  * — a split on a feature in S follows x's branch, a split on a feature
  * outside S averages both branches weighted by node cover. Polynomial
  * O(T·L·D²) per row, NOT the 2^M subset sum; completeness
  * sum_i phi_i = f(x) − E[f] holds by construction.
  *
  * This closes the reference's TreeExplainer default
  * (`researching_models/feature_importance/feature_importance_shap_logic.py:136-287`)
  * for the tree-model family; `Importance.linearShap` covers the linear
  * family and permutation importance remains the model-agnostic path.
  *
  * Scale shape: the tree ensemble is DRIVER-sized state (a model, not
  * data) broadcast to executors; attribution is one map-only pass — no
  * shuffle, no collect. Covers come from [[withCovers]]: ONE aggregate
  * scan of a background frame (per-node membership is a conjunction of
  * literal threshold comparisons, so all node counts are codegen'd
  * conditional sums in a single job — the SHAP convention where the
  * background IS the training set, as in shap.TreeExplainer without a
  * data argument). */
object TreeShap {

  /** Flat tree: node 0 is the root. `feature < 0` marks a leaf (then
    * `value` is the prediction); internal nodes route `x(feature) <=
    * threshold` left (MLlib ContinuousSplit semantics). `cover` is the
    * background row count reaching the node (NaN until [[withCovers]]). */
  final case class ShapTree(feature: Array[Int], threshold: Array[Double],
                            left: Array[Int], right: Array[Int],
                            value: Array[Double], cover: Array[Double]) {
    def nNodes: Int = feature.length
    def isLeaf(j: Int): Boolean = feature(j) < 0

    /** Nodes on the longest root->leaf path (a single leaf = 1).
      * Computed once per tree, not per row. */
    lazy val depth: Int = {
      def go(j: Int): Int =
        if (isLeaf(j)) 1 else 1 + math.max(go(left(j)), go(right(j)))
      go(0)
    }

    /** Prediction by plain traversal. */
    def predict(x: Array[Double]): Double = {
      var j = 0
      while (!isLeaf(j)) j = if (x(feature(j)) <= threshold(j)) left(j) else right(j)
      value(j)
    }

    /** Cover-weighted mean prediction: E[f] under the background. */
    def expectedValue: Double = {
      def go(j: Int): Double =
        if (isLeaf(j)) value(j)
        else (cover(left(j)) * go(left(j)) + cover(right(j)) * go(right(j))) / cover(j)
      go(0)
    }
  }

  /** MLlib tree -> flat [[ShapTree]] (covers NaN — fill with
    * [[withCovers]]). Only continuous splits: categorical features reach
    * tree models here one-hot/ordinal-encoded (the E-family), so
    * CategoricalSplit never arises from this engine's own pipelines. */
  def fromMl(root: Node): ShapTree = {
    val feature = scala.collection.mutable.ArrayBuffer[Int]()
    val thresholdB = scala.collection.mutable.ArrayBuffer[Double]()
    val leftB = scala.collection.mutable.ArrayBuffer[Int]()
    val rightB = scala.collection.mutable.ArrayBuffer[Int]()
    val valueB = scala.collection.mutable.ArrayBuffer[Double]()
    def add(n: Node): Int = n match {
      case leaf: LeafNode =>
        val id = feature.length
        feature += -1; thresholdB += Double.NaN; leftB += -1; rightB += -1
        valueB += leaf.prediction
        id
      case in: InternalNode =>
        val split = in.split match {
          case c: ContinuousSplit => c
          case other => throw new IllegalArgumentException(
            s"TreeShap supports continuous splits only, got ${other.getClass.getSimpleName}")
        }
        val id = feature.length
        feature += split.featureIndex; thresholdB += split.threshold
        leftB += -1; rightB += -1; valueB += in.prediction
        val l = add(in.leftChild); val r = add(in.rightChild)
        leftB(id) = l; rightB(id) = r
        id
    }
    add(root)
    ShapTree(feature.toArray, thresholdB.toArray, leftB.toArray, rightB.toArray,
      valueB.toArray, Array.fill(feature.length)(Double.NaN))
  }

  /** The ensemble view of a fitted regression tree model: (trees,
    * weights) such that f(x) = sum_t w_t · tree_t(x). RF averages, GBT
    * weighted-sums — matching MLlib's own prediction arithmetic. */
  def treesOf(model: AnyRef): (Seq[ShapTree], Seq[Double]) = model match {
    case m: DecisionTreeRegressionModel => (Seq(fromMl(m.rootNode)), Seq(1.0))
    case m: RandomForestRegressionModel =>
      (m.trees.map(t => fromMl(t.rootNode)).toSeq,
        Seq.fill(m.getNumTrees)(1.0 / m.getNumTrees))
    case m: GBTRegressionModel =>
      (m.trees.map(t => fromMl(t.rootNode)).toSeq, m.treeWeights.toSeq)
    case other => throw new IllegalArgumentException(
      s"treesOf: unsupported model ${other.getClass.getSimpleName}")
  }

  /** Fill per-node covers from a background frame in ONE aggregate scan:
    * membership of node j is the conjunction of the literal threshold
    * comparisons on the root->j path, so every count is a codegen'd
    * sum(when(...)) in a single job — no shuffle beyond the aggregate's
    * own, no per-node passes. Rows with a null feature are excluded (a
    * null routes nowhere). */
  def withCovers(tree: ShapTree, background: DataFrame,
                 features: Seq[String]): ShapTree = {
    val conds = new Array[org.apache.spark.sql.Column](tree.nNodes)
    def fill(j: Int, c: org.apache.spark.sql.Column): Unit = {
      conds(j) = c
      if (!tree.isLeaf(j)) {
        val f = col(features(tree.feature(j))).cast(DoubleType)
        fill(tree.left(j), c && f <= lit(tree.threshold(j)))
        fill(tree.right(j), c && f > lit(tree.threshold(j)))
      }
    }
    val nonNull = features.map(f => col(f).isNotNull).reduce(_ && _)
    fill(0, nonNull)
    val row = background.select(
      (0 until tree.nNodes).map(j =>
        sum(when(conds(j), 1L).otherwise(0L)).as(s"__c$j")): _*).head()
    val covers = (0 until tree.nNodes).map(j => row.getLong(j).toDouble).toArray
    require(covers(0) > 0, "TreeShap: background frame has no complete rows")
    tree.copy(cover = covers)
  }

  // ---- Algorithm 2 (path-dependent Tree SHAP) ------------------------
  // The path m is a list of unique features met so far, each carrying
  // d (feature id), z (cold fraction), o (hot indicator 0/1), w (the
  // permutation-weight polynomial coefficient). EXTEND grows the path,
  // UNWIND removes one element undoing EXTEND exactly.

  private final class Path(capacity: Int) {
    val d = new Array[Int](capacity)
    val z = new Array[Double](capacity)
    val o = new Array[Double](capacity)
    val w = new Array[Double](capacity)
    var len = 0
    def copyFrom(p: Path): Unit = {
      System.arraycopy(p.d, 0, d, 0, p.len); System.arraycopy(p.z, 0, z, 0, p.len)
      System.arraycopy(p.o, 0, o, 0, p.len); System.arraycopy(p.w, 0, w, 0, p.len)
      len = p.len
    }
  }

  private def extend(m: Path, pz: Double, po: Double, pi: Int): Unit = {
    val l = m.len
    m.d(l) = pi; m.z(l) = pz; m.o(l) = po; m.w(l) = if (l == 0) 1.0 else 0.0
    var i = l - 1
    while (i >= 0) {
      m.w(i + 1) += po * m.w(i) * (i + 1).toDouble / (l + 1).toDouble
      m.w(i) = pz * m.w(i) * (l - i).toDouble / (l + 1).toDouble
      i -= 1
    }
    m.len = l + 1
  }

  private def unwind(m: Path, i: Int): Unit = {
    val l = m.len - 1
    var n = m.w(l)
    if (m.o(i) != 0) {
      var j = l - 1
      while (j >= 0) {
        val t = m.w(j)
        m.w(j) = n * (l + 1).toDouble / ((j + 1).toDouble * m.o(i))
        n = t - m.w(j) * m.z(i) * (l - j).toDouble / (l + 1).toDouble
        j -= 1
      }
    } else {
      var j = l - 1
      while (j >= 0) {
        m.w(j) = m.w(j) * (l + 1).toDouble / (m.z(i) * (l - j).toDouble)
        j -= 1
      }
    }
    var j = i
    while (j < l) {
      m.d(j) = m.d(j + 1); m.z(j) = m.z(j + 1); m.o(j) = m.o(j + 1)
      j += 1
    }
    m.len = l
  }

  /** Sum of UNWIND(m, i) weights without materializing the unwind —
    * the leaf-accumulation term of Algorithm 2. */
  private def unwoundSum(m: Path, i: Int): Double = {
    val l = m.len - 1
    var total = 0.0
    if (m.o(i) != 0) {
      var n = m.w(l)
      var j = l - 1
      while (j >= 0) {
        val t = n * (l + 1).toDouble / ((j + 1).toDouble * m.o(i))
        total += t
        n = m.w(j) - t * m.z(i) * (l - j).toDouble / (l + 1).toDouble
        j -= 1
      }
    } else {
      var j = l - 1
      while (j >= 0) {
        total += m.w(j) * (l + 1).toDouble / (m.z(i) * (l - j).toDouble)
        j -= 1
      }
    }
    total
  }

  /** phi for one row under one tree: length = nFeatures; unused
    * features get exactly 0. */
  def treeShap(tree: ShapTree, x: Array[Double], nFeatures: Int): Array[Double] = {
    require(!tree.cover(0).isNaN, "TreeShap: covers not set — call withCovers first")
    val phi = new Array[Double](nFeatures)
    val maxDepth = tree.depth
    def recurse(j: Int, parent: Path, pz: Double, po: Double, pi: Int): Unit = {
      val m = new Path(maxDepth + 2)
      m.copyFrom(parent)
      extend(m, pz, po, pi)
      if (tree.isLeaf(j)) {
        var i = 1
        while (i < m.len) {
          phi(m.d(i)) += unwoundSum(m, i) * (m.o(i) - m.z(i)) * tree.value(j)
          i += 1
        }
      } else {
        val f = tree.feature(j)
        val (hot, cold) =
          if (x(f) <= tree.threshold(j)) (tree.left(j), tree.right(j))
          else (tree.right(j), tree.left(j))
        var iz = 1.0; var io = 1.0
        var k = -1
        var i = 0
        while (i < m.len && k < 0) { if (m.d(i) == f) k = i; i += 1 }
        if (k >= 0) { iz = m.z(k); io = m.o(k); unwind(m, k) }
        recurse(hot, m, iz * tree.cover(hot) / tree.cover(j), io, f)
        recurse(cold, m, iz * tree.cover(cold) / tree.cover(j), 0.0, f)
      }
    }
    recurse(0, new Path(maxDepth + 2), 1.0, 1.0, -1)
    phi
  }

  /** Per-row attribution columns for an ensemble: keeps `keep`, appends
    * `phi_<feature>` per feature plus `expected_value` (the ensemble
    * base rate — constant, carried per row for completeness checks:
    * sum phi + expected_value = f(x)). One map-only pass; trees travel
    * in the task closure (driver-sized model state, the broadcast-var
    * equivalent for a compact ensemble). */
  def shapFrame(df: DataFrame, features: Seq[String],
                trees: Seq[ShapTree], weights: Seq[Double],
                keep: Seq[String]): DataFrame = {
    require(trees.nonEmpty && trees.length == weights.length,
      s"one weight per tree: ${trees.length} vs ${weights.length}")
    val nF = features.length
    val base = trees.zip(weights).map { case (t, w) => w * t.expectedValue }.sum
    val inSchema = df.select((keep ++ features).map(col): _*)
    val outSchema = StructType(
      inSchema.schema.fields.take(keep.length) ++
        features.map(f => StructField(s"phi_$f", DoubleType, nullable = false)) :+
        StructField("expected_value", DoubleType, nullable = false))
    val treesL = trees.toArray; val weightsL = weights.toArray
    val k = keep.length
    df.select((keep ++ features).map(col): _*).mapPartitions { it =>
      it.map { row =>
        val x = Array.tabulate(nF)(i => row.get(k + i) match {
          case null => Double.NaN
          case v: Number => v.doubleValue()
          case other => throw new IllegalArgumentException(
            s"TreeShap feature ${features(i)} must be numeric, got $other")
        })
        val phi = new Array[Double](nF)
        var t = 0
        while (t < treesL.length) {
          val p = treeShap(treesL(t), x, nF)
          var i = 0
          while (i < nF) { phi(i) += weightsL(t) * p(i); i += 1 }
          t += 1
        }
        Row.fromSeq(row.toSeq.take(k) ++ phi :+ base)
      }
    }(Encoders.row(outSchema))
  }
}
