package graft.pipeline

import graft.ops._

/** Name → operator-constructor registry: the engine-level analogue of the
  * reference's per-window method maps (`dataset_processing_check_nan.py:321-330`,
  * `data_balancing_list_method_ui.py:71-82`, `hashing_methods_ui.py:412-433`)
  * — one dispatch table instead of N UI tables. Constructors take the
  * target column (and use op defaults otherwise); richer configuration
  * uses the case classes directly.
  */
object OpRegistry {

  val imputers: Map[String, String => TableOp] = Map(
    "mean" -> (c => Imputation.FillMean(c)),
    "median" -> (c => Imputation.FillMedian(c)),
    "mode" -> (c => Imputation.FillMode(c)),
    "interpolate" -> (c => Imputation.Interpolate(c, orderCols = Seq(c))),
    "em" -> (c => Imputation.EmImpute(c)),
    "knn" -> (c => NnImpute.KnnImpute(c)),
    "hotdeck" -> (c => NnImpute.HotDeckImpute(c)),
    "model" -> (c => NnImpute.ModelImpute(c)))

  val encoders: Map[String, String => TableOp] = Map(
    "onehot" -> (c => Encoding.OneHot(c)),
    "label" -> (c => Encoding.LabelEncode(c)),
    "frequency" -> (c => Encoding.FrequencyEncode(c)),
    "binary" -> (c => Encoding.BinaryEncode(c)),
    "date" -> (c => Encoding.DateExpand(c)))

  val hashers: Map[String, (String, Int) => TableOp] = Map(
    "simple" -> ((c, n) => Hashing.SimpleHash(c, n)),
    "feature" -> ((c, n) => Hashing.FeatureHash(c, n)),
    "onehot_hash" -> ((c, n) => Hashing.OneHotHash(c, n)),
    "embedding" -> ((c, n) => Hashing.EmbeddingHash(c, n)),
    "universal" -> ((c, n) => Hashing.UniversalHash(c, n)))

  val balancers: Map[String, String => TableOp] = Map(
    "smote" -> (t => Smote.SmoteOp(t)),
    "undersample" -> (t => Balancing.Undersample(t)),
    "oversample" -> (t => Balancing.Oversample(t)),
    "cluster_centroids" -> (t => Balancing.ClusterCentroids(t, Nil)),
    "nearmiss" -> (t => Smote.NearMissOp(t)),
    "adasyn" -> (t => Smote.AdasynOp(t)),
    "borderline_smote" -> (t => Smote.BorderlineSmoteOp(t)),
    "smote_tomek" -> (t => Smote.SmoteTomekOp(t)),
    "smote_enn" -> (t => Smote.SmoteEnnOp(t)),
    "bagging" -> (t => Smote.BaggingPassthroughOp(t)))
}
