package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.regression._
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Model zoo + the standardize-fit pipeline (SURVEY §2.7 M1/M2):
  * VectorAssembler(numeric features) -> StandardScaler -> estimator —
  * the reference's `StandardScaler.fit_transform` + sklearn fit
  * (`model_evaluation_logic.py:31-38,172-248`) as ONE MLlib Pipeline, so
  * scaling params travel with the model and inference can't skew.
  */
object Models {

  sealed trait Task
  case object Classification extends Task
  case object Regression extends Task

  /** Hyperparameters as a loose map (reference passes **kwargs);
    * unknown keys are ignored by each builder. */
  type Params = Map[String, Any]

  private def num(p: Params, k: String, d: Double): Double =
    p.get(k).map(_.toString.toDouble).getOrElse(d)
  private def int(p: Params, k: String, d: Int): Int =
    p.get(k).map(_.toString.toDouble.toInt).getOrElse(d)

  /** Estimator factory. Names mirror the reference zoo:
    * rf / gb / logreg (classification), rf / gb / linear (regression). */
  def estimator(name: String, task: Task, params: Params = Map.empty,
                seed: Long = 42L): PipelineStage = (name, task) match {
    case ("rf", Classification) =>
      new RandomForestClassifier().setSeed(seed)
        .setNumTrees(int(params, "n_estimators", 100))
        .setMaxDepth(int(params, "max_depth", 5))
        .setFeaturesCol("features").setLabelCol("label")
    case ("rf", Regression) =>
      new RandomForestRegressor().setSeed(seed)
        .setNumTrees(int(params, "n_estimators", 100))
        .setMaxDepth(int(params, "max_depth", 5))
        .setFeaturesCol("features").setLabelCol("label")
    case ("gb", Classification) =>
      new GBTClassifier().setSeed(seed)
        .setMaxIter(int(params, "n_estimators", 50))
        .setMaxDepth(int(params, "max_depth", 3))
        .setStepSize(num(params, "learning_rate", 0.1))
        .setFeaturesCol("features").setLabelCol("label")
    case ("gb", Regression) =>
      new GBTRegressor().setSeed(seed)
        .setMaxIter(int(params, "n_estimators", 50))
        .setMaxDepth(int(params, "max_depth", 3))
        .setStepSize(num(params, "learning_rate", 0.1))
        .setFeaturesCol("features").setLabelCol("label")
    case ("logreg", Classification) =>
      // penalty l1/l2/elasticnet -> elasticNetParam; C -> 1/regParam
      val penalty = params.getOrElse("penalty", "l2").toString
      val enet = penalty match {
        case "l1" => 1.0
        case "elasticnet" => num(params, "l1_ratio", 0.5)
        case _ => 0.0
      }
      new LogisticRegression()
        .setRegParam(1.0 / math.max(num(params, "C", 1.0), 1e-9))
        .setElasticNetParam(enet)
        .setFeaturesCol("features").setLabelCol("label")
    case ("linear", Regression) =>
      new LinearRegression()
        .setFeaturesCol("features").setLabelCol("label")
    case other => throw new IllegalArgumentException(s"unknown model $other for $task")
  }

  /** Numeric feature columns of df, excluding the label. */
  def numericFeatures(df: DataFrame, labelCol: String): Seq[String] =
    df.schema.fields.collect {
      case f if f.name != labelCol && f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** Label preparation OUTSIDE the persisted pipeline (so a saved model
    * transforms label-free inference rows): "label" = double cast, or
    * alphabetical codes for string classification labels (sklearn
    * LabelEncoder parity — same dictionary as Encoding.labelDictionary).
    *
    * `dictFrom` is the frame the code dictionary is built from — pass the
    * TRAINING frame when labeling an eval/test frame, or codes can shift
    * when a fold is missing an alphabetically-early class (sklearn
    * LabelEncoder fit on train has exactly this contract; unseen test
    * labels are dropped like sklearn errors on them). */
  def withLabel(df: DataFrame, labelCol: String, task: Task,
                dictFrom: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    if (task == Classification && !df.schema(labelCol).dataType.isInstanceOf[NumericType]) {
      val dict = graft.ops.Encoding.labelDictionary(dictFrom.getOrElse(df), labelCol)
      df.join(broadcast(dict), Seq(labelCol), "inner")
        .withColumn("label", col("__code").cast("double")).drop("__code")
    } else df.withColumn("label", col(labelCol).cast("double"))
  }

  /** Feature pipeline: assemble -> scale -> estimator. Label-free at
    * transform time; `handleInvalid=skip` mirrors the reference's
    * drop-NaN-before-fit. */
  def pipeline(df: DataFrame, labelCol: String, model: String, task: Task,
               params: Params = Map.empty, seed: Long = 42L): Pipeline = {
    val feats = numericFeatures(df, labelCol)
    require(feats.nonEmpty, "no numeric feature columns")
    val stages = scala.collection.mutable.ArrayBuffer.empty[PipelineStage]
    stages += new VectorAssembler().setInputCols(feats.toArray)
      .setOutputCol("rawFeatures").setHandleInvalid("skip")
    stages += new StandardScaler().setInputCol("rawFeatures").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    stages += estimator(model, task, params, seed)
    new Pipeline().setStages(stages.toArray)
  }

  def fit(df: DataFrame, labelCol: String, model: String, task: Task,
          params: Params = Map.empty, seed: Long = 42L): PipelineModel =
    pipeline(df, labelCol, model, task, params, seed).fit(withLabel(df, labelCol, task))

  /** Transform with the label attached — what every evaluation path uses.
    * `train` (when available) anchors the label dictionary so test-side
    * codes match the space the model was fitted in. */
  def transformLabeled(model: PipelineModel, df: DataFrame, labelCol: String,
                       task: Task, train: Option[DataFrame] = None): DataFrame =
    model.transform(withLabel(df, labelCol, task, dictFrom = train))
}
