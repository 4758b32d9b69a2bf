package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastText-style linear text classifier — the quality/domain scorer a
  * corpus pipeline trains on a small labeled seed and applies to 100 TB
  * (the CCNet / DCLM recipe: hashed bag-of-words + logistic regression,
  * NOT a deep model — scoring must run at scan speed). Features are the
  * hashing trick over whitespace tokens (`HashingTF`, no vocabulary
  * state to ship) with optional IDF reweighting (a fitted, dictionary-
  * sized broadcast); the model persists via MLlib's native writer next
  * to the engine's other model artifacts (S8 contract).
  *
  * Scale: train is executor-parallel on the labeled seed (seeds are
  * small by definition); score is one map-only pass — tokenize, hash,
  * dot with the broadcast coefficient vector. No shuffle anywhere in
  * the scoring path.
  */
object TextClassifier {

  /** Train on (textCol, labelCol in {0,1}) rows. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, useIdf: Boolean = true,
            seed: Long = 42L): PipelineModel = {
    val prepared = df
      .withColumn("__toks", split(trim(lower(col(textCol))), "\\s+"))
      .withColumn("label", col(labelCol).cast("double"))
    val tf = new HashingTF().setInputCol("__toks")
      .setOutputCol(if (useIdf) "__tf" else "features")
      .setNumFeatures(numFeatures)
    val stages: Array[org.apache.spark.ml.PipelineStage] =
      if (useIdf)
        Array(tf, new IDF().setInputCol("__tf").setOutputCol("features"),
          new LogisticRegression().setFeaturesCol("features").setLabelCol("label"))
      else
        Array(tf,
          new LogisticRegression().setFeaturesCol("features").setLabelCol("label"))
    new Pipeline().setStages(stages).fit(prepared)
  }

  /** Score a corpus: adds `quality_prob` (P(label=1)) — map-only. */
  def score(model: PipelineModel, df: DataFrame, textCol: String): DataFrame = {
    val prepared = df
      .withColumn("__toks", split(trim(lower(col(textCol))), "\\s+"))
    val p1 = element_at(org.apache.spark.ml.functions.vector_to_array(
      col("probability")), 2)
    model.transform(prepared)
      .withColumn("quality_prob", p1)
      .drop("__toks", "__tf", "features", "rawPrediction", "probability", "prediction")
  }
}
