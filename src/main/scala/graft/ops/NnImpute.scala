package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.TableOp

/** Neighbor-based imputers (SURVEY §2.5 I5, I6, I9) on the shared
  * Neighbors LSH infrastructure. Complete rows form the donor side; the
  * null rows probe it — the join volume is (null rows x candidate
  * bucket), never all-pairs.
  */
object NnImpute {

  private def numericCols(df: DataFrame, exclude: Set[String]): Seq[String] =
    df.schema.fields.collect {
      case f if !exclude(f.name) && f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** I5 — KNN imputer (`dataset_processing_check_nan_logic.py:66-86`):
    * scaled-euclidean kNN among COMPLETE rows over the numeric feature
    * columns; fill = mean of the k donors' target values (sklearn
    * KNNImputer semantics, distributed-approximate per SURVEY §4.2(2)). */
  case class KnnImpute(target: String, features: Seq[String] = Nil, k: Int = 5,
                       width: Double = 0.0, seed: Long = 42L,
                       idCol: Option[String] = None) extends TableOp {
    def describe = s"KNN-impute $target"
    def apply(df: DataFrame): DataFrame = {
      val feats = if (features.nonEmpty) features else numericCols(df, Set(target))
      val withId = (idCol match {
        case Some(c) => df.withColumn("__id", col(c))
        case None => df.withColumn("__id", monotonically_increasing_id())
      }).persist()
      val params = Neighbors.scaleParams(withId, feats)
      val scaled = Neighbors.withScaled(withId, params)
      val donors = scaled.filter(col(target).isNotNull)
      val probes = scaled.filter(col(target).isNull)
      // width <= 0 is the exact contract every oracle pins — served by
      // the grid-accelerated exact join (bit-identical, r12), not the
      // all-pairs broadcast scan
      val nn = if (width <= 0) Neighbors.knnJoinExact(probes, donors, "__id", k, seed)
               else Neighbors.knnJoin(probes, donors, "__id", k, width, seed)
      val fills = nn
        .join(donors.select(col("__id").as("nbr_id"), col(target).as("__tv")), "nbr_id")
        .groupBy(col("l_id").as("__id")).agg(avg("__tv").as("__fill"))
      val out = withId.join(fills, Seq("__id"), "left")
        .withColumn(target, coalesce(col(target), col("__fill")))
        .drop("__id", "__fill")
      withId.unpersist()
      out
    }
  }

  /** I6 — hot deck (`…:90-226`): nearest complete DONOR row under a mixed
    * distance — scaled euclidean on numerics + Hamming on categoricals —
    * and the donor's value is copied verbatim (not averaged). */
  case class HotDeckImpute(target: String, numFeatures: Seq[String] = Nil,
                           catFeatures: Seq[String] = Nil, width: Double = 0.0,
                           seed: Long = 42L, idCol: Option[String] = None) extends TableOp {
    def describe = s"hot-deck impute $target"
    def apply(df: DataFrame): DataFrame = {
      val nums = if (numFeatures.nonEmpty) numFeatures else numericCols(df, Set(target))
      val withId = (idCol match {
        case Some(c) => df.withColumn("__id", col(c))
        case None => df.withColumn("__id", monotonically_increasing_id())
      }).persist()
      val params = Neighbors.scaleParams(withId, nums)
      val scaled = Neighbors.withScaled(withId, params)
      val donors = scaled.filter(col(target).isNotNull)
      val probes = scaled.filter(col(target).isNull)
      // candidates by numeric proximity (generous k), then mixed re-rank;
      // exact mode rides the grid-accelerated exact join (r12) — the
      // brute scan was the measured 24-of-30 s i6 floor at sf1
      val cand =
        if (width <= 0) Neighbors.knnJoinExact(probes, donors, "__id", 20, seed)
        else Neighbors.knnJoin(probes, donors, "__id", k = 20, width, seed)
      val dcols = donors.select((col("__id").as("nbr_id") +:
        (col(target).as("__tv") +: catFeatures.map(c => col(c).as(s"__d_$c")))): _*)
      val pcols = probes.select((col("__id").as("l_id") +:
        catFeatures.map(c => col(c).as(s"__p_$c"))): _*)
      val mixed = cand.join(dcols, "nbr_id").join(pcols, "l_id")
        .withColumn("__hamming",
          if (catFeatures.isEmpty) lit(0.0)
          else catFeatures.map(c =>
            when(col(s"__d_$c") <=> col(s"__p_$c"), 0.0).otherwise(1.0): Column)
            .reduce(_ + _))
        .withColumn("__mixed", col("dist") + col("__hamming"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_id").orderBy(asc("__mixed"), asc("nbr_id"))
      val fills = mixed.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("l_id").as("__id"), col("__tv").as("__fill"))
      val out = withId.join(fills, Seq("__id"), "left")
        .withColumn(target, coalesce(col(target), col("__fill")))
        .drop("__id", "__fill")
      withId.unpersist()
      out
    }
  }

  /** I9 — model-based imputation (`imputation_by_model_ui.py:240-294`):
    * fit (or accept) a regression pipeline on complete rows, predict the
    * null rows, write back — a feature-count check mirrors the
    * reference's n_features_in_ guard. */
  case class ModelImpute(target: String, model: String = "linear",
                         seed: Long = 42L) extends TableOp {
    def describe = s"model-impute $target with $model"
    def apply(df: DataFrame): DataFrame = {
      val complete = df.filter(col(target).isNotNull)
      val missing = df.filter(col(target).isNull)
      val fitted = graft.ml.Models.fit(complete, target, model,
        graft.ml.Models.Regression, seed = seed)
      val predicted = fitted.transform(missing)
        .withColumn(target, col("prediction"))
        .select(df.columns.map(col): _*)
      complete.unionByName(predicted)
    }
  }
}
