package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.TableOp

/** Missing-value repair (SURVEY §2.5 I1-I4, I7, I8-as-regression;
  * reference `preprocessing/dataset_processing_check_nan_logic.py`).
  *
  * Scale design: scalar fills (mean/median/mode) are one aggregate action
  * + a map-only fill — the aggregate is computed distributed, only the
  * scalar crosses to the driver. Interpolation partitions by a user key so
  * no single-partition window exists on the big path. Regression imputation
  * is closed-form OLS from covariance aggregates — one scan for the fit,
  * one map for the fill, no MLlib iteration.
  */
object Imputation {

  /** I1 — mean fill (`dataset_processing_check_nan_logic.py:29-35`). */
  case class FillMean(c: String) extends TableOp {
    def describe = s"impute $c with mean"
    def apply(df: DataFrame): DataFrame = {
      requireNumeric(df, c)
      val m = df.agg(avg(col(c))).first().getDouble(0)
      df.na.fill(Map(c -> m))
    }
  }

  /** Groupwise mean fill (extension beyond the reference's global
    * imputers): nulls in `c` take their GROUP's mean — the standard
    * refinement when a column's level differs by segment (price by
    * category, score by source) and a global mean would bias every
    * group toward the grand average. Groups whose values are ALL null
    * fall back to the global mean so no null survives.
    *
    * Scale: one map-side-combined aggregate per group (dictionary-
    * sized), broadcast back; the fill is a map-only coalesce. */
  case class FillMeanBy(c: String, by: String) extends TableOp {
    def describe = s"impute $c with per-$by mean"
    def apply(df: DataFrame): DataFrame = {
      requireNumeric(df, c)
      val global = df.agg(avg(col(c))).first().getDouble(0)
      val means = df.groupBy(col(by).as("__k"))
        .agg(avg(col(c)).as("__m"))
      df.join(broadcast(means), col(by) <=> col("__k"), "left")
        .withColumn(c, coalesce(col(c).cast(DoubleType), col("__m"), lit(global)))
        .drop("__k", "__m")
    }
  }

  /** I2 — median fill, exact (`…:38-44`). At extreme scale swap
    * `median` for `percentile_approx` — behavior documented. */
  case class FillMedian(c: String) extends TableOp {
    def describe = s"impute $c with median"
    def apply(df: DataFrame): DataFrame = {
      requireNumeric(df, c)
      val m = df.agg(median(col(c))).first().getDouble(0)
      df.na.fill(Map(c -> m))
    }
  }

  /** I3 — mode fill, any type; pandas tie-break = smallest value; fallback
    * "Unknown" for all-null string columns (`…:47-55`). */
  case class FillMode(c: String) extends TableOp {
    def describe = s"impute $c with mode"
    def apply(df: DataFrame): DataFrame = {
      val top = df.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .orderBy(desc("__n"), asc(c)).limit(1)
        .collect()
      top.headOption match {
        case Some(row) =>
          df.withColumn(c, coalesce(col(c), lit(row.get(0))))
        case None if df.schema(c).dataType == StringType =>
          df.na.fill(Map(c -> "Unknown"))
        case None => df
      }
    }
  }

  /** Forward fill (LOCF — last observation carried forward) per key in
    * explicit order: the time-series imputer that repeats the most
    * recent reading instead of inventing values between them (sensor
    * gaps, sparse event attributes). Leading nulls stay null — there is
    * nothing to carry. `partitionCols` is REQUIRED: a keyless running
    * window funnels the frame through one reducer (the SCALING.md
    * forbidden class); per-key windows are bounded by key history. */
  case class ForwardFill(c: String, orderCols: Seq[String],
                         partitionCols: Seq[String]) extends TableOp {
    def describe = s"forward fill $c ordered by ${orderCols.mkString(",")}"
    def apply(df: DataFrame): DataFrame = {
      require(partitionCols.nonEmpty,
        "ForwardFill needs partitionCols — a keyless running window is a single-reducer funnel")
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(orderCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** I4 — linear interpolation, pandas
    * `interpolate(method='linear', limit_direction='both')` (`…:58-63`).
    * Row order is pandas-implicit; here it is EXPLICIT: `orderCols` within
    * `partitionBy` keys (SURVEY §7.4(1)) — callers must pass enough columns
    * for a TOTAL order or neighbor choice is tie-dependent. Blend is linear
    * in ORDINAL row position (pandas default), not in order-column value.
    * With partition keys the window never collapses to one partition at
    * scale.
    */
  case class Interpolate(c: String, orderCols: Seq[String],
                         partitionBy: Seq[String] = Nil) extends TableOp {
    def describe = s"interpolate $c ordered by ${orderCols.mkString(",")}"
    def apply(df: DataFrame): DataFrame = {
      val part = partitionBy.map(col)
      val base = Window.partitionBy(part: _*).orderBy(orderCols.map(col): _*)
      val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val rn = row_number().over(base)
      val rnOf = when(col(c).isNotNull, rn)
      val prevV = last(col(c), ignoreNulls = true).over(wPrev)
      val nextV = first(col(c), ignoreNulls = true).over(wNext)
      val prevR = last(rnOf, ignoreNulls = true).over(wPrev)
      val nextR = first(rnOf, ignoreNulls = true).over(wNext)
      val blended =
        when(col(c).isNotNull, col(c))
          .when(prevV.isNull, nextV)                     // leading nulls
          .when(nextV.isNull, prevV)                     // trailing nulls
          .otherwise(prevV + (nextV - prevV) * (rn - prevR) / (nextR - prevR))
      df.withColumn("__rn", rn)   // forces the same window frame once
        .withColumn(c, blended).drop("__rn")
    }
  }

  /** I7 — EM with a univariate normal model (`…:229-260`): iterate
    * {draw NaNs from N(mu, sigma); re-estimate} until |dMu| < tol.
    * Each iteration = one aggregate + one seeded `randn` map; the loop
    * runs on the driver but all data passes are distributed. */
  case class EmImpute(c: String, seed: Long = 42L, maxIter: Int = 100,
                      tol: Double = 1e-5) extends TableOp {
    def describe = s"EM-impute $c"
    def apply(df: DataFrame): DataFrame = {
      requireNumeric(df, c)
      val first0 = df.agg(avg(col(c)), stddev(col(c))).first()
      var mu = first0.getDouble(0)
      var sig = if (first0.isNullAt(1) || first0.getDouble(1).isNaN) 0.0 else first0.getDouble(1)
      var cur = df
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        val filled = df.withColumn(c,
          coalesce(col(c), randn(seed + it) * sig + mu))
        val r = filled.agg(avg(col(c)), stddev(col(c))).first()
        val nmu = r.getDouble(0)
        val nsig = if (r.isNullAt(1) || r.getDouble(1).isNaN) 0.0 else r.getDouble(1)
        done = math.abs(nmu - mu) < tol
        mu = nmu; sig = nsig; cur = filled; it += 1
      }
      cur
    }
  }

  /** I8 (single round) — regression imputation: fill `target` nulls with
    * OLS prediction from one predictor, fit on complete rows. Closed form:
    * slope = cov(x,y)/var(x) over non-null pairs (exactly DuckDB's
    * `regr_slope`/`regr_intercept`), so the fit is ONE aggregate scan.
    * Reference analogue: one IterativeImputer round with a linear model
    * (`repair_nan_methods/mice_method.py:25-144`). */
  case class RegressionImpute(target: String, predictor: String,
                              clipLo: Option[Double] = None,
                              clipHi: Option[Double] = None,
                              roundTo: Option[Int] = None) extends TableOp {
    def describe = s"regression-impute $target from $predictor"
    def apply(df: DataFrame): DataFrame = {
      requireNumeric(df, target)
      val fit = df.filter(col(target).isNotNull && col(predictor).isNotNull)
        .agg(covar_samp(col(predictor), col(target)).as("cov"),
          var_samp(col(predictor)).as("varx"),
          avg(col(predictor)).as("mx"), avg(col(target)).as("my"))
        .first()
      val slope = if (fit.getDouble(1) == 0.0) 0.0 else fit.getDouble(0) / fit.getDouble(1)
      val icept = fit.getDouble(3) - slope * fit.getDouble(2)
      var pred: Column = lit(icept) + lit(slope) * col(predictor)
      clipLo.foreach(lo => pred = greatest(pred, lit(lo)))
      clipHi.foreach(hi => pred = least(pred, lit(hi)))
      roundTo.foreach(d => pred = round(pred, d))
      df.withColumn(target, coalesce(col(target), pred))
    }
  }

  /** I8 (full) — MICE-style round-robin: repeatedly regression-impute each
    * null-bearing numeric column from the best-|corr| predictor among the
    * candidates, `maxIter` rounds (`mice_method.py:256-354`). The pick is
    * ONE corr-aggregate scan per (column, round) over the target's
    * non-null rows (ties keep the earliest candidate — deterministic);
    * the closed-form fit above then costs one more scan. */
  case class MiceImpute(targets: Seq[String], predictors: Seq[String],
                        maxIter: Int = 3, roundTo: Option[Int] = None) extends TableOp {
    def describe = s"MICE-impute ${targets.mkString(",")}"
    def apply(df: DataFrame): DataFrame = {
      var cur = df
      for (_ <- 1 to maxIter; t <- targets) {
        val preds = predictors.filterNot(_ == t)
        if (preds.nonEmpty) {
          val best =
            if (preds.size == 1) preds.head
            else {
              val aggs = preds.map(p => corr(col(t), col(p)))
              val row = cur.filter(col(t).isNotNull).agg(aggs.head, aggs.tail: _*).first()
              preds.zipWithIndex.map { case (p, i) =>
                p -> (if (row.isNullAt(i)) 0.0 else math.abs(row.getDouble(i)))
              }.maxBy(_._2)._1 // first max in candidate order on ties
            }
          cur = RegressionImpute(t, best, roundTo = roundTo)(cur)
        }
      }
      cur
    }
  }

  /** Dtype guard mirroring the reference's ValueError precondition
    * (`dataset_processing_check_nan_logic.py:31-32`). */
  private def requireNumeric(df: DataFrame, c: String): Unit = {
    val ok = df.schema(c).dataType match {
      case _: NumericType => true
      case _ => false
    }
    require(ok, s"column $c is not numeric")
  }
}
