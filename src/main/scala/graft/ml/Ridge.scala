package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ridge regression via distributed sufficient statistics — the
  * textbook L2-regularized least squares (w = Sxy / (Sxx + lambda*n),
  * b = my - w*mx) fit from ONE aggregate pass and applied map-only.
  *
  * This is deliberately NOT a wrapper over MLlib's LinearRegression:
  * MLlib's ridge penalty is rescaled internally by the label/feature
  * standard deviations (an implementation detail of WeightedLeastSquares
  * that has no closed form stable across versions), so its coefficients
  * cannot be replayed engine-independently. The sufficient-statistics
  * form is the one a 100 TB pipeline wants anyway: the fit is five
  * mergeable sums (map-side combined, one exchange of ONE row) and the
  * predict never shuffles. M-family context: m8/i8 already prove the
  * unregularized OLS path; this adds the shrinkage estimator.
  *
  * Exactness contract: x is cast to DECIMAL(12,4), y to DECIMAL(8,3)
  * (the q9-proven cross-engine cast); all five sums are exact decimals
  * (products stay under width 38), so they are order-independent and
  * bit-identical under any partitioning; the coefficient formulas then
  * run in double with one fixed expression tree.
  */
object Ridge {

  /** Adds `pred` = ridge prediction of `targetCol` from `featureCol`.
    * Returns the input columns + prediction (rounded to `roundTo`). */
  def fitPredict(df: DataFrame, targetCol: String, featureCol: String,
                 lambda: Double, roundTo: Int = 4): DataFrame = {
    // every sufficient statistic is computed over the SAME population —
    // rows where BOTH columns are non-null — or mx=sx/n and the
    // (co)variance terms would mix populations when only one column has
    // a null (the fit would be OLS on no consistent subset)
    val both = col(featureCol).isNotNull && col(targetCol).isNotNull
    val x = when(both, col(featureCol)).cast("decimal(12,4)")
    val y = when(both, col(targetCol)).cast("decimal(8,3)")
    val s = df.agg(
      count(when(both, 1)).cast("double").as("__n"),
      sum(x).cast("double").as("__sx"), sum(y).cast("double").as("__sy"),
      sum(x * y).cast("double").as("__sxy"), sum(x * x).cast("double").as("__sxx"))
    val n = col("__n")
    val mx = col("__sx") / n
    val my = col("__sy") / n
    val w = (col("__sxy") - (n * (mx * my))) /
      ((col("__sxx") - (n * (mx * mx))) + (lit(lambda) * n))
    val b = my - (w * mx)
    df.crossJoin(broadcast(s.select(w.as("__w"), b.as("__b"))))
      .withColumn("pred",
        round((col("__w") * col(featureCol)) + col("__b"), roundTo))
      .drop("__w", "__b")
  }
}
