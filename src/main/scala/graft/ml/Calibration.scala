package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Score calibration (Platt 1999): fit `sigmoid(a*score + b)` to a binary
  * label by Newton/IRLS — the standard recipe for turning a cheap,
  * uncalibrated quality signal into a probability (here: calibrating the
  * rule-based quality score against the expensive Gopher panel, so a
  * threshold can be chosen as "keep docs with >= p% chance of passing").
  *
  * Scale: each Newton step is ONE distributed aggregate of the five
  * sufficient statistics (weighted 2x2 Hessian + gradient); the solve is
  * two doubles of driver arithmetic — the I7/I8 EM/MICE pattern: loop on
  * the driver, data passes distributed, O(1) driver state.
  *
  * Determinism: iteration-1 weights are exactly 0.25 (sigmoid(0) is
  * exact); later iterations carry the usual float-sum order tolerance
  * (~1e-12), absorbed by the callers' 6-decimal rounding — the same
  * contract the t13 LM scores ship under.
  */
object Calibration {

  /** `iterations` Newton steps from (a,b) = (0,0). Labels must be 0/1
    * (numeric or boolean-castable); scores finite doubles. */
  def plattFit(df: DataFrame, scoreCol: String, labelCol: String,
               iterations: Int = 3): (Double, Double) = {
    require(iterations >= 1)
    var a = 0.0
    var b = 0.0
    for (_ <- 1 to iterations) {
      val s = col(scoreCol).cast(DoubleType)
      val y = col(labelCol).cast(DoubleType)
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) * s + lit(b))))
      val w = p * (lit(1.0) - p)
      val r = df.agg(
        sum(w * s * s).as("h11"), sum(w * s).as("h12"), sum(w).as("h22"),
        sum((p - y) * s).as("g1"), sum(p - y).as("g2")).head()
      val (h11, h12, h22) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val (g1, g2) = (r.getDouble(3), r.getDouble(4))
      val det = h11 * h22 - h12 * h12
      // r9: degenerate input (constant score, all-identical labels, or
      // a separable fit driving every weight to 0) makes the Hessian
      // singular; fail loudly instead of silently producing NaN (a, b).
      require(!det.isNaN && math.abs(det) > 1e-300,
        s"plattFit: singular Hessian (det=$det) — degenerate input " +
          "(constant score, single-class labels, or separable data)")
      a = a - (h22 * g1 - h12 * g2) / det
      b = b - (h11 * g2 - h12 * g1) / det
    }
    (a, b)
  }

  /** The fitted calibrator as a map-only column. */
  def plattApply(score: Column, ab: (Double, Double)): Column =
    lit(1.0) / (lit(1.0) + exp(-(lit(ab._1) * score + lit(ab._2))))

  /** Isotonic calibration by EXACT pool-adjacent-violators on a bounded
    * bucket domain: per observed value of `bucketCol` (an ordered
    * integer cut of the raw score — the m28 fixed-width rule, or any
    * deterministic monotone binning), returns (bucket, n, n_pos,
    * fitted) where `fitted` is the L2-optimal monotone non-decreasing
    * fit to the per-bucket positive rates — the nonparametric
    * counterpart of [[plattFit]] (no sigmoid shape assumed), the other
    * standard answer to a bent reliability curve.
    *
    * Scale shape: ONE map-side-combined aggregate reduces the data to
    * (bucket, count, positives) — buckets-sized — and PAV runs on the
    * driver over those cells (the dictionary-bounded collect pattern;
    * the score domain is bucketed precisely so this is O(buckets), the
    * same budget [[plattFit]] spends per Newton step). Exactness: PAV
    * pools with LONG cross-multiplication compares (s1·n2 vs s2·n1 —
    * never a float ratio), so the merged blocks are the mathematically
    * exact PAV solution; each fitted value is one double division of
    * exact longs. Replayable via the minimax identity
    * fitted_i = max_{k<=i} min_{j>=i} mean(y[k..j]). */
  def isotonicFit(pred: DataFrame, bucketCol: String, pos: Column): DataFrame = {
    val spark = pred.sparkSession
    val cells = pred.filter(col(bucketCol).isNotNull)
      .groupBy(col(bucketCol).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"), count(when(pos, 1)).as("n_pos"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(cells.nonEmpty, "isotonicFit: no non-null buckets")
    // PAV: stack of blocks (firstIdx, n, s); merge while the top block's
    // mean is BELOW its predecessor's (violates non-decreasing order)
    final case class Block(var first: Int, var n: Long, var s: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    cells.zipWithIndex.foreach { case ((_, n, s), i) =>
      stack += Block(i, n, s)
      // s_prev/n_prev > s_top/n_top  <=>  s_prev*n_top > s_top*n_prev
      while (stack.length >= 2 &&
        stack(stack.length - 2).s * stack.last.n >
          stack.last.s * stack(stack.length - 2).n) {
        val top = stack.remove(stack.length - 1)
        stack.last.n += top.n
        stack.last.s += top.s
      }
    }
    val fitted = new Array[Double](cells.length)
    stack.zipWithIndex.foreach { case (b, bi) =>
      val until = if (bi + 1 < stack.length) stack(bi + 1).first
                  else cells.length
      (b.first until until).foreach { i =>
        fitted(i) = b.s.toDouble / b.n.toDouble
      }
    }
    import spark.implicits._
    cells.zipWithIndex.map { case ((bucket, n, s), i) =>
      (bucket, n, s, fitted(i))
    }.toSeq.toDF("bucket", "n", "n_pos", "fitted")
      // Spark's HALF_UP round, matching every oracle's round() exactly
      .withColumn("fitted", round(col("fitted"), 6))
  }

  /** Expected / maximum calibration error: one row (n, ece, mce) over
    * the same fixed-width bins as [[reliability]] —
    * ECE = Σ (n_k/N)·|avg_prob_k − frac_pos_k| (the headline
    * calibration number), MCE its worst bin. Same single-aggregate
    * scale shape; per-bin terms rounded to 9 and DECIMAL-summed (ECE)
    * or max'd (MCE, order-free), so both replay bit-for-bit. */
  def calibrationError(pred: DataFrame, probCol: String, pos: Column,
                       bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val p = col(probCol).cast(DoubleType)
    val per = pred.filter(p.isNotNull)
      .withColumn("bin",
        least(floor(p * lit(bins)) + lit(1), lit(bins.toLong)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(round(p, 9).cast("decimal(28,9)")).as("__sp"),
        count(when(pos, 1)).as("n_pos"))
    val tot = per.agg(sum("n").as("__t"))
    val nD = col("n").cast("double")
    val gap = abs((col("__sp").cast("double") / nD)
      - (col("n_pos").cast("double") / nD))
    per.crossJoin(broadcast(tot))
      .groupBy(col("__t").cast("long").as("n"))
      .agg(sum(round((nD / col("__t").cast("double")) * gap, 9)
          .cast("decimal(28,9)")).cast("double").as("__ece"),
        max(round(gap, 9)).as("__mce"))
      .select(col("n"), round(col("__ece"), 6).as("ece"),
        round(col("__mce"), 6).as("mce"))
  }

  /** Reliability diagram + Murphy Brier decomposition: cut `probCol`
    * (a probability in [0,1]) into `bins` fixed-width bins and report
    * per observed bin (bin, n, avg_prob, frac_pos, rel_term, res_term).
    * Σ rel_term − Σ res_term + base·(1−base) = the Brier score — the
    * standard answer to "is this calibrated?" that [[plattFit]] only
    * assumes. rel_term = n·(avg_prob − frac_pos)²/N (calibration gap),
    * res_term = n·(frac_pos − base)²/N (sharpness).
    *
    * Scale shape: the bin cut is map-only (floor(p·bins), top edge
    * clamped into the last bin), ONE map-side-combined aggregate
    * produces per-bin (n, Σp, n_pos), and everything after is
    * bins-sized. Exactness: Σp sums round-9 DECIMAL terms
    * (order-independent); the reported ratios are fixed double trees
    * over those sums and exact longs, rounded to 6. Empty bins are
    * omitted (a reliability curve has no point there). */
  def reliability(pred: DataFrame, probCol: String, pos: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val p = col(probCol).cast(DoubleType)
    val per = pred.filter(p.isNotNull)
      .withColumn("bin",
        least(floor(p * lit(bins)) + lit(1), lit(bins.toLong)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(round(p, 9).cast("decimal(28,9)")).as("__sp"),
        count(when(pos, 1)).as("n_pos"))
    val tot = per.agg(sum("n").as("__t"), sum("n_pos").as("__p"))
    val base = col("__p").cast("double") / col("__t").cast("double")
    val nD = col("n").cast("double")
    val avgP = col("__sp").cast("double") / nD
    val fPos = col("n_pos").cast("double") / nD
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(avgP, 6).as("avg_prob"),
        round(fPos, 6).as("frac_pos"),
        round((nD * ((avgP - fPos) * (avgP - fPos)))
          / col("__t").cast("double"), 6).as("rel_term"),
        round((nD * ((fPos - base) * (fPos - base)))
          / col("__t").cast("double"), 6).as("res_term"))
  }

  /** One-row Murphy decomposition summary of the Brier score:
    * (n, brier, reliability, resolution, uncertainty, within_bin) —
    * brier is the EXACT mean squared error of the probabilities
    * (not the binned approximation), reliability/resolution are
    * [[reliability]]'s per-bin terms summed, uncertainty = base*(1-base),
    * and within_bin = brier - ((reliability - resolution) + uncertainty)
    * is the variance of p inside bins (0 when forecasts are discrete at
    * bin centers) — reported, not hidden, so the identity is auditable.
    *
    * Scale shape: ONE map-side-combined aggregate to bins-sized, a
    * second bins-sized fold; per-row (p-y)^2 and per-bin terms are
    * round-9 DECIMAL-summed (order-independent), the readouts fixed
    * double trees rounded to 6. */
  def brierDecomposition(pred: DataFrame, probCol: String, pos: Column,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val p = col(probCol).cast(DoubleType)
    val y = when(pos, lit(1.0)).otherwise(lit(0.0))
    val per = pred.filter(p.isNotNull)
      .withColumn("bin",
        least(floor(p * lit(bins)) + lit(1), lit(bins.toLong)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(round(p, 9).cast("decimal(28,9)")).as("__sp"),
        count(when(pos, 1)).as("n_pos"),
        sum(round((p - y) * (p - y), 9).cast("decimal(28,9)")).as("__sb"))
    val tot = per.agg(sum("n").as("__t"), sum("n_pos").as("__p"),
      sum("__sb").as("__b"))
    val tD = col("__t").cast("double")
    val base = col("__p").cast("double") / tD
    val nD = col("n").cast("double")
    val avgP = col("__sp").cast("double") / nD
    val fPos = col("n_pos").cast("double") / nD
    val s = per.crossJoin(broadcast(tot))
      .agg(max("__t").as("__t"), max("__p").as("__p"), max("__b").as("__b"),
        sum(round((nD * ((avgP - fPos) * (avgP - fPos))) / tD, 9)
          .cast("decimal(28,9)")).as("__rel"),
        sum(round((nD * ((fPos - base) * (fPos - base))) / tD, 9)
          .cast("decimal(28,9)")).as("__res"))
    val brier = col("__b").cast("double") / tD
    val rel = col("__rel").cast("double")
    val res = col("__res").cast("double")
    val unc = base * (lit(1.0) - base)
    s.select(col("__t").as("n"),
      round(brier, 6).as("brier"),
      round(rel, 6).as("reliability"),
      round(res, 6).as("resolution"),
      round(unc, 6).as("uncertainty"),
      round(brier - ((rel - res) + unc), 6).as("within_bin"))
  }
}
