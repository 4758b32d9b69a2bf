package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based quantile panels over the native mergeable
  * [[graft.functions.KllQuantiles]] aggregate (`kll_quantiles`) — the
  * streaming-legal, single-pass complement of the EXACT
  * histogram-rank selection (`Relational.exactValuesAtRanks`).
  *
  * Reference behavior: the per-column describe()/quantile panels
  * (`data_analysis_ui.py` summary tabs) compute exact percentiles on
  * eager in-memory frames — fine at 500k rows, impossible as one pass
  * at 100 TB. The sketch panel here is ONE map-side-combined aggregate
  * whose state is O(k log(n/k)) doubles per group and whose merge is
  * associative, so it runs identically in batch groupBy, incremental
  * (per-partition then merged) shapes, and Structured Streaming
  * windowed aggregations — with a SELF-REPORTED worst-case rank-error
  * bound that [[auditEstimates]] turns into an oracle-checkable
  * contract.
  */
object Quantiles {

  /** Per-group quantile ESTIMATES: one row per (group, percentile) with
    * the group's exact row count, the sketch's worst-case rank-error
    * bound, and the estimate. One aggregate, no second scan. */
  def sketchQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                      probs: Seq[Double], k: Int = 256): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__x"))
    base.groupBy("__g")
      .agg(call_function("kll_quantiles", col("__x"), lit(k),
        array(probs.map(lit): _*)).as("__sk"))
      .select(col("__g").as(groupCol), col("__sk.n").as("n"),
        col("__sk.err").as("rank_err_bound"),
        posexplode(col("__sk.est")))
      .select(col(groupCol), col("n"), col("rank_err_bound"),
        element_at(array(probs.map(lit): _*), col("pos") + 1)
          .as("percentile"),
        col("col").as("estimate"))
  }

  /** The exact-vs-bound CONTRACT check shared by a46 and st15: each
    * estimate's TRUE rank interval [count_lt+1, count_le] must
    * intersect [r - err, r + err], where r = greatest(1, ceil(p*n)) is
    * the target rank (the IDENTICAL IEEE tree the sketch's eval and
    * the DuckDB oracle compute) and `err` the sketch's self-reported
    * bound — guaranteed by the compaction accounting under ANY
    * partition/merge order, so `within_bound` is deterministically
    * TRUE even though the estimate itself is not deterministic.
    *
    * `est` must be [[sketchQuantiles]]-shaped: (groupOut, n,
    * rank_err_bound, percentile, estimate). Output: (groupOut,
    * percentile, n, exact_value, within_bound); `exact_value` (the
    * true value at rank r, via the per-key global-rank sort) and `n`
    * are exact and cross-engine checkable, `within_bound` is the
    * in-engine verification the oracle pins to literal TRUE.
    *
    * Scale shape: one broadcast-join rank-count aggregate plus one
    * range sort — the audit is O(n log n) BY DESIGN (it exists to
    * verify the sketch); production callers use [[sketchQuantiles]]
    * alone. */
  def auditEstimates(df: DataFrame, valueCol: String, est: DataFrame,
                     groupOut: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupOut).isNotNull)
      .select(col(groupOut).as("__g"), col(valueCol).cast("double").as("__x"))
    val spine = est.select(col(groupOut).as("__g"), col("n").as("__n"),
        col("rank_err_bound").as("__e"), col("percentile"),
        col("estimate").as("__est"))
      .withColumn("__tr",
        greatest(lit(1L), ceil(col("percentile") * col("__n").cast("double"))))
    val rankCounts = base
      .join(broadcast(spine.select(col("__g"), col("percentile"), col("__est"))),
        Seq("__g"))
      .groupBy(col("__g"), col("percentile"))
      .agg(count(when(col("__x") < col("__est"), 1)).as("__lt"),
        count(when(col("__x") <= col("__est"), 1)).as("__le"))
    val ranked = Ordinals.withPerKeyRank(base, "__g", Seq(col("__x").asc), "__r")
    val exacts = ranked
      .join(broadcast(spine.select(col("__g"), col("percentile"), col("__tr"))
        .withColumnRenamed("__g", "__gk")),
        col("__g") === col("__gk") && (col("__r") === col("__tr")))
      .select(col("__g"), col("percentile"), col("__x").as("__exact"))
    spine.join(rankCounts, Seq("__g", "percentile"))
      .join(exacts, Seq("__g", "percentile"))
      .select(col("__g").as(groupOut), col("percentile"),
        col("__n").as("n"),
        round(col("__exact"), 6).as("exact_value"),
        (((col("__lt") + lit(1L)) <= (col("__tr") + col("__e"))) &&
          (col("__le") >= (col("__tr") - col("__e")))).as("within_bound"))
  }

  /** [[sketchQuantiles]] + [[auditEstimates]] in one call (a46's shape). */
  def sketchQuantileAudit(df: DataFrame, valueCol: String, groupCol: String,
                          probs: Seq[Double], k: Int = 256): DataFrame =
    auditEstimates(df, valueCol,
      sketchQuantiles(df, valueCol, groupCol, probs, k), groupCol)

  /** Sketch-backed equi-depth binning — the 100 TB path under
    * [[Encoding.QuantileBin]] (e8): the k-1 bin edges come from ONE
    * `kll_quantiles` aggregate at p = i/k, and the assignment is
    * MAP-ONLY (broadcast 1-row edge array; bin = 1 + #edges strictly
    * below x, so ties at an edge fall to the lower bin). No range sort,
    * no per-row rank shuffle — the exact op stays for contracts that
    * need deterministic bins; this is the panel/feature path where a
    * bounded rank error is acceptable and priced by [[sketchBinAudit]].
    * Null values pass through with a null bin (QuantileBin parity). */
  def sketchBin(df: DataFrame, c: String, k: Int,
                sketchK: Int = 256): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val probs = (1 until k).map(i => i.toDouble / k)
    val edges = df.filter(col(c).isNotNull)
      .agg(call_function("kll_quantiles", col(c).cast("double"),
        lit(sketchK), array(probs.map(lit): _*)).as("__sk"))
      .select(col("__sk.est").as("__edges"))
    val out = s"${c}_bin"
    df.crossJoin(broadcast(edges))
      .withColumn(out, when(col(c).isNull, lit(null).cast("int"))
        .otherwise((lit(1) + size(filter(col("__edges"),
          e => col(c).cast("double") > e))).cast("int")))
      .drop("__edges")
  }

  /** The exact-vs-bound contract for [[sketchBin]] (e8b): per bin i,
    * the EXACT occupancy n_i (one aggregate over the map-only
    * assignment) must sit inside the interval implied by the per-edge
    * rank guarantee. With r_j = greatest(1, ceil(j/k * n)), err the
    * sketch's self-reported bound, and dup_j the exact tie count at
    * edge j (count_le - count_lt), the compaction accounting gives
    * count_le(e_j) in [r_j - err, r_j + err - 1 + dup_j]; since
    * bin(x) <= j iff x <= e_j (edges are monotone by construction —
    * selection at increasing ranks over one sorted retained set),
    * n_i = count_le(e_i) - count_le(e_{i-1}) and
    *   n_i >= (r_i - err) - (r_{i-1} + err - 1 + dup_{i-1})
    *   n_i <= (r_i + err - 1 + dup_i) - (r_{i-1} - err)
    * with the virtual edges exact: count_le(e_0) = 0, count_le(e_k) =
    * n. `within_bound` is thus deterministically TRUE under any
    * partition/merge order even though the edges themselves are not
    * deterministic; `bin` and `n` are cross-engine exact. The audit's
    * exact passes are O(n·k) BY DESIGN (they exist to verify the
    * sketch); production callers use [[sketchBin]] alone. */
  def sketchBinAudit(df: DataFrame, c: String, k: Int,
                     sketchK: Int = 256): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val probs = (1 until k).map(i => i.toDouble / k)
    val pArr = array(probs.map(lit): _*)
    val base = df.filter(col(c).isNotNull)
      .select(col(c).cast("double").as("__x"))
    val sk = base
      .agg(call_function("kll_quantiles", col("__x"), lit(sketchK), pArr)
        .as("__sk"))
      .select(col("__sk.n").as("__n"), col("__sk.err").as("__e"),
        col("__sk.est").as("__edges"))
    // exact per-edge rank counts: one broadcast-spine aggregate
    val edgeStats = base.crossJoin(broadcast(sk.select(col("__edges"))))
      .select(col("__x"), posexplode(col("__edges")).as(Seq("__i", "__edge")))
      .groupBy(col("__i")) // 0-based edge index; edge j = __i + 1
      .agg(count(when(col("__x") < col("__edge"), 1)).as("__lt"),
        count(when(col("__x") <= col("__edge"), 1)).as("__le"))
    // exact per-bin occupancy via the map-only assignment rule
    val binCounts = base.crossJoin(broadcast(sk.select(col("__edges"))))
      .select((lit(1) + size(filter(col("__edges"),
        e => col("__x") > e))).as("__bin"))
      .groupBy(col("__bin")).agg(count(lit(1)).as("__nb"))
    val spine = sk.select(col("__n"), col("__e"),
        explode(sequence(lit(1), lit(k))).as("bin"))
      .withColumn("__rUp", when(col("bin") < k, greatest(lit(1L),
          ceil(element_at(pArr, col("bin")) * col("__n").cast("double"))))
        .otherwise(col("__n")))
      .withColumn("__rLo", when(col("bin") > 1, greatest(lit(1L),
          ceil(element_at(pArr, col("bin") - 1) * col("__n").cast("double"))))
        .otherwise(lit(0L)))
    val up = edgeStats.select((col("__i") + 1).as("__ju"),
      col("__lt").as("__ltU"), col("__le").as("__leU"))
    val lo = edgeStats.select((col("__i") + 2).as("__jl"),
      col("__lt").as("__ltL"), col("__le").as("__leL"))
    spine
      .join(broadcast(up), col("bin") === col("__ju"), "left")
      .join(broadcast(lo), col("bin") === col("__jl"), "left")
      .join(broadcast(binCounts), col("bin") === col("__bin"), "left")
      .withColumn("__nbv", coalesce(col("__nb"), lit(0L)))
      // count_le bounds at the bin's UPPER edge (exact n at the top)
      .withColumn("__upHi", when(col("bin") < k,
          col("__rUp") + col("__e") - 1 + (col("__leU") - col("__ltU")))
        .otherwise(col("__n")))
      .withColumn("__upLo", when(col("bin") < k, col("__rUp") - col("__e"))
        .otherwise(col("__n")))
      // count_le bounds at the bin's LOWER edge (exact 0 at the bottom)
      .withColumn("__loHi", when(col("bin") > 1,
          col("__rLo") + col("__e") - 1 + (col("__leL") - col("__ltL")))
        .otherwise(lit(0L)))
      .withColumn("__loLo", when(col("bin") > 1, col("__rLo") - col("__e"))
        .otherwise(lit(0L)))
      .select(col("bin").cast("int").as("bin"), col("__n").as("n"),
        ((col("__nbv") >= col("__upLo") - col("__loHi")) &&
          (col("__nbv") <= col("__upHi") - col("__loLo"))).as("within_bound"))
  }

  /** Sketch-backed winsorization — the 100 TB path under a14's exact
    * percentile clipping: clip bounds from ONE `kll_quantiles`
    * aggregate, the clip itself map-only via a 1-row broadcast. Null
    * values pass through as null (exact-op parity). */
  def sketchWinsorize(df: DataFrame, c: String, pLo: Double, pHi: Double,
                      sketchK: Int = 256): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, s"need 0 < pLo < pHi < 1")
    val bounds = df.filter(col(c).isNotNull)
      .agg(call_function("kll_quantiles", col(c).cast("double"),
        lit(sketchK), array(lit(pLo), lit(pHi))).as("__sk"))
      .select(element_at(col("__sk.est"), 1).as("__wlo"),
        element_at(col("__sk.est"), 2).as("__whi"))
    df.crossJoin(broadcast(bounds))
      // greatest/least SKIP nulls in Spark, so guard explicitly
      .withColumn(c, when(col(c).isNull, lit(null).cast("double"))
        .otherwise(greatest(col("__wlo"),
          least(col("__whi"), col(c).cast("double")))))
      .drop("__wlo", "__whi")
  }

  /** The exact-vs-bound contract for [[sketchWinsorize]] (a14b): the
    * a46 rank-interval audit at {pLo, pHi} plus the clip proof — the
    * clipped column stays inside [lo_est, hi_est] and loses no rows.
    * (percentile, n, exact_value) are cross-engine exact;
    * within_bound and clip_ok are the in-engine proofs the oracle pins
    * to literal TRUE. The sketch aggregate appears as the same logical
    * subtree in the audit and the clip branch, so exchange reuse
    * evaluates it once (a46's consistency posture). */
  def sketchWinsorizeAudit(df: DataFrame, c: String, pLo: Double,
                           pHi: Double, sketchK: Int = 256): DataFrame = {
    val tagged = df.withColumn("__all", lit("all"))
    val est = sketchQuantiles(tagged, c, "__all", Seq(pLo, pHi), sketchK)
    val audit = auditEstimates(tagged, c, est, "__all")
    val bounds = est.groupBy(col("__all"))
      .agg(min(when(col("percentile") === pLo, col("estimate"))).as("__wlo"),
        min(when(col("percentile") === pHi, col("estimate"))).as("__whi"))
      .drop("__all")
    val proof = df.filter(col(c).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(greatest(col("__wlo"),
        least(col("__whi"), col(c).cast("double"))).as("__cx"),
        col("__wlo"), col("__whi"))
      .agg(count(lit(1)).as("__cn"),
        (min(col("__cx")) >= min(col("__wlo")) &&
          max(col("__cx")) <= min(col("__whi"))).as("__cok"))
    audit.crossJoin(broadcast(proof))
      .select(col("percentile"), col("n"), col("exact_value"),
        col("within_bound"),
        (col("__cok") && (col("__cn") === col("n"))).as("clip_ok"))
  }
}
