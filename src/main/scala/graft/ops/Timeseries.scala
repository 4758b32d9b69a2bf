package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over an append-only event log: batch
  * sessionization (the gap rule behind every product-analytics funnel)
  * and calendar resampling with last-observation-carried-forward — the
  * two shapes that turn an irregular event stream into the regular
  * per-entity series downstream aggregation expects. (Streaming session
  * windows live in streaming/Streams.scala via session_window; this is
  * the batch/backfill path over the full history.)
  *
  * Behavioral parity: the reference has no event-log surface — both ops
  * extend it the way pandas users do with `groupby` + `cumsum` gap
  * rules and `resample().ffill()` (the I4/i11 fill family applied to a
  * time grid).
  *
  * Scale shape: every window is keyed by the entity column — one hash
  * exchange on the key, rows of one entity never leave one task, and no
  * keyless window ever appears (PlanLintSpec's invariant). Session
  * numbering is lag + running count inside the SAME window spec, so
  * Catalyst fuses both into ONE Window operator over one sort. The
  * resample grid is built from a per-entity min/max AGGREGATE (map-side
  * combined) and exploded map-only — the grid never shuffles at corpus
  * granularity; days join back on (entity, day). All session arithmetic
  * is integer microseconds — engine-exact.
  */
object Timeseries {

  /** Gap-rule sessionization: a new session starts when the previous
    * event of the same entity is more than `gapMicros` older (or there
    * is none). Returns one row per session: entity, session number
    * (1-based, in time order), event count, start/end epoch-us and
    * duration. `ordCol` breaks equal-timestamp ties so the numbering is
    * a total order (replayable on any engine). */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 ordCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(ordCol))
    val ts = unix_micros(col(tsCol))
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull || ts - prev > gapMicros, 1L).otherwise(0L)
    df.withColumn("__sess", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("__sess").as("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("start_us"), max(ts).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Time-RANGE rolling aggregate: for every event, the count and
    * value-sum of the same entity's events in the trailing `windowMicros`
    * (inclusive of the current row and its timestamp peers — RANGE
    * frame semantics, identical across engines). The sum accumulates
    * DECIMAL, so frame-internal addition order can't flip a bit.
    * One entity-keyed window — one exchange, one sort, no keyless
    * frame. */
  def rollingRange(df: DataFrame, entityCol: String, tsCol: String,
                   valueCol: String, windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    df.select(col(entityCol), col(tsCol),
      count(lit(1)).over(w).as("n_window"),
      sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double")
        .as("sum_window"))
  }

  /** Gaps-and-islands / SCD-style run-length encoding: consecutive
    * events of one entity with the SAME state value collapse to one
    * interval row (state, start, end, count) — the core of a type-2
    * slowly-changing-dimension build. The island key is the classic
    * difference of two row_numbers (global per entity minus per
    * (entity, state)); both windows share the entity partitioning, so
    * the plan is one exchange + one sort feeding two numberings, then
    * a map-side-combined aggregate. All arithmetic integer. */
  def stateIslands(df: DataFrame, entityCol: String, tsCol: String,
                   ordCol: String, stateCol: String): DataFrame = {
    val wAll = Window.partitionBy(entityCol).orderBy(col(tsCol), col(ordCol))
    val wState = Window.partitionBy(col(entityCol), col(stateCol))
      .orderBy(col(tsCol), col(ordCol))
    df.withColumn("__grp",
        row_number().over(wAll) - row_number().over(wState))
      .groupBy(col(entityCol), col(stateCol), col("__grp"))
      .agg(min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_in_period"))
      .drop("__grp")
  }

  /** Time-weighted average (TWAP): per entity, each observation is
    * weighted by how long it remained current (the gap to the NEXT
    * event, from one lead over the entity-keyed window); the final
    * observation carries no weight, and single-event entities drop
    * (zero total weight). Weights are integer microseconds and the
    * weighted sums run in DECIMAL — order-exact; the division is one
    * fixed double tree. The difference from a plain mean matters
    * whenever sampling is irregular (a price quoted for an hour counts
    * an hour, not one tick). */
  def twap(df: DataFrame, entityCol: String, tsCol: String,
           ordCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(ordCol))
    val ts = unix_micros(col(tsCol))
    df.withColumn("__w", lead(ts, 1).over(w) - ts)
      .filter(col("__w").isNotNull)
      .groupBy(col(entityCol))
      .agg(sum(col("__w")).as("total_us"),
        sum(col(valueCol).cast("decimal(8,3)") *
          col("__w").cast("decimal(20,0)")).cast("double").as("__vw"))
      .filter(col("total_us") > 0)
      .select(col(entityCol), col("total_us"),
        round(col("__vw") / col("total_us").cast("double"), 6).as("twap"))
  }

  /** OHLC bars: per (entity, hour) — open/high/low/close/count, the
    * candle aggregation. Open and close are min/max-struct argmins
    * over (epoch-us, order col, value) — map-side combined, total
    * order, no window scan of the raw rows; high/low/count ride the
    * same single aggregate. */
  def ohlcBars(df: DataFrame, entityCol: String, tsCol: String,
               ordCol: String, valueCol: String): DataFrame = {
    val ts = unix_micros(col(tsCol))
    df.groupBy(col(entityCol),
        date_trunc("hour", col(tsCol)).as("bar_start"))
      .agg(
        min(struct(ts, col(ordCol), col(valueCol))).getField(valueCol)
          .as("open"),
        max(col(valueCol)).as("high"), min(col(valueCol)).as("low"),
        max(struct(ts, col(ordCol), col(valueCol))).getField(valueCol)
          .as("close"),
        count(lit(1)).as("n"))
  }

  /** RFM (recency / frequency / monetary) segmentation: per entity, the
    * three classic engagement metrics plus their quartile scores (1 =
    * lowest..4 = highest under each metric's ascending order). Recency
    * is whole days between the entity's last event and the GLOBAL
    * latest event day (a 1-row broadcast anchor). Quartile assignment
    * is WINDOW-FREE: global ranks ride [[Ordinals.withGlobalRank]]'s
    * distributed prefix sum under (metric, entity) total orders, and
    * quartile = floor((rank-1)*4/n)+1 — pure integer arithmetic,
    * replayable, never a single-partition ntile funnel. Monetary sums
    * DECIMAL (order-exact). */
  def rfmSegments(df: DataFrame, entityCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val perUser = df.groupBy(col(entityCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double")
          .as("monetary"))
    val anchor = df.agg(max(to_date(col(tsCol))).as("__anchor"))
    val base = perUser.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__last", "__anchor")
    val n = base.count()
    def quartile(rankCol: Column): Column =
      (floor(((rankCol - lit(1)) * lit(4)) / lit(n)) + lit(1)).cast("int")
    // low recency_days = MOST recent = best; rank descending so that
    // score 4 = most recently active, matching the f/m orientation
    val r1 = Ordinals.withGlobalRank(base,
      Seq(col("recency_days").desc, col(entityCol).asc), "__rr")
    val r2 = Ordinals.withGlobalRank(r1,
      Seq(col("frequency").asc, col(entityCol).asc), "__rf")
    val r3 = Ordinals.withGlobalRank(r2,
      Seq(col("monetary").asc, col(entityCol).asc), "__rm")
    r3.select(col(entityCol), col("recency_days"), col("frequency"),
      round(col("monetary"), 4).as("monetary"),
      quartile(col("__rr")).as("r_score"),
      quartile(col("__rf")).as("f_score"),
      quartile(col("__rm")).as("m_score"))
  }

  /** First-order Markov transition matrix over an event-type sequence:
    * rows (from_type, to_type, n, p) where p row-normalizes the counts
    * per from_type. Pairs come from ONE lag over the entity-keyed
    * window (no self-join of the event log); both the pair counts and
    * the from-marginals are integer aggregates of the SAME cells-sized
    * frame, so p is a deterministic ratio of longs. */
  def transitionMatrix(df: DataFrame, entityCol: String, tsCol: String,
                       ordCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(ordCol))
    val pairs = df
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val marg = pairs.groupBy("from_type").agg(sum("n").as("__tot"))
    pairs.join(broadcast(marg), "from_type")
      .withColumn("p",
        round(col("n").cast("double") / col("__tot").cast("double"), 6))
      .drop("__tot")
  }

  /** Growth accounting: per calendar day, the count of FIRST-SEEN
    * entities and the running cumulative total — the "total users over
    * time" curve. First-seen is one map-side-combined min aggregate;
    * the cumulative sum rides [[Ordinals.withRunningTotal]]'s
    * distributed prefix sum (range-partitioned, never a keyless window
    * funnel), so the curve computes at any scale; counts are integers,
    * hence the double prefix sum is exact. */
  def cumulativeFirstSeen(df: DataFrame, entityCol: String,
                          tsCol: String): DataFrame = {
    val firstDay = df.groupBy(col(entityCol))
      .agg(min(to_date(col(tsCol))).as("first_day"))
    val daily = firstDay.groupBy("first_day").agg(count(lit(1)).as("n_new"))
    Ordinals.withRunningTotal(daily, Seq(col("first_day").asc),
        "n_new", "__cum")
      .select(col("first_day"), col("n_new"),
        col("__cum").cast("long").as("cum_total"))
  }

  /** Cohort retention matrix: entities are cohorted by FIRST-SEEN week
    * (Monday-truncated, identical in both engines); a cohort's week-k
    * retention is the share of its members active k weeks later. Rows
    * (cohort_week, week_offset, n_active, cohort_size, retention).
    * Shapes: one min aggregate for cohorts, one distinct for
    * (entity, week) activity, one entity-keyed join, one cells-sized
    * count — cohort sizes re-join as a broadcast of the offset-0 rows
    * (every member is active in its own first week by construction).
    * All counts long; retention = ratio of two longs, rounded. */
  def cohortRetention(df: DataFrame, entityCol: String,
                      tsCol: String): DataFrame = {
    val wk = to_date(date_trunc("week", col(tsCol)))
    val cohort = df.groupBy(col(entityCol)).agg(min(wk).as("cohort_week"))
    val activity = df.select(col(entityCol), wk.as("active_week")).distinct()
    val cells = activity.join(cohort, entityCol)
      .select(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .withColumn("retention", round(
        col("n_active").cast("double") / col("cohort_size").cast("double"), 6))
  }

  /** Daily resample with LOCF gap fill: per entity, one row for every
    * calendar day between that entity's first and last event; days with
    * events carry the day's value sum (order-exact: summed in DECIMAL,
    * emitted as double) and days without events carry the previous
    * day's value forward. `is_gap` marks filled rows. The carried value
    * is the already-emitted double, so the fill is bit-identical to the
    * source row on any engine. */
  def resampleDailyLocf(df: DataFrame, entityCol: String, tsCol: String,
                        valueCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    // per-(entity, day) sum in DECIMAL(18,6): order-independent, exact
    val daily = df.groupBy(col(entityCol), day.as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).cast("double")
        .as("__day_value"))
    // per-entity calendar grid: aggregate to (min, max) then explode —
    // the grid is map-only after a map-side-combined agg
    val grid = df.groupBy(col(entityCol))
      .agg(min(day).as("__d0"), max(day).as("__d1"))
      .select(col(entityCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(entityCol).orderBy("day")
    grid.join(daily, Seq(entityCol, "day"), "left")
      .withColumn("value_filled",
        last(col("__day_value"), ignoreNulls = true).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_gap", col("__day_value").isNull)
      .drop("__day_value")
  }

  /** The hourly total-value series (hour, y) with y an exact
    * DECIMAL(18,6) sum — the shared base of [[acf]] and
    * [[seasonalNaiveMase]]. One aggregate over the scan; the series
    * frame is TIME-SPAN-sized (hours of history), not data-sized, so
    * everything downstream of it is driver-broadcastable at any data
    * volume. Hours with no events are absent (gappy series — lag pairs
    * across gaps are skipped by the equi-join, the standard
    * missing-data convention). */
  private def hourlySeries(df: DataFrame, tsCol: String,
                           valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(date_trunc("hour", col(tsCol)).as("__h"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__y"))

  /** Kaplan–Meier product-limit survival estimator over per-entity
    * lifetimes: one row per distinct lifetime
    * (t_us, n_risk, n_events, n_censored, survival) — the standard
    * churn/retention curve with right-censoring. An entity's lifetime
    * is last_ts − first_ts; it counts as an EVENT (churn observed) when
    * its last activity ends ≥ `horizonHours` before the dataset's
    * maximum timestamp, and as CENSORED otherwise (still alive at the
    * observation edge). Ties follow the standard convention: entities
    * censored AT t are still at risk for the deaths at t.
    *
    * Scale shape: one per-entity aggregate (keyed shuffle), one
    * distinct-lifetime aggregate (entities-sized), then the at-risk
    * counts and the log-survival prefix ride [[Ordinals
    * .withRunningTotal]] over the LIFETIMES frame. Exactness: risk
    * arithmetic is all exact integers; each ln(1 − d/n) term is rounded
    * to 9 and carried as a SCALED INTEGER double (×1e9 — exact below
    * 2^53), so the prefix sum is exact under any partitioning and
    * survival = exp(cum/1e9) is one deterministic double; a
    * greatest(·, 1e-300) floor keeps the d = n endpoint finite (its
    * exp underflows to exactly 0 on both engines). */
  def kaplanMeier(df: DataFrame, entityCol: String, tsCol: String,
                  horizonHours: Int = 24): DataFrame = {
    val withRisk = survivalTable(df, entityCol, tsCol, horizonHours)
    val term = round(log(greatest(
      lit(1.0) - (col("__d").cast("double") / col("__n_risk").cast("double")),
      lit(1e-300))), 9) * lit(1e9)
    Ordinals.withRunningTotal(withRisk.withColumn("__lt", term),
        Seq(col("__t").asc), "__lt", "__cl")
      .select(col("__t").as("t_us"), col("__n_risk").as("n_risk"),
        col("__d").as("n_events"),
        (col("__all") - col("__d")).as("n_censored"),
        round(exp(col("__cl") / lit(1e9)), 6).as("survival"))
  }

  /** The shared risk table behind [[kaplanMeier]] and [[nelsonAalen]]:
    * per distinct lifetime, (__t, __all, __d, __n_risk) with the
    * at-risk counts from one exact integer prefix over the
    * lifetimes frame. */
  private def survivalTable(df: DataFrame, entityCol: String,
                            tsCol: String, horizonHours: Int): DataFrame = {
    val perEntity = df.groupBy(col(entityCol))
      .agg(min(unix_micros(col(tsCol))).as("__first"),
        max(unix_micros(col(tsCol))).as("__last"))
    val edge = df.agg(max(unix_micros(col(tsCol))).as("__edge"))
    val lives = perEntity.crossJoin(broadcast(edge))
      .select((col("__last") - col("__first")).as("__t"),
        when(col("__last") <= col("__edge")
          - lit(horizonHours.toLong * 3600000000L), 1L).otherwise(0L)
          .as("__ev"))
    val times = lives.groupBy("__t")
      .agg(count(lit(1)).as("__all"), sum("__ev").as("__d"))
    val tot = lives.agg(count(lit(1)).as("__N"))
    Ordinals.withRunningTotal(times, Seq(col("__t").asc), "__all", "__ca")
      .crossJoin(broadcast(tot))
      .withColumn("__n_risk",
        (col("__N") - (col("__ca").cast("long") - col("__all"))))
  }

  /** Nelson–Aalen cumulative hazard: one row per distinct lifetime
    * (t_us, n_risk, n_events, cum_hazard, hazard_var) with
    * H(t) = Σ_{t_i≤t} d_i/n_i and the standard variance estimate
    * Σ d_i/n_i² — the hazard-scale companion of [[kaplanMeier]] (the
    * estimator of choice when comparing hazard SHAPES or feeding a
    * proportional-hazards check). Same scale/exactness contract: all
    * risk arithmetic exact integers, each term rounded to 9 and
    * carried as a scaled-integer double on the RunningTotal prefix. */
  def nelsonAalen(df: DataFrame, entityCol: String, tsCol: String,
                  horizonHours: Int = 24): DataFrame = {
    val withRisk = survivalTable(df, entityCol, tsCol, horizonHours)
    val nD = col("__n_risk").cast("double")
    val h = round(col("__d").cast("double") / nD, 9) * lit(1e9)
    val v = round(col("__d").cast("double") / (nD * nD), 9) * lit(1e9)
    Ordinals.withRunningTotals(
        withRisk.withColumn("__ht", h).withColumn("__vt", v),
        Seq(col("__t").asc), Seq("__ht" -> "__ch", "__vt" -> "__cv"))
      .select(col("__t").as("t_us"), col("__n_risk").as("n_risk"),
        col("__d").as("n_events"),
        round(col("__ch") / lit(1e9), 6).as("cum_hazard"),
        round(col("__cv") / lit(1e9), 6).as("hazard_var"))
  }

  /** Two-group log-rank test: one row
    * (n_a, n_b, o_a, e_a, v, chi2_logrank) comparing the survival
    * experience of two entity cohorts — the standard "do these cohorts
    * churn differently?" significance test on top of [[kaplanMeier]].
    * O_a = observed events in cohort A, E_a = Σ d·n_a/n its
    * expectation under the null, V the hypergeometric variance;
    * chi2 = (O_a − E_a)²/V (1 dof). `groupExpr` must be row-local and
    * constant per entity (a key modulus, a dimension attribute).
    *
    * Scale/exactness: the merged risk table is the [[survivalTable]]
    * shape with per-cohort counts pivoted into columns, so BOTH
    * cohorts' at-risk prefixes ride one RunningTotal pass each over the
    * lifetimes frame — all integers; the E and V terms are fixed double
    * trees rounded to 9 and DECIMAL-summed (the n = 1 tail contributes
    * 0 variance by the standard convention, guarded exactly). */
  def logRank(df: DataFrame, entityCol: String, tsCol: String,
              groupExpr: Column, aVal: String,
              horizonHours: Int = 24): DataFrame = {
    val perEntity = df.groupBy(col(entityCol))
      .agg(min(unix_micros(col(tsCol))).as("__first"),
        max(unix_micros(col(tsCol))).as("__last"),
        first(groupExpr).as("__g"))
    val edge = df.agg(max(unix_micros(col(tsCol))).as("__edge"))
    val lives = perEntity.crossJoin(broadcast(edge))
      .select((col("__last") - col("__first")).as("__t"),
        when(col("__last") <= col("__edge")
          - lit(horizonHours.toLong * 3600000000L), 1L).otherwise(0L)
          .as("__ev"),
        (col("__g") === aVal).as("__ina"))
    val times = lives.groupBy("__t")
      .agg(count(when(col("__ina"), 1)).as("__alla"),
        count(when(!col("__ina"), 1)).as("__allb"),
        sum(when(col("__ina"), col("__ev")).otherwise(0L)).as("__da"),
        sum(when(!col("__ina"), col("__ev")).otherwise(0L)).as("__db"))
    val tot = lives.agg(count(when(col("__ina"), 1)).as("__Na"),
      count(when(!col("__ina"), 1)).as("__Nb"))
    val cum = Ordinals.withRunningTotals(times, Seq(col("__t").asc),
      Seq("__alla" -> "__ca", "__allb" -> "__cb"))
    val withRisk = cum.crossJoin(broadcast(tot))
      .select(col("__t"), col("__da"), col("__db"),
        (col("__Na") - (col("__ca").cast("long") - col("__alla")))
          .as("__ra"),
        (col("__Nb") - (col("__cb").cast("long") - col("__allb")))
          .as("__rb"),
        col("__Na"), col("__Nb"))
    val d = (col("__da") + col("__db")).cast("double")
    val n = (col("__ra") + col("__rb")).cast("double")
    val pa = col("__ra").cast("double") / n
    val eTerm = d * pa
    val vTerm = when((col("__ra") + col("__rb")) > 1L,
      ((d * pa) * (lit(1.0) - pa)) * ((n - d) / (n - lit(1.0))))
      .otherwise(lit(0.0))
    withRisk.groupBy(col("__Na").as("n_a"), col("__Nb").as("n_b"))
      .agg(sum("__da").as("o_a"),
        sum(round(eTerm, 9).cast("decimal(28,9)")).cast("double").as("__e"),
        sum(round(vTerm, 9).cast("decimal(28,9)")).cast("double").as("__v"))
      .select(col("n_a"), col("n_b"), col("o_a"),
        round(col("__e"), 6).as("e_a"), round(col("__v"), 6).as("v"),
        round(((col("o_a").cast("double") - col("__e"))
          * (col("o_a").cast("double") - col("__e"))) / col("__v"), 6)
          .as("chi2_logrank"))
  }

  /** Autocorrelation function of the hourly total-value series at lags
    * 1..maxLag: (lag, n_pairs, acf) per lag, acf_l =
    * Σ(y_t−ȳ)(y_{t−l}−ȳ) / Σ(y_t−ȳ)² — the seasonality/persistence
    * diagnostic (a 24h intake cycle shows as a spike at lag 24) behind
    * choosing the [[seasonalNaiveMase]] season.
    *
    * Scale shape: after [[hourlySeries]], every join/aggregate runs on
    * the span-sized series (lag pairs via an exact hour-arithmetic
    * equi-join against a lag spine — no window, no cartesian).
    * Exactness: ȳ and the denominator come from exact decimal sums;
    * per-pair products are fixed double trees rounded to 9 and
    * DECIMAL-summed. */
  def acf(df: DataFrame, tsCol: String, valueCol: String,
          maxLag: Int = 24): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val spark = df.sparkSession
    val series = hourlySeries(df, tsCol, valueCol)
    val stats = series.agg(count(lit(1)).as("__n"),
      sum("__y").as("__sy"),
      sum(col("__y") * col("__y")).as("__syy"))
    // ȳ and Σ(y−ȳ)² as one fixed tree over exact decimal sums
    val nD = col("__n").cast("double")
    val mean = col("__sy").cast("double") / nD
    val denom = col("__syy").cast("double") - (nD * (mean * mean))
    val lags = spark.range(1, maxLag + 1).select(col("id").cast("int").as("lag"))
    val a = series.select(unix_micros(col("__h")).as("__ha"),
      col("__y").as("__ya"))
    val b = series.select(unix_micros(col("__h")).as("__hb"),
      col("__y").as("__yb"))
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, col("__hb") ===
        (col("__ha") - (col("lag").cast("long") * lit(3600000000L))), "inner")
    val term = (col("__ya").cast("double") - col("__m")) *
      (col("__yb").cast("double") - col("__m"))
    pairs.crossJoin(broadcast(stats.select(mean.as("__m"), denom.as("__d"))))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(round(term, 9).cast("decimal(28,9)")).cast("double")
          / first(col("__d"))).as("__acf"))
      .select(col("lag"), col("n_pairs"), round(col("__acf"), 6).as("acf"))
  }

  /** Classical additive seasonal decomposition of the hourly series
    * (statsmodels' seasonal_decompose, period even): one row per hour
    * (h_us, y, seasonal, trend, residual) where trend is the centered
    * 2x(period)-MA (half weights at the window ends), seasonal the
    * phase-mean of the detrended series re-centered to sum 0, and
    * residual = y - trend - seasonal (null at the edge hours whose MA
    * window is incomplete, like the reference method).
    *
    * Scale shape: everything runs on the SPAN-SIZED hourly series; the
    * moving average is an exact-hour equi-join against a broadcast
    * (period+1)-row offset spine — no keyless window over the data.
    * Exactness: the MA rides integer weights {1,2} over DECIMAL hour
    * sums (exact; divide by 2*period only in the final double tree);
    * phase means and the seasonal grand mean are round-9 DECIMAL sums.
    * Phase = epoch-hour mod period (UTC hour-of-day for period 24). */
  def seasonalDecompose(df: DataFrame, tsCol: String, valueCol: String,
                        period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"classical decomposition needs an even period, got $period")
    val spark = df.sparkSession
    val half = period / 2
    val series = hourlySeries(df, tsCol, valueCol)
      .select(unix_micros(col("__h")).as("__hus"), col("__y"))
    val offs = spark.range(-half, half + 1)
      .select(col("id").cast("int").as("__off"))
    val b = series.select(col("__hus").as("__hb"), col("__y").as("__yb"))
    // integer weights {1 at the two ends, 2 inside} keep the weighted
    // sum in exact DECIMAL; the /(2*period) happens in the double tree
    val wInt = when(abs(col("__off")) === half, lit(1)).otherwise(lit(2))
    val trendAgg = series.select(col("__hus"))
      .crossJoin(broadcast(offs))
      .join(b, col("__hb") ===
        (col("__hus") + (col("__off").cast("long") * lit(3600000000L))))
      .groupBy(col("__hus"))
      .agg(count(lit(1)).as("__c"), sum(col("__yb") * wInt).as("__ws"))
      .filter(col("__c") === (period + 1))
      .select(col("__hus"), col("__ws"))
    val joined = series.join(trendAgg, Seq("__hus"), "left")
      .withColumn("__ph", expr(s"pmod(__hus div 3600000000, $period)"))
    val trendD = col("__ws").cast("double") / lit((2 * period).toDouble)
    val detr = col("__y").cast("double") - trendD
    val sm = joined.filter(col("__ws").isNotNull)
      .groupBy(col("__ph"))
      .agg(sum(round(detr, 9).cast("decimal(28,9)")).as("__sd"),
        count(lit(1)).as("__nd"))
    val mk = col("__sd").cast("double") / col("__nd").cast("double")
    val gm = sm.agg(sum(round(mk, 9).cast("decimal(28,9)")).as("__sm"),
      count(lit(1)).as("__np"))
    val seasonal = sm.crossJoin(broadcast(gm))
      .select(col("__ph"),
        (mk - (col("__sm").cast("double") / col("__np").cast("double")))
          .as("__seas"))
    joined.join(broadcast(seasonal), Seq("__ph"))
      .select(col("__hus").as("h_us"),
        round(col("__y").cast("double"), 6).as("y"),
        round(col("__seas"), 6).as("seasonal"),
        round(trendD, 6).as("trend"),
        round(detr - col("__seas"), 6).as("residual"))
  }

  /** Seasonal-naive forecast quality on the hourly total-value series:
    * one row (n_naive, mae_naive, n_seasonal, mae_seasonal, mase) where
    * mae_naive is the lag-1 in-sample naive MAE, mae_seasonal the
    * lag-`season` one, and mase = mae_seasonal / mae_naive — the
    * scale-free "is there usable seasonality?" number (MASE < 1: the
    * seasonal carry-forward beats last-hour). Hyndman & Koehler 2006.
    *
    * Scale shape: two exact-hour equi-joins on the span-sized series.
    * Exactness: |y_t − y_{t−l}| stays in DECIMAL end-to-end (the series
    * values are exact decimals), so both MAEs are one double division
    * of exact decimal sums — no float summation anywhere. */
  def seasonalNaiveMase(df: DataFrame, tsCol: String, valueCol: String,
                        season: Int = 24): DataFrame = {
    require(season >= 2, s"need season >= 2, got $season")
    val series = hourlySeries(df, tsCol, valueCol)
    def lagMae(lag: Int, tag: String): DataFrame = {
      val a = series.select(unix_micros(col("__h")).as("__ha"),
        col("__y").as("__ya"))
      val b = series.select(unix_micros(col("__h")).as("__hb"),
        col("__y").as("__yb"))
      a.join(b, col("__hb") ===
          (col("__ha") - lit(lag.toLong * 3600000000L)), "inner")
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(abs(col("__ya") - col("__yb"))).as(s"__sad_$tag"))
    }
    val naive = lagMae(1, "naive")
    val seas = lagMae(season, "seasonal")
    val maeN = col("__sad_naive").cast("double") / col("n_naive").cast("double")
    val maeS = col("__sad_seasonal").cast("double") /
      col("n_seasonal").cast("double")
    naive.crossJoin(seas)
      .select(col("n_naive"), round(maeN, 6).as("mae_naive"),
        col("n_seasonal"), round(maeS, 6).as("mae_seasonal"),
        round(maeS / maeN, 6).as("mase"))
  }
}
