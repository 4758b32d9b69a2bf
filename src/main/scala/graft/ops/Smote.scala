package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SMOTE family (SURVEY §2.4 B2, B5, B7-B10;
  * reference `data_balancing_list_method_logic.py:9-124`).
  *
  * All variants operate on the NUMERIC feature columns + class column
  * (the reference converts X to a numeric matrix first). Randomness is a
  * deterministic hash stream (Neighbors.detUniform) keyed by seed+row —
  * reproducible regardless of partitioning, unlike rand(): an explicit
  * scale-design choice (rand() re-draws on retry/stage-replay; hashes
  * don't).
  *
  * Per-class synthesis counts are EXACT (quota = ceil-split of the
  * deficit over base rows), matching imblearn's exact `fit_resample`
  * sizes. Distributed kNN is approximate (Neighbors.knnJoin) — sklearn
  * bit-parity is impossible; parity target is distributional (SURVEY
  * §4.2(2)).
  */
object Smote {

  /** Drop all internal __-prefixed working columns. */
  private def dropInternal(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("__")).toSeq: _*)

  /** Run independent per-class branches concurrently (r14; the
    * Validation.inParallel pattern): each branch's eager work — the
    * quota/weight materializations, counts, global-rank offset collects —
    * otherwise serializes on the driver while executors idle. Closures
    * are seeded and self-contained, results return in input order, so
    * output is bit-identical to the sequential loop. */
  private def inParallel[A](xs: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{blocking, Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = xs.map(f => Future(blocking(f())))
    Await.result(Future.sequence(fs), Duration.Inf)
  }

  /** Core synthesis: for each row of `minority` (id, features), emit
    * `quota(id)` synthetic rows interpolated toward a deterministic
    * random choice among its k nearest same-class neighbors. */
  private def synthesize(minority: DataFrame, feats: Seq[String], k: Int,
                         width: Double, seed: Long, deficit: Long): DataFrame = {
    val n = minority.count()
    if (n == 0 || deficit <= 0) return minority.limit(0).select(feats.map(col): _*)
    val perRow = deficit / n
    val extra = (deficit % n).toInt
    // stable per-row index for quota assignment — zipWithIndex-based
    // global rank, NOT a single-partition Window.orderBy (r2 VERDICT 4)
    val base = Ordinals.withGlobalRank(minority, Seq(col("__id")), "__rn")
      .withColumn("__quota", lit(perRow) + when(col("__rn") <= extra, 1L).otherwise(0L))
      .filter(col("__quota") > 0)
    // kNN LEFT side = only the rows that will synthesize (__quota > 0):
    // a near-majority class with a tiny deficit must not pay a full
    // class self-join — candidates shrink by deficit/class-size. The
    // RIGHT side stays the whole class (same neighbors as before).
    // array_sort fixes the shuffle-fetch-dependent collect_list order —
    // neighbor choice must be stable under stage retries (struct sorts by
    // its first field, nbr_rank)
    val nn = Neighbors.knnJoin(base, minority, "__id", k, width, seed)
      .groupBy(col("l_id").as("__id"))
      .agg(array_sort(collect_list(struct(col("nbr_rank"), col("nbr_id")))).as("__nbrs"))
    val withNbrs = base.join(nn, Seq("__id"), "left")
    val expanded = withNbrs
      .withColumn("__j", explode(sequence(lit(1), col("__quota"))))
      .withColumn("__pick",
        (Neighbors.detUniform(seed + 1, col("__id"), col("__j")) * size(col("__nbrs")))
          .cast(IntegerType))
      .withColumn("__nbr_id",
        when(size(col("__nbrs")) > 0, col("__nbrs")(col("__pick")).getField("nbr_id"))
          .otherwise(col("__id"))) // isolated point: duplicate itself
      .withColumn("__u", Neighbors.detUniform(seed + 2, col("__id"), col("__j")))
    val nbrFeats = minority.select(
      (col("__id").as("__nbr_id") +: feats.map(c => col(c).as(s"__nbr_$c"))): _*)
    expanded.join(nbrFeats, Seq("__nbr_id"), "left")
      .select(feats.map(c =>
        (col(c) + col("__u") * (coalesce(col(s"__nbr_$c"), col(c)) - col(c))).as(c)): _*)
  }

  /** Class-packing for the cleanup passes (r11): (C, when-chain mapping
    * the target string to its index in SORTED class order) — sorted so
    * index comparisons reproduce the former alphabetical-string
    * tie-breaks exactly. */
  private def packClass(counts: Map[String, Long],
                        target: String): (Int, Column) = {
    val cs = counts.keys.toSeq.sorted
    val idx = cs.zipWithIndex.tail.foldLeft(lit(0)) { case (acc, (c, i)) =>
      when(col(target) === c, lit(i)).otherwise(acc)
    }
    (cs.size, idx)
  }

  /** Static overflow guard for class-packed ids (r12 ADVICE): prep's
    * `__id` is `monotonically_increasing_id` — (partitionId << 33) +
    * row-in-partition — so maxId < ((P−1) << 33) + totalRows, with P
    * read from the PLAN and totalRows from the class counts prep already
    * collected. Replaces the former eager `agg(max(__id))` scan of the
    * unmaterialized scaled lineage at every packing site. */
  private def packGuard(all: DataFrame, counts: Map[String, Long],
                        cNum: Int): Unit = {
    // r13 ADVICE: the probe partition count can drift from the count a
    // LATER execution of the unmaterialized lineage actually plans (AQE
    // or file-split changes), so the static bound carries a 4x partition
    // safety margin; only if even the padded bound doesn't fit do we pay
    // the exact max(__id) scan the static check replaced.
    val parts = math.max(1, all.rdd.getNumPartitions).toLong
    val limit = (Long.MaxValue - cNum) / cNum
    val padded = ((4L * parts - 1L) << 33) + counts.values.sum
    if (padded > limit) {
      // r13 ADVICE: the fallback's measured max(__id) comes from ONE
      // execution of the unmaterialized lineage — a later execution can
      // re-plan with more partitions and mint larger ids, so the exact
      // reading needs the same drift headroom the static bound carries
      // (3 extra partition strides of id space).
      val maxId = all.agg(max(col("__id"))).head.getLong(0)
      val margin = (3L * parts) << 33
      require(margin > 0 && maxId <= limit - margin,
        s"id space too small to pack $cNum classes safely " +
          s"(max id $maxId, replan margin $margin, limit $limit)")
    }
  }

  /** Numeric projection + stable ids + per-class counts, shared prep. */
  private def prep(df: DataFrame, target: String): (DataFrame, Seq[String], Map[String, Long]) = {
    val feats = df.schema.fields.collect {
      case f if f.name != target && f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    val base = df.select((feats.map(c => col(c).cast(DoubleType).as(c)) :+
      col(target).cast(StringType).as(target)): _*)
      .withColumn("__id", monotonically_increasing_id())
    val counts = base.groupBy(col(target)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (base, feats, counts)
  }

  /** B2 — SMOTE: oversample every minority class to the majority size
    * with synthetic interpolated rows. `rounded=true` reproduces the
    * reference's integer-rounding option (`…logic.py:18-21`). */
  case class SmoteOp(target: String, k: Int = 5, width: Double = 0.0,
                     seed: Long = 42L, rounded: Boolean = false)
      extends graft.pipeline.TableOp {
    def describe = s"SMOTE oversample classes of $target"
    def apply(df: DataFrame): DataFrame = {
      val (base, feats, counts) = prep(df, target)
      val majority = counts.values.max
      val params = Neighbors.scaleParams(base, feats)
      val synthParts = inParallel(counts.toSeq.sortBy(_._1).collect {
        case (cls, n) if n < majority => () =>
          val minority = Neighbors.withScaled(base.filter(col(target) === cls), params)
          synthesize(minority, feats, k, width, seed + cls.hashCode, majority - n)
            .withColumn(target, lit(cls))
      })
      val out = synthParts.foldLeft(base.drop("__id"))(_ unionByName _)
      if (rounded) out.select((feats.map(c => round(col(c)).as(c)) :+ col(target)): _*)
      else out
    }
  }

  /** B7 — ADASYN: like SMOTE but the per-point quota is weighted by the
    * share of MAJORITY-class points among its k nearest neighbors in the
    * full data (density-adaptive; `…logic.py:68-76`). */
  case class AdasynOp(target: String, k: Int = 5, width: Double = 0.0,
                      seed: Long = 42L) extends graft.pipeline.TableOp {
    def describe = s"ADASYN oversample classes of $target"
    def apply(df: DataFrame): DataFrame = {
      val (base, feats, counts) = prep(df, target)
      val majority = counts.values.max
      val params = Neighbors.scaleParams(base, feats)
      val all = Neighbors.withScaled(base, params)
      // r11: same class-packed ids as the b9/b10 cleanup passes (strictly
      // monotone, neighbors and tie-breaks identical) — the difficulty
      // vote reads the neighbor's class from pmod(nbr_id), so the
      // edge-list x dictionary join disappears; decoded back to __id
      // before any downstream arithmetic (quotas, detUniform, ranks are
      // bit-identical). The k=5 difficulty VOTE also rides cellBudget=16
      // (a share statistic needs ~150 candidates/row, not the synthesis
      // pass's deep neighborhoods); exact mode (width <= 0) untouched.
      val (cNum, clsIdx) = packClass(counts, target)
      packGuard(all, counts, cNum)
      val packedAll = all.withColumn("__pid",
        col("__id") * cNum + clsIdx.cast(LongType))
      val clsOrder = counts.keys.toSeq.sorted
      val synthParts = inParallel(counts.toSeq.sortBy(_._1).collect {
        case (cls, n) if n < majority => () =>
          val minority = all.filter(col(target) === cls)
          val clsI = clsOrder.indexOf(cls).toLong
          // neighbor-difficulty weight: share of other-class points in kNN
          val nn = Neighbors.knnJoin(packedAll.filter(col(target) === cls),
              packedAll, "__pid", k, width, seed, cellBudget = 16)
            .groupBy(expr(s"l_id DIV $cNum").as("__id"))
            .agg(avg((pmod(col("nbr_id"), lit(cNum.toLong)) =!= lit(clsI))
              .cast(DoubleType)).as("__w"))
          // Materialize the difficulty weights ONCE: weighted's lineage
          // holds the full-frame kNN above, and the quota arithmetic
          // traverses it repeatedly (totW agg, shortfall agg, the
          // global-rank top-up, the synthesis joins) — uncheckpointed,
          // each traversal re-ran the kNN (the dominant b7 cost at sf1).
          // Minority-sized rows, same precedent as SmoteEnn/Tomek.
          val weighted = minority.join(nn, Seq("__id"), "left")
            .withColumn("__w", coalesce(col("__w"), lit(0.0)))
            .transform(graft.core.Materialize.frame)
          // quota proportional to weight, exact total = deficit:
          // floor share + largest-remainder top-up (the floor alone
          // under-fills by up to n-1 — r2 VERDICT item 5)
          val totW = weighted.agg(sum("__w")).first().getDouble(0)
          val deficit = majority - n
          val share =
            if (totW <= 0) lit(deficit.toDouble / math.max(n, 1L)) // uniform fallback
            else col("__w") / totW * deficit
          val withShare = weighted.withColumn("__q0", floor(share).cast(LongType))
            .withColumn("__rem", share - floor(share))
          val shortfall = deficit - withShare.agg(sum("__q0")).first().getLong(0)
          val withQuota = Ordinals.withGlobalRank(withShare,
              Seq(desc("__rem"), asc("__id")), "__rr")
            .withColumn("__quota",
              col("__q0") + when(col("__rr") <= shortfall, 1L).otherwise(0L))
          val qRows = withQuota.filter(col("__quota") > 0)
          val q = qRows
            .withColumn("__j", explode(sequence(lit(1), col("__quota"))))
            .withColumn("__pick", (Neighbors.detUniform(seed + 1, col("__id"), col("__j")) * k).cast(IntegerType))
          // neighbor LISTS only for rows that synthesize (same trick as
          // synthesize(): left side of the kNN shrinks to the quota rows)
          val nnList = Neighbors.knnJoin(qRows, minority, "__id", k, width, seed)
            .groupBy(col("l_id").as("__id"))
            .agg(array_sort(collect_list(struct(col("nbr_rank"), col("nbr_id")))).as("__nbrs"))
          val expanded = q.join(nnList, Seq("__id"), "left")
            .withColumn("__nbr_id",
              when(size(col("__nbrs")) > 0,
                col("__nbrs")(pmod(col("__pick"), size(col("__nbrs")))).getField("nbr_id"))
                .otherwise(col("__id")))
            .withColumn("__u", Neighbors.detUniform(seed + 2, col("__id"), col("__j")))
          val nbrFeats = minority.select(
            (col("__id").as("__nbr_id") +: feats.map(c => col(c).as(s"__nbr_$c"))): _*)
          expanded.join(nbrFeats, Seq("__nbr_id"), "left")
            .select(feats.map(c =>
              (col(c) + col("__u") * (coalesce(col(s"__nbr_$c"), col(c)) - col(c))).as(c)): _*)
            .withColumn(target, lit(cls))
      })
      synthParts.foldLeft(base.drop("__id"))(_ unionByName _)
    }
  }

  /** B8 — Borderline-SMOTE: synthesize only from "danger" minority points
    * (at least half their full-data kNN belongs to other classes but not
    * all — pure-noise points excluded; `…logic.py:79-87`). */
  case class BorderlineSmoteOp(target: String, k: Int = 5, width: Double = 0.0,
                               seed: Long = 42L) extends graft.pipeline.TableOp {
    def describe = s"Borderline-SMOTE oversample classes of $target"
    def apply(df: DataFrame): DataFrame = {
      val (base, feats, counts) = prep(df, target)
      val majority = counts.values.max
      val params = Neighbors.scaleParams(base, feats)
      val all = Neighbors.withScaled(base, params)
      // r11: class-packed ids + shallow budget for the k=5 danger VOTE —
      // same discipline as AdasynOp's difficulty pass above (the
      // synthesis kNN below keeps plain ids and the deep default grid).
      val (cNum, clsIdx) = packClass(counts, target)
      packGuard(all, counts, cNum)
      val packedAll = all.withColumn("__pid",
        col("__id") * cNum + clsIdx.cast(LongType))
      val clsOrder = counts.keys.toSeq.sorted
      val synthParts = inParallel(counts.toSeq.sortBy(_._1).collect {
        case (cls, n) if n < majority => () =>
          val minority = all.filter(col(target) === cls)
          val clsI = clsOrder.indexOf(cls).toLong
          // Materialize the danger ids ONCE (ids only — tiny): the
          // isEmpty probe below plus synthesize's count/rank/join
          // traversals would otherwise each re-run the full-frame kNN.
          val danger = Neighbors.knnJoin(packedAll.filter(col(target) === cls),
              packedAll, "__pid", k, width, seed, cellBudget = 16)
            .groupBy(expr(s"l_id DIV $cNum").as("__id"))
            .agg(avg((pmod(col("nbr_id"), lit(cNum.toLong)) =!= lit(clsI))
              .cast(DoubleType)).as("__share"))
            .filter(col("__share") >= 0.5 && col("__share") < 1.0)
            .select("__id")
            .transform(graft.core.Materialize.frame)
          val dangerRows = minority.join(danger, "__id")
          val src = if (dangerRows.isEmpty) minority else dangerRows
          synthesize(src, feats, k, width, seed + cls.hashCode, majority - n)
            .withColumn(target, lit(cls))
      })
      synthParts.foldLeft(base.drop("__id"))(_ unionByName _)
    }
  }

  /** B5 — NearMiss v1: keep the majority-class points with the smallest
    * mean distance to their 3 nearest minority neighbors, exactly
    * minority-count many per class (`…logic.py:46-54`). */
  case class NearMissOp(target: String, nNeighbors: Int = 3, width: Double = 0.0,
                        seed: Long = 42L) extends graft.pipeline.TableOp {
    def describe = s"NearMiss undersample majority of $target"
    def apply(df: DataFrame): DataFrame = {
      val (base, feats, counts) = prep(df, target)
      val minCount = counts.values.min
      // imblearn NearMiss(version=1) ranks each over-represented class by
      // mean distance to the MINORITY class's samples (not to every other
      // class) — faithful AND ~|data|/|minority| cheaper on the kNN join
      val minorityCls = counts.toSeq.minBy { case (c, n) => (n, c) }._1
      val params = Neighbors.scaleParams(base, feats)
      val all = Neighbors.withScaled(base, params)
      val parts = inParallel(counts.toSeq.sortBy(_._1).map { case (cls, n) => () =>
        val clsRows = all.filter(col(target) === cls)
        if (n <= minCount) dropInternal(clsRows)
        else {
          val others = all.filter(col(target) === minorityCls)
          // Materialized ONCE (ids + one double): withGlobalRank's
          // zipWithIndex evaluates its input twice and the keep filter a
          // third time — uncheckpointed, each evaluation re-ran the kNN.
          // r11: the 3-NN mean distance is a RANKING heuristic (only the
          // order of __md matters, and only at the minCount boundary) —
          // it rides the shallow cellBudget=16 grid like the other vote
          // passes; exact mode (width <= 0) untouched
          val meanDist = Neighbors.knnJoin(clsRows, others, "__id",
              nNeighbors, width, seed, cellBudget = 16)
            .groupBy(col("l_id").as("__id")).agg(avg("dist").as("__md"))
            .transform(graft.core.Materialize.frame)
          // left join: rows with no approximate-kNN candidate rank last
          // (infinite distance) instead of vanishing — class size stays
          // exactly minCount. Global rank via zipWithIndex, not the
          // single-partition Window.orderBy (r2 VERDICT 4).
          val ranked = Ordinals.withGlobalRank(
            clsRows.join(meanDist, Seq("__id"), "left")
              .withColumn("__md", coalesce(col("__md"), lit(Double.MaxValue))),
            Seq(asc("__md"), asc("__id")), "__r")
          ranked.filter(col("__r") <= minCount)
            .drop("__md", "__r")
            .transform(dropInternal)
        }
      })
      parts.reduce(_ unionByName _)
    }
  }

  /** B9 — SMOTE-Tomek: SMOTE, then drop Tomek links (mutual cross-class
    * 1-NN pairs — both members removed, imblearn default removes majority;
    * reference uses library default so we drop BOTH like SMOTETomek's
    * 'auto'; `…logic.py:91-99`). */
  case class SmoteTomekOp(target: String, k: Int = 5, width: Double = 0.0,
                          seed: Long = 42L) extends graft.pipeline.TableOp {
    def describe = s"SMOTE-Tomek resample classes of $target"
    def apply(df: DataFrame): DataFrame = {
      // Materialize the SMOTE pass ONCE: the link phase traverses its
      // output many times (scaleParams collect, adaptiveWidth probes,
      // BOTH sides of the 1-NN self-join, the nn1 a/b self-join, the
      // final anti-join), and smoted's lineage contains SMOTE's own kNN
      // join + synthesis — without the checkpoint each traversal re-runs
      // it (measured at sf1: the b9/b10 tail). Same eager-localCheckpoint
      // precedent as Dedup.components; the stored frame is the op's own
      // output size (~2n), strictly cheaper than 5+ recomputes.
      // SERIALIZED storage (r13 #4): at a 10x deficit the post-SMOTE
      // frame is ~10x the input — deserialized row blocks were THE
      // single-JVM sizing cliff (b9/b10 failed the 8 GB sf10 protocol).
      val smoted = SmoteOp(target, k, width, seed)(df).transform(graft.core.Materialize.frameSer)
      val (base, feats, counts) = prep(smoted, target)
      val params = Neighbors.scaleParams(base, feats)
      val all = Neighbors.withScaled(base, params)
      // r9: the caller's width is sized for the ORIGINAL frame at the
      // default 64-rows/cell budget; the link pass runs on the ~2x
      // augmented frame and needs only 1 approximate neighbor, so
      // re-derive the grid for the measured augmented size at a 16/cell
      // budget (occupancy grows as n*w^2 — candidates drop ~8x, recall
      // for k=1 stays ample at ~144 expected candidates per row).
      // width <= 0 (the exact mode every value-level spec pins) is
      // untouched.
      val linkWidth =
        if (width <= 0) width else Neighbors.autoWidth(smoted.count(), 16)
      // r11: pack the class index into the id's LOW bits (id*C + cls).
      // The mapping is strictly monotone in id — C·(id2−id1) > |cls
      // difference| — so every neighbor choice and distance tie-break
      // (topk_pairs orders by (dist, nbr_id)) is IDENTICAL to the
      // unpacked run in both exact and grid mode, while the link pass
      // reads both endpoint classes with pmod: the two
      // edge-list × row-dictionary shuffle joins disappear.
      val (cNum, clsIdx) = packClass(counts, target)
      packGuard(all, counts, cNum)
      val packed = all.withColumn("__pid",
        col("__id") * cNum + clsIdx.cast(LongType))
      // nn1 feeds BOTH sides of the mutual-link self-join below; without
      // materialization the kNN join (the expensive stage) runs twice.
      // The frame is (2n x 2 longs) — trivial to store, k=1 pairs only.
      // r11: the cleanup 1-NN is a TRUE self-join — the half-space probe
      // scheme (knnSelfJoin) generates each unordered pair once — and a
      // k=1 removal heuristic needs a SHALLOW neighborhood: cellBudget=8
      // leaves ~100 candidates/row, cutting the dominant phase's
      // join+aggregate input 8x (measured at sf1: 20.7 s -> 4.8 s,
      // survivor counts move 0.35% — the b9 bounds contract is
      // insensitive). Exact mode (width <= 0, the value-level specs)
      // is untouched.
      val nn1 = Neighbors.knnSelfJoin(packed, "__pid", 1, linkWidth, seed, cellBudget = 8)
        .select(col("l_id"), col("nbr_id")).transform(graft.core.Materialize.frame)
      val links = nn1.as("a").join(nn1.as("b"),
          col("a.l_id") === col("b.nbr_id") && col("a.nbr_id") === col("b.l_id") &&
            col("a.l_id") < col("a.nbr_id"))
        .select(col("a.l_id").as("x"), col("a.nbr_id").as("y"))
        .filter(pmod(col("x"), lit(cNum.toLong)) =!=
          pmod(col("y"), lit(cNum.toLong)))
      val toDrop = links.select(expr(s"x DIV $cNum").as("__id"))
        .unionByName(links.select(expr(s"y DIV $cNum").as("__id"))).distinct()
      dropInternal(all.join(toDrop, Seq("__id"), "left_anti"))
    }
  }

  /** B10 — SMOTE-ENN: SMOTE, then edited-nearest-neighbours cleanup (drop
    * rows whose 3-NN majority vote disagrees with their class;
    * `…logic.py:102-110`). */
  case class SmoteEnnOp(target: String, k: Int = 5, ennK: Int = 3,
                        width: Double = 0.0, seed: Long = 42L)
      extends graft.pipeline.TableOp {
    def describe = s"SMOTE-ENN resample classes of $target"
    def apply(df: DataFrame): DataFrame = {
      // Same single-materialization contract as SmoteTomekOp above: the
      // ENN phase traverses the SMOTE output from adaptiveWidth, both
      // knnJoin sides, the class lookup, and the final vote join.
      // Serialized storage for the same ~10x-deficit sizing reason.
      val smoted = SmoteOp(target, k, width, seed)(df).transform(graft.core.Materialize.frameSer)
      val (base, feats, counts) = prep(smoted, target)
      val params = Neighbors.scaleParams(base, feats)
      val all = Neighbors.withScaled(base, params)
      // r9: same augmented-frame grid re-derivation as SmoteTomekOp —
      // the 3-NN vote needs ~16 rows/cell, not the synthesis pass's 64
      // (see the linkWidth note there); exact mode untouched.
      val voteWidth =
        if (width <= 0) width else Neighbors.autoWidth(smoted.count(), 16)
      // r11: same class-packed ids as SmoteTomekOp (strictly monotone,
      // so neighbor choice and tie-breaks are identical) — the vote
      // reads the neighbor's class from pmod(nbr_id) and the row's own
      // class from pmod(l_id), so neither the edge-list × dictionary
      // join nor the final class-compare join is needed: disagreeing
      // rows anti-join out directly.
      val (cNum, clsIdx) = packClass(counts, target)
      packGuard(all, counts, cNum)
      val packed = all.withColumn("__pid",
        col("__id") * cNum + clsIdx.cast(LongType))
      // r11: same half-space self-join + shallow cellBudget=8 grid as
      // SmoteTomekOp's link pass (k=3 votes need ~100 candidates/row,
      // not the synthesis pass's deep neighborhoods; measured at sf1
      // the 3-NN pass drops 17.3 s -> 4.6 s, survivors move 0.4%)
      val votes = Neighbors.knnSelfJoin(packed, "__pid", ennK, voteWidth, seed, cellBudget = 8)
        .groupBy(col("l_id"),
          pmod(col("nbr_id"), lit(cNum.toLong)).as("__nc"))
        .agg(count(lit(1)).as("__v"))
      // majority with the (count desc, class asc) tie-break as ONE
      // hash aggregate: min(struct(-count, classIdx)) — the class
      // indices are assigned in sorted-class order, so the idx
      // tie-break equals the former string tie-break bit-for-bit
      val disagree = votes
        .groupBy("l_id")
        .agg(min(struct((-col("__v")).as("__nv"), col("__nc"))).as("__top"))
        .filter(col("__top.__nc") =!= pmod(col("l_id"), lit(cNum.toLong)))
        .select(expr(s"l_id DIV $cNum").as("__id"))
      // rows with no neighbors never enter `votes` and are kept, same
      // as the former left-join's null-vote branch
      all.join(disagree, Seq("__id"), "left_anti")
        .transform(dropInternal)
    }
  }

  /** B11 — the reference's "bagging balancer" trains a BaggingClassifier
    * and returns the data UNCHANGED (`…logic.py:114-124`) — reproduced
    * faithfully as an identity op (documented behavioral note; model
    * training itself lives in graft.ml). */
  case class BaggingPassthroughOp(target: String) extends graft.pipeline.TableOp {
    def describe = s"bagging balancer (identity on data, reference parity)"
    def apply(df: DataFrame): DataFrame = df
  }
}
