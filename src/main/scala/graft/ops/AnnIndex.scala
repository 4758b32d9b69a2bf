package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** Persisted IVF (k-means) ANN index — the vector-search production
  * shape: the coarse quantizer is fitted ONCE, and the cell assignment
  * becomes the PARQUET PARTITION LAYOUT, so a top-k query against the
  * loaded index reads only its probed cells from disk (dynamic partition
  * pruning through the broadcast probe join — the directory structure IS
  * the index). Mirrors [[LshIndex]] for embeddings:
  *
  *   - `centroids` (cell, __cv): the nlist k-means centers — tiny,
  *     broadcast at query time;
  *   - `cells` (corpus_id, cv, cell): vectors partitioned by cell.
  *
  * [[append]] assigns new vectors to the EXISTING centroids (no refit —
  * the standard IVF ingest contract; re-balance by rebuilding when drift
  * matters) and appends only the affected cell directories.
  */
object AnnIndex {
  import Similarity.{dp, topKPerQuery}

  case class Index(centroids: DataFrame, cells: DataFrame,
                   nlist: Int, seed: Long)

  /** Fit the coarse quantizer (MLlib KMeans on the corpus) and assign
    * every vector map-side from the centroid table via [[assign]] (r14:
    * the assignment no longer rides the fitted model — one codegen
    * argmin expression per row instead of the model's transform, and
    * the same path a LOADED index uses, so build == load by
    * construction). The MLlib trainer stays: AnnIndexSpec's probe-
    * strategy recall panel (two-phase >= plain IVF) is pinned against
    * its centroid sets, and a sample-trained local Lloyd measurably
    * shifted that panel (tried and reverted in r14 — see
    * OPTIMIZATION_r14.md). */
  def build(df: DataFrame, vecCol: String, idCol: String, nlist: Int,
            seed: Long = 42L): Index = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = df.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val feat = c.withColumn("__fv", array_to_vector(col("cv")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("cell").fit(feat)
    val spark = df.sparkSession
    import spark.implicits._
    val centArr = km.clusterCenters.zipWithIndex
      .map { case (v, cid) => (cid, v.toArray.toSeq) }.toSeq.toDF("cell", "__cv")
    val ix0 = Index(centArr, null, nlist, seed)
    Index(centArr, assign(df, ix0, vecCol, idCol), nlist, seed)
  }

  /** Persist: cells partitioned BY CELL (the layout is the index),
    * centroids + params as plain tables. */
  def save(ix: Index, path: String, mode: String = "error"): Unit = {
    ix.cells.write.mode(mode).partitionBy("cell").parquet(s"$path/cells")
    ix.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // driver-side metadata (r12, same contract as LshIndex): params plus
    // table schemas so load() runs zero Spark jobs. The cells schema is
    // recorded WITHOUT the `cell` partition column — the reader derives
    // it from the directory layout and a supplied schema must list it
    // explicitly, so it is appended at load.
    LshIndex.writeMeta(ix.cells.sparkSession, s"$path/_meta", Seq(
      "nlist" -> ix.nlist.toString, "seed" -> ix.seed.toString,
      "cellsSchema" -> StructType(
        ix.cells.schema.fields.filter(_.name != "cell")).json,
      "centroidsSchema" -> ix.centroids.schema.json))
  }

  def load(spark: SparkSession, path: String): Index = {
    val meta = LshIndex.readMeta(spark, s"$path/_meta")
    def schemaOf(key: String): StructType =
      DataType.fromJson(meta(key)).asInstanceOf[StructType]
    val cellsSchema = StructType(schemaOf("cellsSchema").fields :+
      StructField("cell", IntegerType))
    // tombstone-filtered view, as in LshIndex.load: deletes on an
    // append-only index are broadcast anti-joined ids; rebuild to reclaim
    val cells0 = spark.read.schema(cellsSchema).parquet(s"$path/cells")
    val cells =
      if (LshIndex.hadoopExists(spark, s"$path/tombstones"))
        cells0.join(broadcast(spark.read.schema(StructType(
            cellsSchema.fields.filter(_.name == "corpus_id")))
          .parquet(s"$path/tombstones")), Seq("corpus_id"), "left_anti")
      else cells0
    Index(spark.read.schema(schemaOf("centroidsSchema"))
        .parquet(s"$path/centroids"), cells,
      meta("nlist").toInt, meta("seed").toLong)
  }

  /** Delete vectors without rewriting cells: tombstone ids filtered out
    * by [[load]]. */
  def remove(ids: DataFrame, path: String): Unit =
    ids.toDF("corpus_id").write.mode("append").parquet(s"$path/tombstones")

  /** Nearest-centroid assignment from the centroid TABLE (no model
    * object needed — works on a loaded index). r14: MAP-ONLY — the
    * centroid table is nlist rows (driver-bounded by construction), so
    * it collects into a literal array and the argmin runs per row as a
    * codegen expression; the former crossJoin + min-struct groupBy
    * shuffled the whole corpus (with its vectors) through an exchange
    * just to pick each row's nearest of nlist cells. Distance float
    * tree and the lowest-cell tie-break are unchanged (array_position
    * returns the FIRST minimum in cell order). */
  /** Above this nlist the literal-struct `least()` expression tree gets
    * big enough to risk codegen method/constant-pool limits (the
    * silent fall-back to interpreted evaluation is the exact §4
    * anti-pattern — r14-VERDICT #4); the broadcast-join + min-struct
    * aggregate shape below takes over. 256 centroids x dim<=~1k doubles
    * is comfortably inside codegen's splitting budget. */
  private val MapOnlyAssignMaxCells = 256

  def assign(df: DataFrame, index: Index, vecCol: String, idCol: String): DataFrame = {
    val v = df.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val centRows = index.centroids.select(col("cell"), col("__cv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    if (centRows.isEmpty) return v.filter(lit(false)).withColumn("cell", lit(0))
    if (centRows.length > MapOnlyAssignMaxCells) {
      // large-nlist fall-back: broadcast the centroid table and reduce
      // per row with a min-struct aggregate (same lexicographic
      // (d2, cell) order = same lowest-cell tie-break). Keyed by
      // corpus_id — unique by the index contract (load/remove already
      // treat it as the vector key).
      return v.crossJoin(broadcast(index.centroids.select(col("cell"),
          col("__cv"))))
        .groupBy(col("corpus_id"))
        .agg(first("cv").as("cv"),
          min(struct((dp(col("cv"), col("cv")) - lit(2.0) *
            dp(col("cv"), col("__cv")) + dp(col("__cv"), col("__cv")))
            .as("d2"), col("cell").as("cell"))).as("__best"))
        .select(col("corpus_id"), col("cv"), col("__best.cell").as("cell"))
    }
    // least() over per-centroid (d2, cell) structs: plain codegen
    // expressions (NOT a higher-order transform(), which plans as an
    // interpreted lambda — the engine's no-interpreted-lambda contract,
    // SimilaritySpec). Lexicographic struct order = min d2, lowest cell
    // on ties — the former min-struct aggregate's exact semantics.
    val structs = centRows.map { case (cellId, vec) =>
      val cc = typedLit(vec)
      struct((dp(col("cv"), col("cv")) - lit(2.0) * dp(col("cv"), cc) +
        dp(cc, cc)).as("d2"), lit(cellId).as("cell"))
    }
    val best = if (structs.length == 1) structs.head else least(structs: _*)
    v.withColumn("cell", best.getField("cell"))
      .select("corpus_id", "cv", "cell")
  }

  /** Assign new vectors to the existing centroids and append their cell
    * files — no refit, no rewrite of existing cells. */
  def append(newVecs: DataFrame, index: Index, path: String,
             vecCol: String, idCol: String): Unit =
    assign(newVecs, index, vecCol, idCol)
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")

  /** Per-query centroid distances (query_id, cell, __d2) off the
    * broadcast centroid table — the probe-selection input. */
  private def queryCellDistances(index: Index, q: DataFrame): DataFrame =
    q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"), col("cell"),
        (dp(col("qv"), col("qv")) - lit(2.0) * dp(col("qv"), col("__cv")) +
          dp(col("__cv"), col("__cv"))).as("__d2"))

  /** The n nearest cells per query by a score column (asc, cell-id
    * tie-break) — the probe-selection reduction, routed through the
    * bounded-state [[Similarity.topKPerQuery]] aggregate rather than a
    * `row_number` window: the per-query stream is nlist rows (index
    * metadata, not corpus data), but the aggregate still truncates to
    * nprobe per query before the shuffle — nlist/nprobe (often 64x)
    * fewer shuffled rows, and no per-group sort. */
  private def nearestCells(qCells: DataFrame, n: Int,
                           score: String = "__d2"): DataFrame =
    Similarity.topKPerQuery(
      qCells.select(col("query_id"), col("cell").as("corpus_id"), col(score)),
      n, score = score, smallerIsBetter = true)
      .select(col("query_id"), col("corpus_id").as("cell"))

  /** Exact cosine re-rank of the probed cells — shared scoring tail: a
    * broadcast probe join into the cells (DPP-pruned on a loaded
    * index), codegen dot products, salted top-k. */
  private def scoreProbes(index: Index, q: DataFrame, probes: DataFrame,
                          k: Int): DataFrame = {
    val qp = q.join(probes, "query_id")
      .withColumn("__qn", sqrt(dp(col("qv"), col("qv"))))
    val scored = index.cells.withColumn("__cn", sqrt(dp(col("cv"), col("cv"))))
      .join(broadcast(qp), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("cell").as("__cell"),
        (dp(col("cv"), col("qv")) / (col("__cn") * col("__qn"))).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Top-k cosine against the index: nprobe nearest cells per query
    * (broadcast centroids), then a broadcast probe join into the cells —
    * on a loaded index the probe prunes to the matching cell
    * DIRECTORIES (dynamic partition pruning), so disk reads scale with
    * nprobe/nlist, not corpus size. */
  def topK(index: Index, queries: DataFrame, vecCol: String, idCol: String,
           k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probes = nearestCells(queryCellDistances(index, q), nprobe)
    scoreProbes(index, q, probes, k).drop("__cell")
  }

  /** Centroid k-NN adjacency (cell, nbr): each cell's `degree` nearest
    * sibling centroids by squared distance. DRIVER-built — the centroid
    * table is nlist rows by contract (the guard keeps the O(nlist^2)
    * loop honest); ships as a broadcast table to the probe join. */
  def centroidGraph(index: Index, degree: Int = 4): DataFrame = {
    val cents = index.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    require(cents.length <= 8192,
      s"centroid graph is driver-built over nlist^2 pairs; nlist ${cents.length} too large")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val spark = index.centroids.sparkSession
    import spark.implicits._
    cents.flatMap { case (c, v) =>
      cents.iterator.filter(_._1 != c)
        .map { case (c2, v2) => (c2, d2(v, v2)) }.toSeq
        .sortBy { case (c2, d) => (d, c2) }.take(degree)
        .map { case (c2, _) => (c, c2) }
    }.toSeq.toDF("cell", "nbr")
  }

  /** Per-cell RADIUS (90th-percentile member distance to the centroid)
    * — the extent signal centroid distance lacks: a stretched cell can
    * hold near neighbors while its centroid ranks far. One aggregate
    * pass over the cells; cache it if probing repeatedly. */
  private[ops] def cellRadii(index: Index): DataFrame =
    index.cells.join(broadcast(index.centroids), "cell")
      .select(col("cell"), sqrt(dp(col("cv"), col("cv")) -
        lit(2.0) * dp(col("cv"), col("__cv")) +
        dp(col("__cv"), col("__cv"))).as("__r"))
      .groupBy("cell")
      .agg(percentile_approx(col("__r"), lit(0.9), lit(1000)).as("__radius"))

  /** Graph-expanded probe selection (cell, __pr) at an EQUAL probe
    * budget — visible for the budget spec. Default slot policy: reserve
    * ONE probe slot for adjacency when the budget allows (nprobe >= 3),
    * none below — a parameter sweep over anisotropic fixtures showed
    * wider expansion displaces too many globally-near cells. The
    * expansion slot ranks candidates by distance to the cell SURFACE
    * (centroid distance minus cell radius), not the centroid: that is
    * precisely the signal that finds a stretched boundary cell whose
    * centroid ranks far. */
  private[ops] def graphProbes(index: Index, q: DataFrame, nprobe: Int,
                               degree: Int, expandSlots: Int = -1): DataFrame = {
    val qCells = queryCellDistances(index, q)
    val expand = if (expandSlots >= 0) math.min(expandSlots, nprobe - 1)
                 else if (nprobe >= 3) 1 else 0
    val p1 = math.max(1, nprobe - expand)
    val seeds = nearestCells(qCells, p1)
    if (nprobe - p1 <= 0) seeds
    else {
      // neighbor cells of the seed set that are NOT themselves seeds,
      // ranked by surface distance; the budget remainder goes to the
      // best of them
      val nbrs = nearestCells(
        seeds.join(broadcast(centroidGraph(index, degree)), "cell")
          .select(col("query_id"), col("nbr").as("cell")).distinct()
          .join(seeds, Seq("query_id", "cell"), "left_anti")
          .join(qCells, Seq("query_id", "cell"))
          .join(broadcast(cellRadii(index)), "cell")
          .withColumn("__surf",
            greatest(lit(0.0), sqrt(col("__d2")) - col("__radius"))),
        nprobe - p1, score = "__surf")
      seeds.unionByName(nbrs)
    }
  }

  /** HNSW-flavored refinement of [[topK]] at the SAME probe budget:
    * all but one probe slot go to the globally nearest cells, the last
    * to the best GRAPH NEIGHBOR of those cells (centroid k-NN
    * adjacency) when nprobe >= 3. Near a cell boundary the true
    * neighbors can sit in a cell whose centroid is not among the nprobe
    * nearest — adjacency reaches it, pure centroid ranking doesn't, so
    * recall >= plain IVF at equal cells read (measured across an
    * anisotropic-fixture sweep: ties everywhere, a strict win on
    * stretched clusters; AnnIndexSpec pins budget and recall).
    * Scale shape is [[topK]]'s: broadcast centroids + broadcast graph,
    * DPP-pruned cell reads, codegen scoring. */
  def graphTopK(index: Index, queries: DataFrame, vecCol: String, idCol: String,
                k: Int, nprobe: Int = 4, degree: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    scoreProbes(index, q, graphProbes(index, q, nprobe, degree), k).drop("__cell")
  }

  /** Phase-2 probe set for [[twoPhaseTopK]] — exposed for the budget
    * spec. Expansion candidates are graph neighbors of the cells that
    * actually PRODUCED phase-1 top-k candidates (the feedback signal
    * [[graphProbes]] lacks: static expansion spends its slot on the
    * seed set's neighborhood even when one seed cell supplied every
    * candidate), minus already-probed seeds, ranked by surface
    * distance. At most `expand` cells per query — phase 1 reads
    * `nprobe - expand`, so the total cells-read budget stays `nprobe`. */
  private[ops] def feedbackProbes(index: Index, qCells: DataFrame,
                                  phase1: DataFrame, seeds: DataFrame,
                                  degree: Int, expand: Int): DataFrame = {
    nearestCells(
      phase1.select(col("query_id"), col("__cell").as("cell")).distinct()
        .join(broadcast(centroidGraph(index, degree)), "cell")
        .select(col("query_id"), col("nbr").as("cell")).distinct()
        .join(seeds, Seq("query_id", "cell"), "left_anti")
        .join(qCells, Seq("query_id", "cell"))
        .join(broadcast(cellRadii(index)), "cell")
        .withColumn("__surf",
          greatest(lit(0.0), sqrt(col("__d2")) - col("__radius"))),
      expand, score = "__surf")
  }

  /** Candidate-feedback two-phase probing at the SAME total budget as
    * [[topK]]/[[graphTopK]]: phase 1 scores the `nprobe - expandSlots`
    * nearest cells; the expansion slots then go to graph neighbors of
    * the cells the phase-1 top-k actually CAME FROM (surface-distance
    * ranked, seeds excluded), and both phases' candidates re-rank into
    * one top-k. Where [[graphTopK]] expands the geometric seed
    * neighborhood blindly, this is the beam-search step of graph ANN:
    * expansion follows observed candidate quality, which matters
    * exactly when one boundary cell supplies the candidates and its far
    * side holds the rest. Cells partition the corpus and phase 2
    * anti-joins the seed set, so no candidate is scored twice; scale
    * shape is [[topK]]'s (broadcast centroids/graph/radii, DPP-pruned
    * cell reads, codegen scoring) run twice. */
  def twoPhaseTopK(index: Index, queries: DataFrame, vecCol: String, idCol: String,
                   k: Int, nprobe: Int = 4, degree: Int = 4,
                   expandSlots: Int = 1): DataFrame =
    twoPhaseTopKCells(index, queries, vecCol, idCol, k, nprobe, degree,
      expandSlots).drop("__cell")

  /** [[twoPhaseTopK]] keeping each candidate's source cell (`__cell`) —
    * the spec asserts the distinct-source-cells budget on it. */
  private[ops] def twoPhaseTopKCells(index: Index, queries: DataFrame,
                                     vecCol: String, idCol: String, k: Int,
                                     nprobe: Int, degree: Int,
                                     expandSlots: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val expand = math.min(math.max(expandSlots, 0), nprobe - 1)
    val p1 = nprobe - expand
    val qCells = queryCellDistances(index, q)
    val seeds = nearestCells(qCells, p1)
    val phase1 = scoreProbes(index, q, seeds, k)
    if (expand == 0) phase1
    else {
      val nbrs = feedbackProbes(index, qCells, phase1, seeds, degree, expand)
      val phase2 = scoreProbes(index, q, nbrs, k)
      topKPerQuery(phase1.drop("rank").unionByName(phase2.drop("rank")), k)
    }
  }
}
