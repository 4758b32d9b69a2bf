package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Lloyd k-means with a GRID-PRUNED assignment step (r12 VERDICT
  * task #7) — built for the b4 ClusterCentroids regime, where k is
  * corpus-sized (k = minority count, 75k at sf1) and MLlib's assign
  * step is a flat O(rows * k * d) distance scan per iteration
  * (1.4M x 75k x 10 iterations = 1e12 flops, the measured 19 s floor).
  *
  * Shape per iteration (the IVF-assign idea applied to Lloyd):
  *   - centroids live DRIVER-SIDE (k x d doubles, <= ~5 MB) and are
  *     broadcast as a cell-hash grid over the two HIGHEST-VARIANCE
  *     centroid dims, re-picked each iteration (r13 VERDICT #3 — a
  *     near-constant first column would have degraded dims 0/1 to
  *     brute; cell width w from a measured-occupancy refinement,
  *     computed on the driver at zero Spark jobs);
  *   - one `mapPartitions` pass assigns every row to its EXACT nearest
  *     centroid by progressive ring search: scan the (2r+1)^2 cell
  *     block, and stop as soon as the best distance <= r*w — any
  *     centroid outside the block differs by > r cells in a gridded
  *     dim, so its full euclidean distance is STRICTLY > r*w and it
  *     cannot displace the incumbent (the knnJoinExact ring bound,
  *     `Neighbors.scala:285`). Rows that exhaust the ring cap fall back
  *     to a brute scan of the in-memory centroid array — exact on any
  *     density shape;
  *   - partial (count, sum) per centroid fold map-side inside the same
  *     pass, so the ONLY shuffle per iteration is k-sized partials
  *     through `reduceByKey` (the MLlib aggregation pattern, minus the
  *     per-row distance scan).
  *
  * So each Lloyd iteration is ONE job over the cached row RDD touching
  * ~(ring occupancy) centroids per row instead of all k — at sf1 this
  * is ~36 candidates vs 75,000. Empty clusters keep their previous
  * position (MLlib parity: `clusterCenters` always returns k rows).
  * Init is the seeded "random" mode: k rows picked by a deterministic
  * md5 hash order of the feature values, reproducible across runs and
  * partitionings.
  *
  * RDD + mapPartitions is deliberate here (the "genuine per-partition
  * imperative logic" exception): the declarative alternative (explode
  * 9 probe cells + shuffle join + top-k aggregate, i.e. knnJoin) pays
  * a 9x row-shuffle and a join PER ITERATION; the broadcast grid pays
  * none. Reference behavior: B4
  * (`data_balancing_list_method_logic.py:35-43`) requires the k
  * centroids as rows; distances are plain euclidean over the raw
  * (unscaled) features, matching the former MLlib fit.
  */
object GridKMeans {

  private val RING_CAP = 8 // beyond this, brute-scan the centroid array

  /** Fit k centroids on `features` (cast to double; rows with any
    * null/NaN feature are skipped — VectorAssembler handleInvalid=skip
    * parity). Returns exactly k centroids in feature order. */
  def fit(df: DataFrame, features: Seq[String], k: Int, seed: Long = 42L,
          maxIter: Int = 10): Array[Array[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    val d = features.size
    val proj = df.select(features.map(c => col(c).cast("double")): _*)
      .filter(features.map(c => col(c).isNotNull && !isnan(col(c)))
        .reduce(_ && _))
    val data = proj.rdd.map { r =>
      Array.tabulate(d)(i => r.getDouble(i))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seeded deterministic init: k rows in md5-hash order of their
      // values (ties share values, so any tie pick is the same point)
      val hashed = proj.withColumn("__h",
        Neighbors.detUniform(seed, features.map(col): _*))
      val init = hashed
        .orderBy((col("__h") +: features.map(col)): _*).limit(k)
        .collect().map(r => Array.tabulate(d)(i => r.getDouble(i)))
      require(init.nonEmpty, "k-means fit on an empty (or all-null) frame")
      // < k rows: pad by CYCLING the distinct init rows (r13 ADVICE) —
      // the former pad-with-head froze every clone at one point (ties
      // resolve to the lowest cid, so duplicate centroids never
      // separate); cycling spreads the duplicates over the observed
      // points. Duplicates still tie to the lowest cid (k > distinct
      // rows forces SOME frozen clones — MLlib keeps k centers too).
      var cents = if (init.length >= k) init
      else init ++ Array.tabulate(k - init.length)(i => init(i % init.length).clone())
      val sc = df.sparkSession.sparkContext
      var iter = 0
      var moved = true
      while (iter < maxIter && moved) {
        // grid the two highest-variance dims of the CURRENT centroids
        // (r13 VERDICT #3): hard-coded dims 0/1 degraded to brute (exact
        // but silently slow) whenever the caller's first columns were
        // near-constant. Driver-side over the k x d array — free.
        val (d0, d1) = gridDims(cents)
        val w = gridWidth(cents, d0, d1)
        val grid = buildGrid(cents, w, d0, d1)
        val bc = sc.broadcast((cents, grid, w))
        val partials = data.mapPartitions { rows =>
          val (cs, g, wid) = bc.value
          val acc = new java.util.HashMap[Int, (Long, Array[Double])]()
          rows.foreach { x =>
            val cid = nearest(x, cs, g, wid, d0, d1)
            val cur = acc.get(cid)
            if (cur == null) {
              val s = x.clone()
              acc.put(cid, (1L, s))
            } else {
              val (n, s) = cur
              var i = 0
              while (i < s.length) { s(i) += x(i); i += 1 }
              acc.put(cid, (n + 1L, s))
            }
          }
          import scala.jdk.CollectionConverters._
          acc.entrySet().iterator().asScala
            .map(e => (e.getKey, e.getValue))
        }.reduceByKey { (a: (Long, Array[Double]), b: (Long, Array[Double])) =>
          val s = a._2.clone()
          var i = 0
          while (i < s.length) { s(i) += b._2(i); i += 1 }
          (a._1 + b._1, s)
        }.collect()
        bc.destroy()
        val next = cents.map(_.clone())
        partials.foreach { case (cid, (n, s)) =>
          var i = 0
          while (i < d) { next(cid)(i) = s(i) / n; i += 1 }
        }
        moved = !next.indices.forall(i =>
          java.util.Arrays.equals(next(i), cents(i)))
        cents = next
        iter += 1
      }
      cents
    } finally data.unpersist(blocking = false)
  }

  /** Per-dim centroid standard deviation — shared by [[gridDims]] and
    * [[gridWidth]]. */
  private def stdOf(cents: Array[Array[Double]], i: Int): Double = {
    if (cents.head.length <= i) return 0.0
    val k = cents.length
    val m = cents.map(_(i)).sum / k
    math.sqrt(cents.map(c => (c(i) - m) * (c(i) - m)).sum / k)
  }

  /** The two highest-variance dims of the centroid array (ties: lower
    * index), the grid axes. 1-dim input returns (0, 0) — [[cellOf]]
    * then keys the second component to 0 like the former shape. The
    * ring bound is dim-agnostic: outside the radius-(r-1) block means
    * a > (r-1)*w difference in SOME gridded dim, hence full euclidean
    * distance strictly > (r-1)*w, whichever dims are gridded. */
  private[ops] def gridDims(cents: Array[Array[Double]]): (Int, Int) = {
    val d = cents.head.length
    if (d == 1) return (0, 0)
    var b0 = 0; var b1 = 1
    var s0 = stdOf(cents, 0); var s1 = stdOf(cents, 1)
    if (s1 > s0) { val t0 = b0; b0 = b1; b1 = t0; val ts = s0; s0 = s1; s1 = ts }
    var i = 2
    while (i < d) {
      val s = stdOf(cents, i)
      if (s > s0) { b1 = b0; s1 = s0; b0 = i; s0 = s }
      else if (s > s1) { b1 = i; s1 = s }
      i += 1
    }
    (b0, b1)
  }

  /** Cell width from the DRIVER-SIDE centroid array: start at the
    * unimodal-spread guess and refine by the measured row-weighted
    * occupancy (sum occ^2 / k), exactly `Neighbors.adaptiveWidth`'s
    * statistic computed at zero Spark jobs. Target ~4 centroids/cell
    * (~36 ring candidates — ample for 1-NN). */
  private[ops] def gridWidth(cents: Array[Array[Double]], d0: Int = 0,
                             d1: Int = 1): Double = {
    val k = cents.length
    val target = 4.0
    val spread = math.max(stdOf(cents, d0), stdOf(cents, d1))
    if (spread == 0.0 || k <= 16) return math.max(spread, 1.0) // degenerate: one cell
    var w = 6.0 * spread * math.sqrt(target / k)
    var prev = Double.MaxValue
    var it = 0
    while (it < 5) {
      val occ = new java.util.HashMap[(Long, Long), Long]()
      cents.foreach { c =>
        occ.merge(cellOf(c, w, d0, d1), 1L, (a, b) => a + b)
      }
      import scala.jdk.CollectionConverters._
      val meanOcc = occ.values().asScala.map(n => n.toDouble * n).sum / k
      if (meanOcc <= 4.0 * target) return w
      val shrink = math.sqrt(meanOcc / target)
      w = if (meanOcc > prev * 0.5) w / math.max(shrink, 16.0) else w / shrink
      prev = meanOcc
      it += 1
    }
    w
  }

  private def cellOf(c: Array[Double], w: Double, d0: Int, d1: Int): (Long, Long) =
    (math.floor(c(d0) / w).toLong,
      if (d1 != d0 && c.length > d1) math.floor(c(d1) / w).toLong else 0L)

  private[ops] def buildGrid(cents: Array[Array[Double]], w: Double,
                             d0: Int = 0, d1: Int = 1)
      : java.util.HashMap[(Long, Long), Array[Int]] = {
    val tmp = new java.util.HashMap[(Long, Long),
      scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < cents.length) {
      val key = cellOf(cents(i), w, d0, d1)
      var buf = tmp.get(key)
      if (buf == null) {
        buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        tmp.put(key, buf)
      }
      buf += i
      i += 1
    }
    val out = new java.util.HashMap[(Long, Long), Array[Int]](tmp.size())
    tmp.forEach((key, buf) => out.put(key, buf.toArray))
    out
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** Exact nearest centroid id for `x`: progressive ring search with
    * the r*w bound, brute fallback past RING_CAP. Tie-break: lowest
    * cid (scan order is ascending within cells; cells scanned in a
    * deterministic block order and ties replace only on strictly
    * smaller distance... strictly-smaller + ascending ids per cell is
    * NOT globally id-ordered across cells, so ties compare cid too). */
  private[ops] def nearest(x: Array[Double], cs: Array[Array[Double]],
      g: java.util.HashMap[(Long, Long), Array[Int]], w: Double,
      d0: Int = 0, d1: Int = 1): Int = {
    val cell = cellOf(x, w, d0, d1)
    val cx = cell._1
    val cy = cell._2
    var best = -1
    var bestD = Double.MaxValue
    def scanCell(key: (Long, Long)): Unit = {
      val ids = g.get(key)
      if (ids != null) {
        var i = 0
        while (i < ids.length) {
          val cid = ids(i)
          val dd = sqDist(x, cs(cid))
          if (dd < bestD || (dd == bestD && cid < best)) {
            bestD = dd; best = cid
          }
          i += 1
        }
      }
    }
    scanCell((cx, cy))
    var r = 1L
    while (r <= RING_CAP) {
      // the radius-(r-1) block is done; its bound: best <= (r-1)*w wins
      if (best >= 0 && bestD <= (r - 1) * (r - 1) * w * w) return best
      // scan the radius-r shell (new cells only)
      var dx = -r
      while (dx <= r) {
        if (dx == -r || dx == r) {
          var dy = -r
          while (dy <= r) { scanCell((cx + dx, cy + dy)); dy += 1 }
        } else {
          scanCell((cx + dx, cy - r)); scanCell((cx + dx, cy + r))
        }
        dx += 1
      }
      r += 1
    }
    if (best >= 0 && bestD <= RING_CAP * RING_CAP * w * w) return best
    // sparse fringe: exact brute over the in-memory centroid array
    var cid = 0
    while (cid < cs.length) {
      val dd = sqDist(x, cs(cid))
      if (dd < bestD || (dd == bestD && cid < best)) { bestD = dd; best = cid }
      cid += 1
    }
    best
  }
}
