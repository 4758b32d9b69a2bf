package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the grid kNN's occupancy-adaptive width (r8): on CLUMPY data —
  * tight clusters far apart, the shape replicated key spaces and
  * multi-tenant ids produce — the global z-scale inflates the std, a
  * start width sized by [[Neighbors.autoWidth]] collapses every row into
  * a handful of cells, and the candidate join goes quadratic (measured
  * at sf1: 1.5M rows / 55 cells = 6.3e11 pairs). adaptiveWidth measures
  * the row-weighted occupancy and shrinks the width until the candidate
  * count is linear again, while knnJoin keeps returning correct
  * neighbors (the clusters are internally dense, so k-NN lives within a
  * clump). */
class NeighborsSpec extends SparkSpec {

  /** 10 clumps of 1000 points each, clump centers 1e6 apart, intra-clump
    * spread 1e3 — the sf1 replica's key-space shape in miniature, at a
    * clump-to-cell ratio extreme enough to exercise the stall-escape
    * (the whole clump rides in one cell until w < 3.4e-4 scaled). */
  private def clumpy = {
    import spark.implicits._
    val rows = for {
      clump <- 0 until 10
      j <- 0 until 1000
    } yield (clump * 1000L + j,
      clump * 1.0e6 + (j * 37 % 1000) * 1.0,
      clump * 1.0e6 + (j * 53 % 1000) * 1.0)
    rows.toDF("id", "x", "y")
  }

  test("adaptiveWidth shrinks a collapsed grid to linear occupancy") {
    val df = clumpy
    val params = Neighbors.scaleParams(df, Seq("x", "y"))
    val scaled = Neighbors.withScaled(df, params)
    val start = Neighbors.autoWidth(10000) // assumes unimodal spread
    val refined = Neighbors.adaptiveWidth(scaled, 2, start)
    assert(refined < start / 100,
      s"refined $refined did not escape the clump-wide-cell stall from $start")
    // measured occupancy at the refined width is near the target
    val occ = scaled.select(
        floor(col("__f0") / refined).as("c1"),
        floor(col("__f1") / refined).as("c2"))
      .groupBy("c1", "c2").count()
      .agg((sum(col("count") * col("count")) / sum(col("count"))))
      .head().getDouble(0)
    assert(occ <= 4.0 * 64, s"row-weighted occupancy still $occ")
  }

  test("adaptiveWidth is a no-op on well-spread data and on empty frames") {
    import spark.implicits._
    val uniform = (0 until 2000).map(i =>
      (i.toLong, (i * 37 % 2000).toDouble, (i * 53 % 2000).toDouble))
      .toDF("id", "x", "y")
    val scaled = Neighbors.withScaled(uniform,
      Neighbors.scaleParams(uniform, Seq("x", "y")))
    val start = Neighbors.autoWidth(2000)
    assert(Neighbors.adaptiveWidth(scaled, 2, start) == start)
    val empty = scaled.filter(lit(false))
    assert(Neighbors.adaptiveWidth(empty, 2, start) == start)
  }

  test("knnJoin on clumpy data: adaptive grid still finds the exact neighbors") {
    val df = clumpy
    val params = Neighbors.scaleParams(df, Seq("x", "y"))
    val scaled = Neighbors.withScaled(df, params)
    val approx = Neighbors.knnJoin(scaled, scaled, "id", 3,
      Neighbors.autoWidth(2000))
    val exact = Neighbors.knnJoin(scaled, scaled, "id", 3, 0.0)
    val a = approx.select("l_id", "nbr_rank", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val e = exact.select("l_id", "nbr_rank", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // intra-clump structure is dense, clumps are 1e6 apart: every true
    // nearest neighbor is within the refined grid's probe reach
    val agree = e.keys.count(k => a.get(k).contains(e(k)))
    assert(agree >= (e.size * 0.98).toInt, s"$agree of ${e.size} agree")
  }

  test("knnSelfJoin is bit-identical to knnJoin(df, df) at half the pair work") {
    val df = clumpy
    val params = Neighbors.scaleParams(df, Seq("x", "y"))
    val scaled = Neighbors.withScaled(df, params)
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("l_id", "nbr_rank", "nbr_id", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (k <- Seq(1, 3)) {
      val w = Neighbors.autoWidth(10000)
      val both = rows(Neighbors.knnJoin(scaled, scaled, "id", k, w))
      val self = rows(Neighbors.knnSelfJoin(scaled, "id", k, w))
      assert(self == both, s"k=$k: half-space self-join diverged")
      // exact mode delegates unchanged (deterministic subset, not limit)
      val sub = scaled.filter(col("id") < 200)
      assert(rows(Neighbors.knnSelfJoin(sub, "id", k, 0.0)) ==
        rows(Neighbors.knnJoin(sub, sub, "id", k, 0.0)))
    }
  }

  test("knnJoinExact is bit-identical to brute exact on uniform, clumpy, " +
    "and sparse-fallback shapes (grid ring bound + fallback fringe)") {
    import spark.implicits._
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("l_id", "nbr_rank", "nbr_id", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // deterministic pseudo-random spread + planted exact-distance TIES
    // (duplicate coordinates) so the (dist asc, id asc) tie-break is
    // actually exercised across the grid/brute boundary
    val pts = (0 until 3000).map { i =>
      val base = i % 2800 // last 200 rows duplicate earlier coordinates
      (i.toLong, (base * 7919 % 2801).toDouble, (base * 6271 % 2801).toDouble)
    }
    val frames = Map(
      "uniform" -> pts.toDF("id", "x", "y"),
      "clumpy" -> clumpy,
      // 2 dense blobs + isolated far outliers: outliers have < k donors
      // in any ring and MUST take the fallback path
      "sparse" -> ((0 until 1400).map(i =>
          (i.toLong, (i % 700) * 1.0, (i * 13 % 700) * 1.0)) ++
        (0 until 5).map(i => (2000L + i, 1e9 + i * 1e8, -1e9 - i * 1e8)))
        .toDF("id", "x", "y"))
    for ((name, df) <- frames; k <- Seq(1, 5, 20)) {
      val scaled = Neighbors.withScaled(df,
        Neighbors.scaleParams(df, Seq("x", "y")))
      val probes = scaled.filter(col("id") % 3 === 0)
      val brute = rows(Neighbors.knnJoin(probes, scaled, "id", k, 0.0))
      val accel = rows(Neighbors.knnJoinExact(probes, scaled, "id", k))
      assert(accel == brute, s"$name k=$k: grid-exact diverged from brute")
    }
  }
}
