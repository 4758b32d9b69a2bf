package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {

  // y = 3x + bounded deterministic noise in [-5, 5]
  private def frame(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, i.toDouble, 3.0 * i + (((i * 37) % 11) - 5.0))
    }.toDF("id", "x", "y")
  }

  private val split = when(col("id") % 10 < 6, 0)
    .when(col("id") % 10 < 8, 1).otherwise(2)

  test("splitConformal: constant symmetric radius, bounded by the noise") {
    val out = Conformal.splitConformal(frame(300), "y", "x", split,
        Seq("id"), lambda = 0.1)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.length == 60)                      // id % 10 in {8, 9}
    val widths = out.map { case (_, _, lo, hi) => hi - lo }
    // one q-hat for every row: widths equal up to the two roundings
    assert(widths.max - widths.min < 3e-4)
    // the radius is a calibration residual, so it can't exceed the
    // worst residual: noise span 10 plus the shrinkage/intercept drift
    assert(widths.max / 2 < 8.0)
    assert(out.forall { case (_, p, lo, hi) => lo < p && p < hi })
  }

  test("splitConformal: ~level coverage on held-out rows") {
    val df = frame(1000)
    val got = Conformal.splitConformal(df, "y", "x", split, Seq("id"),
      lambda = 0.1)
    val joined = got.join(df, "id")
    val n = joined.count().toDouble
    val covered = joined
      .filter(col("y") >= col("lo") && col("y") <= col("hi")).count()
    assert(covered / n >= 0.85)                  // level = 0.9 marginal
  }

  test("splitConformal: lower level gives a narrower interval; deterministic") {
    val df = frame(400)
    def width(level: Double) =
      Conformal.splitConformal(df, "y", "x", split, Seq("id"),
          lambda = 0.1, level = level)
        .select((col("hi") - col("lo")).as("w")).head().getDouble(0)
    assert(width(0.5) <= width(0.9))
    val a = Conformal.splitConformal(df.repartition(1), "y", "x", split,
      Seq("id"), lambda = 0.1).collect().sortBy(_.getLong(0)).toSeq
    val b = Conformal.splitConformal(df.repartition(13), "y", "x", split,
      Seq("id"), lambda = 0.1).collect().sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }
}
