package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r6 multi-column histogram-refinement exact median
  * ([[Relational.exactMedians]]) against the sort-based
  * [[Relational.exactMedian]] oracle — same values, a handful of shared
  * scans instead of per-column sorts. */
class MediansSpec extends SparkSpec {

  test("exactMedians == sort-based exactMedian on random frames (dups, odd/even n)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    for (trial <- 1 to 6) {
      val n = Seq(101, 100, 7, 8, 9999, 3)(trial - 1)
      val rows = (1 to n).map { _ =>
        (rng.nextInt(40).toDouble,                 // heavy duplicates
         rng.nextGaussian() * 1000,                // continuous
         if (rng.nextBoolean()) Some(rng.nextDouble()) else None) // nulls
      }
      val df = rows.toDF("dups", "cont", "holey")
      val fast = Relational.exactMedians(df, Seq("dups", "cont", "holey"),
        bins = 16, collectLimit = 4) // tiny bins/limit force real refinement
      for (c <- Seq("dups", "cont", "holey")) {
        val slow = Relational.exactMedian(df.filter(col(c).isNotNull), c)
        assert(fast(c) == slow, s"trial $trial col $c: ${fast(c)} vs $slow")
      }
    }
  }

  test("exactMedians: constant column, all-null column, single row") {
    import spark.implicits._
    val df = Seq((5.0, Option.empty[Double], 9.0),
                 (5.0, None, 9.0), (5.0, None, 9.0))
      .toDF("const", "nulls", "nine")
    val m = Relational.exactMedians(df, Seq("const", "nulls", "nine"))
    assert(m("const").contains(5.0) && m("nulls").isEmpty && m("nine").contains(9.0))
    val one = Seq(Tuple1(42.0)).toDF("x")
    assert(Relational.exactMedians(one, Seq("x"))("x").contains(42.0))
  }

  test("exactMedians: million-fold duplicate pileup converges (observed-bounds shrink)") {
    import spark.implicits._
    // 90% of the mass is one value inside a wide range — a naive
    // fixed-width refinement would loop on the hot bucket; the observed
    // min/max shrink resolves it in one round
    val df = spark.range(100000)
      .select(when(col("id") % 10 === 0, col("id").cast("double"))
        .otherwise(lit(777.0)).as("x"))
    val m = Relational.exactMedians(df, Seq("x"), collectLimit = 100)
    assert(m("x").contains(777.0), s"got ${m("x")}")
  }

  test("columnStats medians unchanged by the r6 engine swap") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toDouble, (i % 13).toDouble))
      .toDF("a", "b")
    val stats = Relational.columnStats(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(stats("a") == 500.5)
    assert(stats("b") == 6.0)
  }

  test("weightedMedian: heavy weight pulls the median; unit weights " +
    "degrade to the lower median; repartition-invariant") {
    import spark.implicits._
    val heavy = Seq((1L, 1.0, 1.0), (2L, 2.0, 1.0), (3L, 3.0, 1.0),
      (4L, 4.0, 10.0)).toDF("id", "v", "w")
    val Array(r) = Relational.weightedMedian(heavy, "v", "w", Seq("id"))
      .collect()
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) == ((4L, 13.0, 4.0)))

    val unit = Seq((1L, 1.0, 1.0), (2L, 2.0, 1.0), (3L, 3.0, 1.0),
      (4L, 4.0, 1.0)).toDF("id", "v", "w")
    val Array(r2) = Relational.weightedMedian(unit, "v", "w", Seq("id"))
      .collect()
    assert(r2.getDouble(2) == 2.0) // lower median of 1..4

    val Array(r3) = Relational.weightedMedian(heavy.repartition(5),
      "v", "w", Seq("id")).collect()
    assert(r.toSeq == r3.toSeq)
  }

  test("exactValuesAtRanks == sort-based selection at arbitrary rank sets " +
    "(r8 generalization)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 997).map(_ => (rng.nextGaussian() * 500,
      rng.nextInt(25).toDouble))
    val df = rows.toDF("cont", "dups")
    // deciles + extremes + a middle run, per column
    val wanted = Seq(1L, 99L, 100L, 101L, 250L, 500L, 750L, 997L)
    val fast = Relational.exactValuesAtRanks(df, Seq("cont", "dups"),
      (_, n) => wanted, bins = 16, collectLimit = 8)
    for (c <- Seq("cont", "dups")) {
      val sorted = rows.map(r => if (c == "cont") r._1 else r._2).sorted
      val expect = wanted.map(r => r -> sorted((r - 1).toInt)).toMap
      assert(fast(c) == expect, s"col $c diverged from the sorted oracle")
    }
    // out-of-range ranks drop; empty column gives an empty map
    val edge = Relational.exactValuesAtRanks(df.select(col("cont"),
        lit(null).cast("double").as("empty")), Seq("cont", "empty"),
      (c, n) => Seq(0L, 1L, n + 5), bins = 16, collectLimit = 8)
    assert(edge("cont") == Map(1L -> rows.map(_._1).min))
    assert(edge("empty").isEmpty)
  }
}
