package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the misra_gries aggregate's one contract: the retained set is a
  * superset of every item with frequency > n/(k+1), at any k, under any
  * partitioning (map-side partials + merges included), with at most k
  * items retained. */
class MisraGriesSpec extends SparkSpec {

  private def retained(items: Seq[String], k: Int, parts: Int): Set[String] = {
    import spark.implicits._
    items.toDF("s").repartition(parts)
      .agg(call_function("misra_gries", col("s"), lit(k)).as("c"))
      .head().getSeq[String](0).toSet
  }

  test("guarantee: every item above n/(k+1) survives, any k and partitioning") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4; k <- Seq(2, 5, 9)) {
      // skewed stream over 40 ids (min of two uniforms)
      val items = Seq.fill(2000)("it" + math.min(rnd.nextInt(40), rnd.nextInt(40)))
      val n = items.size
      val counts = items.groupBy(identity).map { case (s, l) => s -> l.size }
      val heavy = counts.filter(_._2.toLong * (k + 1) > n).keySet
      val got = retained(items, k, parts = 1 + rnd.nextInt(7))
      assert(heavy.subsetOf(got), s"k=$k lost ${heavy -- got}")
      assert(got.size <= k, s"k=$k retained ${got.size}")
    }
  }

  test("vocab far beyond k: heavy survivor plus at most k-1 extras") {
    // 400 singletons (vocab >> k) cannot evict the 200-count majority
    val stream = scala.util.Random.shuffle(
      (1 to 400).map(i => s"rare$i") ++ Seq.fill(200)("big"))
    val got = retained(stream, k = 4, parts = 5)
    assert(got.contains("big"))
    assert(got.size <= 4)
  }

  test("nulls ignored; empty input yields an empty array; output sorted") {
    import spark.implicits._
    val withNulls = Seq(Some("b"), None, Some("a"), Some("b"), None)
      .toDF("s")
    val arr = withNulls.agg(call_function("misra_gries", col("s"), lit(10)))
      .head().getSeq[String](0)
    assert(arr == Seq("a", "b"))                 // sorted, no nulls
    val empty = spark.range(0).select(col("id").cast("string").as("s"))
      .agg(call_function("misra_gries", col("s"), lit(3)))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }
}
