package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvMinHashesSpec extends SparkSpec {

  test("returns the k smallest DISTINCT hashes ascending; dups don't inflate") {
    import spark.implicits._
    val vals = (0 until 500).map(i => s"v${i % 100}")   // 100 distinct, 5x dups
    val got = vals.toDF("s")
      .agg(call_function("kmv_minhashes", col("s"), lit(16)))
      .head().getSeq[Long](0)
    val expected = (0 until 100).map(i => HllDistinct.hash60(s"v$i"))
      .distinct.sorted.take(16)
    assert(got == expected)
    // fewer distinct values than k: sketch holds them all
    val small = Seq("a", "b", "a").toDF("s")
      .agg(call_function("kmv_minhashes", col("s"), lit(16)))
      .head().getSeq[Long](0)
    assert(small == Seq("a", "b").map(HllDistinct.hash60).sorted)
  }

  test("partition-invariant and SQL-callable") {
    import spark.implicits._
    val data = spark.range(0, 3000).select(concat(lit("k"), col("id")).as("s"))
    def run(parts: Int): Seq[Long] =
      data.repartition(parts)
        .agg(call_function("kmv_minhashes", col("s"), lit(64)))
        .head().getSeq[Long](0)
    assert(run(1) == run(16), "bottom-k of a set is order-free")
    data.createOrReplaceTempView("kmv_in")
    assert(spark.sql("SELECT kmv_minhashes(s, 64) FROM kmv_in")
      .head().getSeq[Long](0) == run(1))
  }

  test("(k-1)/theta estimates cardinality within bounds") {
    import spark.implicits._
    val n = 20000
    val mins = spark.range(0, n).select(concat(lit("u"), col("id")).as("s"))
      .agg(call_function("kmv_minhashes", col("s"), lit(256)))
      .head().getSeq[Long](0)
    val est = 255.0 / (mins(255).toDouble / math.pow(2.0, 60))
    assert(math.abs(est - n) / n < 0.2, s"estimate $est for $n")
  }
}
