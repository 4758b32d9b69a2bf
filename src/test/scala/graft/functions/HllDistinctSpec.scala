package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HllDistinctSpec extends SparkSpec {

  test("hash60 equals the engine-wide md5-prefix recipe") {
    import spark.implicits._
    val vals = Seq("", "a", "hello world", "Ünïcødé ✓")
    val viaSql = vals.toDF("s")
      .select(col("s"), conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long").as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(HllDistinct.hash60(v) == viaSql(v), s"hash mismatch for '$v'")
    }
  }

  test("rho: first-set-bit position, zero field, hand values") {
    assert(HllDistinct.rho(1L << 50, 51) == 1)
    assert(HllDistinct.rho(1L << 49, 51) == 2)
    assert(HllDistinct.rho(1L, 51) == 51)
    assert(HllDistinct.rho(0L, 51) == 52)
    assert(HllDistinct.rho((1L << 50) | 1L, 51) == 1, "highest bit wins")
  }

  test("estimate within HLL error bounds; linear counting for small sets") {
    import spark.implicits._
    val big = spark.range(0, 10000).select(concat(lit("v"), col("id")).as("s"))
    val est = big.agg(call_function("hll_distinct", col("s"), lit(9)))
      .head().getDouble(0)
    assert(math.abs(est - 10000) / 10000 < 0.12,
      s"p=9 (se ~4.6%) estimate too far: $est")   // ~2.5 sigma
    val small = (0 until 1000).map(i => s"k${i % 30}").toDF("s")
    val estSmall = small.agg(call_function("hll_distinct", col("s"), lit(9)))
      .head().getDouble(0)
    assert(math.abs(estSmall - 30) < 3, s"linear counting regime: $estSmall")
  }

  test("partition-independent: registers are order-free, merge is max") {
    import spark.implicits._
    val data = spark.range(0, 5000).select(concat(lit("x"), col("id")).as("s"))
    def run(parts: Int): Double =
      data.repartition(parts)
        .agg(call_function("hll_distinct", col("s"), lit(9)))
        .head().getDouble(0)
    assert(run(1) == run(8) && run(8) == run(32),
      "estimate must be bit-identical under any partitioning")
  }

  test("per-group aggregation and SQL callability") {
    import spark.implicits._
    val df = (0 until 900).map(i => (s"g${i % 3}", s"t${i % (10 * (i % 3 + 1))}"))
      .toDF("g", "t")
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT g, hll_distinct(t, 9) FROM hll_in GROUP BY g ORDER BY g")
      .collect().map(_.getDouble(1))
    val viaDf = df.groupBy("g").agg(call_function("hll_distinct", col("t"), lit(9)))
      .orderBy("g").collect().map(_.getDouble(1))
    assert(viaSql.sameElements(viaDf))
    assert(viaSql.forall(_ > 0))
  }
}
