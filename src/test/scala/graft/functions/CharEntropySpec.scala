package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CharEntropySpec extends SparkSpec {

  test("char_entropy: hand-checked values, -0.0 never emitted, nulls pass") {
    import spark.implicits._
    val df = Seq(Some("aabb"), Some("aaaa"), Some(""), Some("ab"), None).toDF("s")
    val out = df.select(call_function("char_entropy", col("s"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)   // 2 symbols, p=1/2 each
    assert(out(1).getDouble(0) == 0.0)                    // single symbol
    assert(java.lang.Double.doubleToRawLongBits(out(1).getDouble(0)) == 0L,
      "must be +0.0, not -0.0")
    assert(out(2).getDouble(0) == 0.0)                    // empty
    assert(math.abs(out(3).getDouble(0) - 1.0) < 1e-12)
    assert(out(4).isNullAt(0))
    // 4 equiprobable symbols -> 2 bits; surrogate-pair code points count once
    val uni = Seq("ab😀😁").toDF("s")
      .select(call_function("char_entropy", col("s"))).head().getDouble(0)
    assert(math.abs(uni - 2.0) < 1e-12)
  }

  test("char_entropy separates prose from uniform-random and repeated junk") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and runs away"
    val junk = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val rnd = (0 until 64).map(i => ('!' + (i * 37) % 90).toChar).mkString
    val m = Seq(("prose", prose), ("junk", junk), ("rnd", rnd)).toDF("k", "s")
      .select(col("k"), call_function("char_entropy", col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("junk") < 0.5 && m("prose") > 3.0 && m("rnd") > m("prose"))
  }

  test("char_entropy participates in whole-stage codegen") {
    val plan = spark.range(100)
      .select(call_function("char_entropy", col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [char_entropy"), plan)
  }
}
