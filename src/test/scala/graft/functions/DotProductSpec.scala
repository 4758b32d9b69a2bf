package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  test("dot_product matches the higher-order zip_with/aggregate form") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(0.0, 0.0)),
      (Seq(-1.5, 2.5), Seq(3.0, -4.0))).toDF("a", "b")
    val both = df.select(
      call_function("dot_product", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("ho"))
    assert(both.filter(abs(col("native") - col("ho")) > 1e-12).count() == 0)
  }

  test("dot_product null semantics: null array -> null; null element -> skipped; short side -> overlap") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(5.0), Some(7.0)))),
      (Some(Seq(Some(2.0))), Some(Seq(Some(3.0), Some(9.0))))).toDF("a", "b")
    val out = df.select(call_function("dot_product", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 5.0)  // null element contributes 0
    assert(out(3).getDouble(0) == 6.0)  // length mismatch scores the overlap
  }

  test("dot_product participates in whole-stage codegen") {
    val plan = spark.range(100)
      .select(array(col("id").cast("double")).as("v"))
      .select(call_function("dot_product", col("v"), col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_product"), plan)
  }
}
