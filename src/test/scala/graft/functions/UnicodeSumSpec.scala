package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnicodeSumSpec extends SparkSpec {

  test("unicode_sum matches the higher-order aggregate form") {
    import spark.implicits._
    val df = Seq("abc", "", "hello world", "a b").toDF("s")
    val both = df.select(
      call_function("unicode_sum", col("s")).as("native"),
      aggregate(split(col("s"), ""), lit(0L), (acc, ch) => acc + ascii(ch)).as("ho"))
    assert(both.filter(col("native") =!= col("ho")).count() == 0)
  }

  test("unicode_sum handles code points beyond ASCII and nulls") {
    import spark.implicits._
    val df = Seq(Some("é"), Some("世界"), None).toDF("s")
    val out = df.select(call_function("unicode_sum", col("s"))).collect()
    assert(out(0).getLong(0) == 0xe9L)
    assert(out(1).getLong(0) == 0x4e16L + 0x754cL)
    assert(out(2).isNullAt(0))
  }

  test("unicode_sum participates in whole-stage codegen") {
    // a local Seq collapses to LocalTableScan; range() keeps a real plan
    val plan = spark.range(100)
      .select(call_function("unicode_sum", col("id").cast("string")))
      .queryExecution.executedPlan.toString
    // the starred prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [unicode_sum"), plan)
  }
}
