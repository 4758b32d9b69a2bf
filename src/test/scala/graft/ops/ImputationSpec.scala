package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Q
import graft.ops.Imputation._

class ImputationSpec extends SparkSpec {

  private def li = Q.lineitemWithNulls(spark, sf)

  test("I7 EM impute: fills all nulls, never touches non-null cells") {
    val before = li.persist()
    val out = EmImpute("l_quantity", seed = 42L, maxIter = 3)(before)
    assert(out.filter(col("l_quantity").isNull).count() == 0)
    // non-null cells unchanged: the multiset of values on originally
    // non-null rows (l_linenumber != 3) is preserved exactly
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("l_linenumber") =!= 3)
        .groupBy("l_quantity").count()
    assert(multiset(out).except(multiset(before)).count() == 0)
    assert(multiset(before).except(multiset(out)).count() == 0)
    before.unpersist()
  }

  test("I7 EM impute: filled values track the observed distribution") {
    val obs = li.agg(avg("l_quantity"), stddev("l_quantity")).first()
    val out = EmImpute("l_quantity", seed = 42L, maxIter = 3)(li)
    val post = out.agg(avg("l_quantity"), stddev("l_quantity")).first()
    assert(math.abs(post.getDouble(0) - obs.getDouble(0)) < 1.0)
    assert(math.abs(post.getDouble(1) - obs.getDouble(1)) < 2.0)
  }

  test("I3 mode fill falls back to 'Unknown' on all-null string column") {
    import spark.implicits._
    val df = Seq(("a", null: String), ("b", null: String)).toDF("k", "v")
    val out = FillMode("v")(df)
    assert(out.select("v").collect().forall(_.getString(0) == "Unknown"))
  }

  test("I1 mean fill rejects non-numeric columns") {
    assertThrows[IllegalArgumentException] {
      FillMean("l_returnflag")(li)
    }
  }

  test("I4 interpolate: leading/trailing nulls take nearest value") {
    import spark.implicits._
    val df = Seq(
      (1, 1, null: java.lang.Double), (1, 2, java.lang.Double.valueOf(10.0)),
      (1, 3, null: java.lang.Double), (1, 4, java.lang.Double.valueOf(20.0)),
      (1, 5, null: java.lang.Double)
    ).toDF("g", "i", "x")
    val out = Interpolate("x", orderCols = Seq("i"), partitionBy = Seq("g"))(df)
      .orderBy("i").select("x").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(10.0, 10.0, 15.0, 20.0, 20.0))
  }

  test("I8 MICE picks the best-|corr| predictor, not the first candidate") {
    import spark.implicits._
    // good = 2*y exactly (|corr| = 1); noise is uncorrelated and listed
    // FIRST — preds.head would regress on noise and fill garbage
    val df = Seq(
      (1L, 7.0, 10.0, 20.0), (2L, 3.0, 30.0, 60.0), (3L, 9.0, 20.0, 40.0),
      (4L, 1.0, 50.0, 100.0), (5L, 5.0, 40.0, 80.0))
      .toDF("id", "noise", "y", "good")
      .withColumn("y", when(col("id") === 5L, lit(null)).otherwise(col("y")))
    val out = MiceImpute(targets = Seq("y"), predictors = Seq("noise", "good"),
      maxIter = 1)(df)
    val filled = out.filter(col("id") === 5L).select("y").first().getDouble(0)
    assert(math.abs(filled - 40.0) < 1e-9, s"filled $filled, want 40.0 (= good/2)")
  }
}
