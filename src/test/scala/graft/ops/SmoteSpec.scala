package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

class SmoteSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  private def classCounts(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("B2 SMOTE: every class exactly at majority size; synth in feature hull") {
    val before = classCounts(orders)
    val majority = before.values.max
    val out = Smote.SmoteOp("o_orderstatus", k = 3, width = 0.25)(orders).persist()
    val after = classCounts(out)
    assert(after.values.forall(_ == majority), after.toString)
    // interpolated points stay inside the per-class min/max hull
    val hull = orders.groupBy("o_orderstatus")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val outside = out.join(hull, "o_orderstatus")
      .filter(col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"))
    assert(outside.count() == 0)
    out.unpersist()
  }

  test("B2 SMOTE is deterministic for a fixed seed") {
    val a = Smote.SmoteOp("o_orderstatus", k = 3, width = 0.25, seed = 9L)(orders)
      .agg(round(sum("o_totalprice"), 2)).first().getDouble(0)
    val b = Smote.SmoteOp("o_orderstatus", k = 3, width = 0.25, seed = 9L)(orders)
      .agg(round(sum("o_totalprice"), 2)).first().getDouble(0)
    assert(a == b)
  }

  test("B2 SMOTE rounded=true yields integral features") {
    val out = Smote.SmoteOp("o_orderstatus", k = 3, width = 0.25, rounded = true)(orders)
    val frac = out.filter(col("o_totalprice") =!= round(col("o_totalprice"))).count()
    assert(frac == 0)
  }

  test("B7 ADASYN: largest-remainder quota fills every class EXACTLY to majority") {
    val before = classCounts(orders)
    val majority = before.values.max
    val after = classCounts(Smote.AdasynOp("o_orderstatus", k = 3, width = 0.25)(orders))
    assert(after.values.forall(_ == majority), after.toString)
  }

  test("B5 NearMiss: every class at minority size") {
    val before = classCounts(orders)
    val out = Smote.NearMissOp("o_orderstatus", width = 0.25)(orders)
    val after = classCounts(out)
    assert(after.values.forall(_ == before.values.min), after.toString)
  }

  test("B9 SMOTE-Tomek / B10 SMOTE-ENN reduce or keep the SMOTE size") {
    val smoteN = Smote.SmoteOp("o_orderstatus", k = 3, width = 0.25)(orders).count()
    val tomekN = Smote.SmoteTomekOp("o_orderstatus", k = 3, width = 0.25)(orders).count()
    val ennN = Smote.SmoteEnnOp("o_orderstatus", k = 3, width = 0.25)(orders).count()
    assert(tomekN <= smoteN && ennN <= smoteN, s"$tomekN / $ennN vs $smoteN")
    assert(tomekN > 0 && ennN > 0)
  }

  test("I5 KNN impute approximate path (width>0) still fills everything") {
    val withNulls = Tables.customer(spark, sf).withColumn("c_acctbal",
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")))
    val out = NnImpute.KnnImpute("c_acctbal",
      features = Seq("c_custkey", "c_nationkey"), k = 3, width = 0.25)(withNulls)
    assert(out.filter(col("c_acctbal").isNull).count() == 0)
  }

  test("I9 model impute fills nulls and preserves complete rows") {
    val withNulls = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")))
    val out = NnImpute.ModelImpute("c_acctbal")(withNulls)
    assert(out.count() == withNulls.count())
    assert(out.filter(col("c_acctbal").isNull).count() == 0)
  }
}
