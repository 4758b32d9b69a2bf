package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  /** 90% of rows share one hot key. */
  private lazy val skewed = {
    import spark.implicits._
    (1 to 20000).map { i =>
      val k = if (i % 10 == 0) s"key_${i % 7}" else "hot"
      (k, i.toDouble)
    }.toDF("k", "v").repartition(8).persist()
  }

  test("salted aggregate equals the plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAggregate(skewed, "k", buckets = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merges = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 == n, k)
    }
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("key_1", "A"), ("key_3", "B")).toDF("k", "attr")
    val plain = skewed.join(dim, "k").groupBy("k", "attr").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy("k", "attr").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }
}
