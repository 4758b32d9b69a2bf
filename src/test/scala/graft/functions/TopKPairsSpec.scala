package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the topk_pairs aggregate against the row_number window plan it
  * replaced (ops/Neighbors.scala kNN candidate reduction): identical
  * output under the (dist asc, id asc) tie-break on dense tied data, and
  * a NaN-consistent total order (NaN sorts AFTER every real, matching
  * Spark's sort semantics — the r8 ADVICE fix: a plain `<` comparator
  * silently corrupted the sorted-buffer invariant once a NaN entered). */
class TopKPairsSpec extends SparkSpec {

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("d").asc, col("i").asc)))
      .filter(col("rk") <= k)
      .select("g", "d", "i", "rk")

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(call_function("topk_pairs", col("d"), col("i"), lit(k)).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "s")))
      .select(col("g"), col("s.dist").as("d"), col("s.nbr_id").as("i"),
        (col("p") + 1).as("rk"))

  test("bit-identical to the row_number window on dense tied data") {
    import spark.implicits._
    // many ties in d force the id tie-break; 3 groups, k smaller than,
    // equal to, and larger than the group sizes
    val rows = for {
      g <- Seq("a", "b", "c"); j <- 1 to 40
    } yield (g, (j % 5).toDouble, (j * 31 % 97).toLong)
    val df = rows.toDF("g", "d", "i").repartition(4)
    for (k <- Seq(1, 7, 40, 60)) {
      val w = viaWindow(df, k).collect().map(r => (r.getString(0),
        r.getDouble(1), r.getLong(2), r.getInt(3))).sortBy(x => (x._1, x._4))
      val a = viaAgg(df, k).collect().map(r => (r.getString(0),
        r.getDouble(1), r.getLong(2), r.getInt(3))).sortBy(x => (x._1, x._4))
      assert(w.toSeq == a.toSeq, s"k=$k mismatch")
    }
  }

  test("NaN distances: total order matches Spark sort (NaN after all reals)") {
    import spark.implicits._
    val df = Seq(
      ("g", Double.NaN, 1L), ("g", Double.NaN, 3L),
      ("g", 1.0, 4L), ("g", 3.0, 5L), ("g", Double.NaN, 6L), ("g", 2.0, 7L))
      .toDF("g", "d", "i").repartition(3)
    // k=4: the three reals then ONE NaN (smallest id among NaNs) —
    // exactly what ORDER BY d ASC, i ASC returns (Spark sorts NaN last)
    val got = viaAgg(df, 4).orderBy("rk").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(got.take(3).toSeq == Seq((1.0, 4L), (2.0, 7L), (3.0, 5L)), got.toSeq)
    assert(got(3)._1.isNaN && got(3)._2 == 1L, got.toSeq)
    // and the window agrees (bit-identity holds THROUGH the NaN case)
    val w = viaWindow(df, 4).orderBy("rk").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(w.zip(got).forall { case ((d1, i1), (d2, i2)) =>
      i1 == i2 && (d1 == d2 || (d1.isNaN && d2.isNaN)) }, s"${w.toSeq} vs ${got.toSeq}")
    // smaller reals arriving AFTER the buffer fills with a NaN tail must
    // still displace it (the pre-fix early-return bug): k=2 keeps 1.0, 2.0
    val got2 = viaAgg(df, 2).orderBy("rk").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(got2.toSeq == Seq((1.0, 4L), (2.0, 7L)), got2.toSeq)
  }

  test("null distances are skipped (documented divergence from the null-first window)") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double, java.lang.Long)](
      ("g", null, 1L), ("g", 2.0, 2L), ("g", 1.0, 3L))
      .toDF("g", "d", "i")
    val got = viaAgg(df, 2).orderBy("rk").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1.0, 3L), (2.0, 2L)), got.toSeq)
  }

  test("topk_pairs_tag: tag rides along, never affects ordering; ranking == topk_pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ties on dist across DIFFERENT tags: order must follow (dist, id)
    // only, and each winner must keep ITS OWN tag
    val df = Seq(
      (1L, 1.0, 10L, 100L), (1L, 1.0, 11L, 200L), (1L, 0.5, 12L, 300L),
      (1L, 2.0, 13L, 400L), (2L, 3.0, 14L, 500L))
      .toDF("g", "d", "i", "t")
    val tagged = df.groupBy("g")
      .agg(call_function("topk_pairs_tag",
        col("d"), col("i"), col("t"), lit(2)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p", "pair")))
      .select(col("g"), col("pair.dist"), col("pair.nbr_id"), col("pair.tag"))
      .as[(Long, Double, Long, Long)].collect().toSet
    assert(tagged == Set(
      (1L, 0.5, 12L, 300L), (1L, 1.0, 10L, 100L), (2L, 3.0, 14L, 500L)))
    // ranking identical to plain topk_pairs on the same input
    val plain = df.groupBy("g")
      .agg(call_function("topk_pairs", col("d"), col("i"), lit(2)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p", "pair")))
      .select(col("g"), col("pair.dist"), col("pair.nbr_id"))
      .as[(Long, Double, Long)].collect().toSet
    assert(tagged.map { case (g, d, i, _) => (g, d, i) } == plain)
  }
}
