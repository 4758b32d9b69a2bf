package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {

  /** Correlated 6-dim fixture: dims 0/1 carry most variance and are
    * strongly correlated — PCA must decorrelate them. */
  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0L until 300L).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = a * 0.8 + rnd.nextGaussian() * 0.5
      (i, Seq(a, b, rnd.nextGaussian() * 0.3, rnd.nextGaussian() * 0.3,
        rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "embedding")
  }

  test("pcaProject keeps rows/ids, emits k dims; whiten standardizes and decorrelates") {
    val proj = Embeddings.pcaProject(corpus, "embedding", "vec_id", k = 3)
    assert(proj.count() == 300L)
    assert(proj.select(countDistinct("id")).head().getLong(0) == 300L)
    assert(proj.select(min(size(col("proj"))), max(size(col("proj"))))
      .head() match { case r => r.getInt(0) == 3 && r.getInt(1) == 3 })
    val w = Embeddings.whiten(proj, "proj")
    val stats = w.select(
      (0 until 3).flatMap(i => Seq(
        avg(element_at(col("white"), i + 1)),
        variance(element_at(col("white"), i + 1)))) ++
      (for (i <- 0 until 3; j <- i + 1 until 3)
        yield corr(element_at(col("white"), i + 1),
          element_at(col("white"), j + 1)).cast("double")): _*).head()
    (0 until 3).foreach { i =>
      assert(math.abs(stats.getDouble(2 * i)) < 1e-9, s"mean dim $i")
      assert(math.abs(stats.getDouble(2 * i + 1) - 1.0) < 1e-6, s"var dim $i")
    }
    (6 until 9).foreach(p =>
      assert(math.abs(stats.getDouble(p)) < 1e-6, s"corr pair $p: ${stats.getDouble(p)}"))
    // whitening really changed scale: raw dim-0 variance is ~9, not 1
    val rawVar = proj.select(variance(element_at(col("proj"), 1))).head().getDouble(0)
    assert(rawVar > 2.0, s"fixture should have dominant variance, got $rawVar")
  }

  test("whiten passes zero-variance dims through centered, unscaled") {
    import spark.implicits._
    val df = Seq((1L, Seq(5.0, 1.0)), (2L, Seq(5.0, 3.0)), (3L, Seq(5.0, 5.0)))
      .toDF("id", "proj")
    val w = Embeddings.whiten(df, "proj").orderBy("id")
      .select(col("white")).collect().map(_.getSeq[Double](0))
    // dim 0 constant: centered to exactly 0, no division
    assert(w.forall(v => v.head == 0.0))
    // dim 1: standardized to variance 1
    assert(math.abs(w.map(v => v(1) * v(1)).sum / 2 - 1.0) < 1e-9)
  }

  test("frozen scaler round-trips through save/load; whiten + outlier score run on a REAL stream, equal to batch") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("whitenstream").toString
    val proj = Embeddings.pcaProject(corpus, "embedding", "vec_id", k = 3)
    val fit = Embeddings.whitenStats(proj, "proj")
    Embeddings.saveWhitenStats(spark, fit, s"$root/scaler")
    val stats = Embeddings.loadWhitenStats(spark, s"$root/scaler")
    assert(stats.toSeq == fit.toSeq, "save/load must restore every bit")

    // the stream source: the projection split over two parquet files
    proj.filter(col("id") < 150).coalesce(1).write.parquet(s"$root/src")
    proj.filter(col("id") >= 150).coalesce(1).write.mode("append").parquet(s"$root/src")

    // batch truth over the SAME files + plan check: frozen-scaler apply
    // and score are map-only (no Exchange anywhere)
    val disk = spark.read.parquet(s"$root/src")
    val batchScored = Embeddings.outlierScore(
      Embeddings.applyWhiten(disk, "proj", stats), "proj", stats)
    assert(!batchScored.queryExecution.executedPlan.toString.contains("Exchange"),
      "frozen-scaler scoring must not shuffle")
    val expect = batchScored.select("id", "outlier_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val sdf = spark.readStream.schema(disk.schema).parquet(s"$root/src")
    val scored = Embeddings.outlierScore(
      Embeddings.applyWhiten(sdf, "proj", stats), "proj", stats)
    assert(scored.isStreaming, "must be a streaming frame end to end")
    val q = scored.select("id", "outlier_score").writeStream
      .format("memory").queryName("wstream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wstream")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect, "stream scores must equal batch bit-for-bit")
    assert(got.size == 300 && got.values.forall(v => v >= 0.0 && !v.isNaN))
  }

  test("diversitySample: caps per cell, covers every non-empty cell, deterministic") {
    val s1 = Embeddings.diversitySample(corpus, "embedding", "vec_id",
      nlist = 6, perCell = 10)
    val perCell = s1.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCell.values.forall(n => n >= 1 && n <= 10), perCell.toString)
    // every non-empty k-means cell is represented: with 300 points in 6
    // cells each cell holds >= 1 member, and perCell >= 1 keeps one
    assert(perCell.size == s1.select("cell").distinct().count())
    assert(s1.count() <= 60 && s1.count() == s1.select("id").distinct().count())
    // deterministic: same data, same seed, same session -> same sample
    val s2 = Embeddings.diversitySample(corpus, "embedding", "vec_id",
      nlist = 6, perCell = 10)
    assert(s1.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      s2.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }
}
