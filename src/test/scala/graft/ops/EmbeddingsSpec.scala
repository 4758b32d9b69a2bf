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
