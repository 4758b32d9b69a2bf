package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the kll_quantiles aggregate's contract: for every requested
  * quantile p, the estimate's TRUE rank interval [count_lt+1, count_le]
  * intersects [r - err, r + err] with r = max(1, ceil(p*n)) and `err`
  * the sketch's self-reported bound — under any k, any partitioning,
  * any arrival order (map-side partials + merges included). Exactness
  * (err = 0, estimate = true rank value) when no compaction fires. */
class KllQuantilesSpec extends SparkSpec {

  private val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  private def sketch(values: Seq[Double], k: Int, parts: Int): Row = {
    import spark.implicits._
    values.toDF("x").repartition(parts)
      .agg(call_function("kll_quantiles", col("x"), lit(k),
        array(probs.map(lit): _*)).as("sk"))
      .select("sk.n", "sk.err", "sk.est").head()
  }

  /** (holds?, diagnostics) of the rank contract for one estimate. */
  private def contractOk(sorted: Array[Double], p: Double, est: Double,
                         err: Long): Boolean = {
    val n = sorted.length
    val r = math.max(1L, math.ceil(p * n).toLong)
    val lt = sorted.count(_ < est).toLong
    val le = sorted.count(_ <= est).toLong
    (lt + 1 <= r + err) && (le >= r - err)
  }

  test("no compaction (n < k): err = 0 and estimates are EXACT rank values") {
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(120)(rnd.nextDouble() * 1000)
    val row = sketch(values, k = 128, parts = 3)
    assert(row.getLong(0) == 120L)
    assert(row.getLong(1) == 0L, "no compaction can fire below k")
    val sorted = values.sorted.toArray
    val est = row.getSeq[Double](2)
    probs.zipWithIndex.foreach { case (p, i) =>
      val r = math.max(1, math.ceil(p * 120).toInt)
      assert(est(i) == sorted(r - 1), s"p=$p exact value mismatch")
    }
  }

  test("compacted sketch: bound holds under any partitioning, err stays useful") {
    val rnd = new scala.util.Random(23)
    val values = Seq.fill(5000)(rnd.nextGaussian() * 100)
    val sorted = values.sorted.toArray
    for (parts <- Seq(1, 7, 32)) {
      // err accumulates ~(n/k) per level over ~log2(n/k) levels:
      // k=64 over 5000 rows ≈ 78·7 ≈ 550 ranks — assert it stays an
      // order below n (k=16 would be a degenerate half-range bound)
      val row = sketch(values, k = 64, parts = parts)
      assert(row.getLong(0) == 5000L)
      val err = row.getLong(1)
      assert(err > 0L, "k=64 over 5000 rows must compact")
      assert(err < 5000L / 5, s"bound degenerate: $err")
      val est = row.getSeq[Double](2)
      probs.zipWithIndex.foreach { case (p, i) =>
        assert(contractOk(sorted, p, est(i), err),
          s"parts=$parts p=$p est=${est(i)} err=$err violates the bound")
      }
    }
  }

  test("adversarial arrival orders: pre-sorted asc and desc both hold") {
    val values = (1 to 4000).map(_.toDouble)
    val sorted = values.toArray
    for (seq <- Seq(values, values.reverse)) {
      val row = sketch(seq, k = 32, parts = 5)
      val err = row.getLong(1)
      val est = row.getSeq[Double](2)
      probs.zipWithIndex.foreach { case (p, i) =>
        assert(contractOk(sorted, p, est(i), err),
          s"sorted-order input p=$p est=${est(i)} err=$err")
      }
    }
  }

  test("merge path: grouped sketches see only their group's rows") {
    import spark.implicits._
    // two groups with disjoint ranges — any state bleed across groups
    // would push an estimate into the other group's range
    val a = (1 to 3000).map(i => ("a", i.toDouble))
    val b = (1 to 3000).map(i => ("b", 10000.0 + i))
    val rows = spark.createDataFrame(
      scala.util.Random.shuffle(a ++ b)).toDF("g", "x")
      .repartition(11)
      .groupBy("g")
      .agg(call_function("kll_quantiles", col("x"), lit(16),
        array(probs.map(lit): _*)).as("sk"))
      .select(col("g"), col("sk.n"), col("sk.err"), col("sk.est"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Double](3))).toMap
    assert(rows("a")._1 == 3000L && rows("b")._1 == 3000L)
    val sortedA = a.map(_._2).toArray
    val sortedB = b.map(_._2).toArray
    probs.zipWithIndex.foreach { case (p, i) =>
      assert(rows("a")._3(i) <= 3000.0, "group a leaked b values")
      assert(rows("b")._3(i) >= 10000.0, "group b leaked a values")
      assert(contractOk(sortedA, p, rows("a")._3(i), rows("a")._2))
      assert(contractOk(sortedB, p, rows("b")._3(i), rows("b")._2))
    }
  }

  test("nulls ignored; all-null group evaluates to null") {
    import spark.implicits._
    val df = Seq(Some(5.0), None, Some(1.0), None, Some(3.0)).toDF("x")
    val row = df.agg(call_function("kll_quantiles", col("x"), lit(8),
      array(lit(0.5))).as("sk")).select("sk.n").head()
    assert(row.getLong(0) == 3L)
    val nullRow = Seq.empty[Double].toDF("x")
      .agg(call_function("kll_quantiles", col("x"), lit(8), array(lit(0.5)))
        .as("sk"))
      .head()
    assert(nullRow.isNullAt(0), "empty input must evaluate to null")
  }

  test("insertWeighted: exact binary decomposition — n, bound, exact regime") {
    val rng = new scala.util.Random(13)
    val weighted = (1 to 500).map(_ => (rng.nextGaussian(), 1L + rng.nextInt(6)))
    val a = new KllBuffer(16)
    weighted.foreach { case (v, w) => a.insertWeighted(v, w) }
    val total = weighted.map(_._2).sum
    assert(a.n == total)
    val copies = weighted.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .sorted.toArray
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(contractOk(copies, p, a.quantiles(Array(p)).head, a.err))
    // exact regime: no compaction, err = 0, weighted rank selection exact
    val b = new KllBuffer(1024)
    Seq((1.0, 3L), (2.0, 1L), (3.0, 4L)).foreach { case (v, w) =>
      b.insertWeighted(v, w)
    }
    assert(b.err == 0L && b.n == 8L)
    assert(b.quantiles(Array(0.5)).head == 2.0) // rank 4 of 1,1,1,2,3,3,3,3
    assert(b.quantiles(Array(0.125)).head == 1.0)
    assert(b.quantiles(Array(1.0)).head == 3.0)
    intercept[IllegalArgumentException] { b.insertWeighted(9.0, 0L) }
  }

  test("kll_quantiles_w: weighted aggregate == exploded-unit contract") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val df = (1 to 3000).map(_ => (rng.nextGaussian() * 10, 1L + rng.nextInt(5)))
      .toDF("x", "w").repartition(7)
    val r = df.agg(call_function("kll_quantiles_w", col("x"), col("w"),
        lit(32), array(lit(0.5))).as("sk"))
      .select("sk.n", "sk.err", "sk.est").head()
    val copies = df.withColumn("c", explode(sequence(lit(1L), col("w"))))
      .select("x").as[Double].collect().sorted
    assert(r.getLong(0) == copies.length.toLong)
    assert(contractOk(copies, 0.5, r.getSeq[Double](2).head, r.getLong(1)))
  }
}
