package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {

  /** Interpreted array higher-order functions (the ~100x-slower path) must
    * not appear anywhere in a declared scale path's plan. */
  private def assertNoInterpretedLambda(df: org.apache.spark.sql.DataFrame,
                                        what: String): Unit = {
    val plan = df.queryExecution.optimizedPlan.toString
    for (bad <- Seq("aggregate(", "zip_with(", "transform("))
      assert(!plan.contains(bad), s"$what plan contains interpreted $bad")
  }

  test("bruteForceTopK and ivfTopK plans are lambda-free (codegen scoring)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
    assertNoInterpretedLambda(
      Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 5), "bruteForceTopK")
    assertNoInterpretedLambda(
      Similarity.ivfTopK(e, q, "embedding", "vec_id", 5, planes = 3, probes = 2),
      "ivfTopK")
  }

  test("int8-quantized top-k nearly matches exact top-k, lambda-free plan") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(e, q, "embedding", "vec_id", 10)
    assertNoInterpretedLambda(quant, "quantizedTopK")
    val got = quant.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"int8 recall $recall") // 64-dim int8 barely moves ranks
  }

  test("cosineForPairs matches the interpreted cosine() reference") {
    val e = Tables.embeddings(spark, sf).limit(40)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val ref = pairs.select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Similarity.cosineForPairs(
        pairs.select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")),
        e, "vec_id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, c) =>
      assert(math.abs(c - ref(k)) < 1e-9, s"pair $k: $c vs ${ref(k)}")
    }
  }

  test("ivfKmeansTopK: codegen scoring, sane ranks, recall beats scan fraction") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfKmeansTopK(e, q, "embedding", "vec_id", 10,
      nlist = 8, nprobe = 4)
    assertNoInterpretedLambda(ivf, "ivfKmeansTopK")
    val got = ivf.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // isotropic-random embeddings are the worst case; probing half the
    // cells must still beat a trivial corpus-fraction bound
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
    assert(got.forall { case (qid, cid) => qid != cid })
  }

  test("bruteForceTopK ranks by exact cosine (spot-check one query)") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 1)
    val top = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 5)
      .orderBy("rank").collect()
    assert(top.length == 5)
    val cosines = top.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)), "ranks not cosine-descending")
  }

  test("mineTriplets: hand-checked picks; label constraints hold") {
    import spark.implicits._
    // anchor 1 (label A) at origin; same-label 2 nearer than 3;
    // diff-label 4 nearer than 5; anchor never its own candidate
    val df = Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(1.0, 0.0)),
      (3L, "A", Seq(3.0, 0.0)), (4L, "B", Seq(0.0, 2.0)),
      (5L, "B", Seq(0.0, 4.0))).toDF("vec_id", "label", "embedding")
    val t = Similarity.mineTriplets(df, df.filter($"vec_id" === 1L),
      "embedding", "vec_id", "label").collect()
    assert(t.length == 1)
    val r = t.head
    assert(r.getAs[Long]("pos_id") == 2L && r.getAs[Double]("pos_d2") == 1.0)
    assert(r.getAs[Long]("neg_id") == 4L && r.getAs[Double]("neg_d2") == 4.0)
    // corpus-wide: every mined positive shares the anchor label, every
    // negative differs
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val mined = Similarity.mineTriplets(e, e.filter($"vec_id" < 10),
      "embedding", "vec_id", "label")
    val lab = e.select($"vec_id", $"label")
    val bad = mined
      .join(lab.select($"vec_id".as("anchor_id"), $"label".as("la")), "anchor_id")
      .join(lab.select($"vec_id".as("pos_id"), $"label".as("lp")), "pos_id")
      .join(lab.select($"vec_id".as("neg_id"), $"label".as("ln")), "neg_id")
      .filter($"la" =!= $"lp" || $"la" === $"ln")
    assert(bad.count() == 0)
  }

  test("topKPerQuery: aggregate fast path == salted window on random ties") {
    import spark.implicits._
    // deterministic pseudo-random scores with PLANTED TIES (score values
    // quantized to multiples of 0.25) so the (score, corpus_id) tie-break
    // is genuinely exercised; several queries, skewed candidate counts
    val rows = for {
      q <- 1 to 5
      c <- 1 to (20 * q)
      if c != q
    } yield (q.toLong, c.toLong,
      ((q * 31 + c * 17) % 8) * 0.25, ((q + c) % 7).toLong)
    val scored = rows.toDF("query_id", "corpus_id", "cosine", "cell")
    val byAgg = Similarity.topKPerQuery(scored, 4)
    // the reference plan: a global per-query window (small data, exact)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    val byWin = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
    assert(byAgg.collect().toSet == byWin.collect().toSet)
    assert(byAgg.columns.toSeq ==
      Seq("query_id", "corpus_id", "cosine", "cell", "rank"))
    // asc direction (distance semantics) agrees too
    val byAggAsc = Similarity.topKPerQuery(
      scored.withColumnRenamed("cosine", "d2").drop("cell"), 4,
      score = "d2", smallerIsBetter = true)
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("d2"), asc("corpus_id"))
    val byWinAsc = scored.withColumnRenamed("cosine", "d2").drop("cell")
      .withColumn("rank", row_number().over(wAsc)).filter(col("rank") <= 4)
    assert(byAggAsc.collect().toSet == byWinAsc.collect().toSet)
  }

  test("topKPerQuery: non-integral ids fall back to the window path, same answer") {
    import spark.implicits._
    val scored = Seq(
      ("q1", "ca", 0.9), ("q1", "cb", 0.7), ("q1", "cc", 0.9),
      ("q2", "ca", 0.1)).toDF("query_id", "corpus_id", "cosine")
    val got = Similarity.topKPerQuery(scored, 2)
      .select("query_id", "corpus_id", "rank").as[(String, String, Int)]
      .collect().toSet
    assert(got == Set(("q1", "ca", 1), ("q1", "cc", 2), ("q2", "ca", 1)))
  }

  test("topKPerQuery: no window/sort of the candidate stream in the fast-path plan") {
    import spark.implicits._
    val scored = Seq((1L, 2L, 0.5), (1L, 3L, 0.25))
      .toDF("query_id", "corpus_id", "cosine")
    val plan = Similarity.topKPerQuery(scored, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"fast path planned a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"fast path should plan topk_pairs_tag as ObjectHashAggregate:\n$plan")
  }
}
