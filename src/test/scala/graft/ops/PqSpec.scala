package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val cb = Pq.train(emb, "embedding", "vec_id", m = 16, k = 16,
    sampleRows = 1000)

  test("train: codebook dimensions and determinism across fits") {
    assert(cb.dim == 64 && cb.m == 16 && cb.k == 16)
    assert(cb.cents.length == 16 * 16 * 4)
    val cb2 = Pq.train(emb, "embedding", "vec_id", m = 16, k = 16,
      sampleRows = 1000)
    assert(cb.cents.sameElements(cb2.cents))
  }

  test("encode: map-only plan (no exchange), codes in range") {
    val enc = Pq.encode(emb, "embedding", "vec_id", cb)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    val stats = enc.agg(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi")).head()
    assert(stats.getInt(0) == 16 && stats.getInt(1) == 16)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < 16)
  }

  test("adc distance equals the code-reconstruction distance by hand") {
    // for one vector/query pair, pq_adc must equal the sum over
    // subspaces of ||q_s - cent(code_s)||^2 computed on the driver
    val rows = emb.limit(2).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).collect()
    val (x, q) = (rows(0).getSeq[Double](1).toArray, rows(1).getSeq[Double](1).toArray)
    val dsub = cb.dim / cb.m
    val codes = (0 until cb.m).map { s =>
      (0 until cb.k).minBy { c =>
        (0 until dsub).map { j =>
          val d = x(s * dsub + j) - cb.cents((s * cb.k + c) * dsub + j)
          d * d
        }.sum
      }
    }
    val expected = (0 until cb.m).map { s =>
      val c = codes(s)
      (0 until dsub).map { j =>
        val d = q(s * dsub + j) - cb.cents((s * cb.k + c) * dsub + j)
        d * d
      }.sum
    }.sum
    val got = Pq.adcTopK(emb.filter(col("vec_id") === rows(0).getLong(0)),
        emb.filter(col("vec_id") === rows(1).getLong(0)),
        "embedding", "vec_id", k = 1, cb)
      .select("adc_d2").head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("persisted index: round trip == in-memory; append found; tombstone gone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_ix").toString
    Pq.saveIndex(emb, "embedding", "vec_id", cb, dir, mode = "overwrite")
    val ix = Pq.loadIndex(spark, dir)
    val queries = emb.filter(col("vec_id") < 3)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val loaded = key(Pq.indexTopK(ix, queries, "embedding", "vec_id",
      k = 10, shortlist = 60))
    val mem = key(Pq.adcRerankTopK(emb, queries, "embedding", "vec_id",
      k = 10, cb, shortlist = 60))
    assert(loaded == mem, "loaded-index probe must equal the in-memory path")
    // append a vector identical to vec 1 (plus id offset): it must become
    // vec 1's nearest neighbour through the loaded index
    val clone = emb.filter(col("vec_id") === 1L)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    Pq.appendIndex(clone, "embedding", "vec_id", cb, dir)
    val afterAppend = Pq.indexTopK(Pq.loadIndex(spark, dir),
        emb.filter(col("vec_id") === 1L), "embedding", "vec_id", k = 1)
      .select("corpus_id").head().getLong(0)
    assert(afterAppend == 90001L, s"appended clone not found: $afterAppend")
    // tombstone it: gone from the next load
    Pq.removeFromIndex(Seq(90001L).toDF("vec_id"), "vec_id", dir)
    val afterRemove = Pq.indexTopK(Pq.loadIndex(spark, dir),
        emb.filter(col("vec_id") === 1L), "embedding", "vec_id", k = 10)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(!afterRemove.contains(90001L), "tombstoned id resurrected")
  }

  test("ivfAdcTopK: DPP-pruned probe, recall floor, full-probe == flat rerank") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_ivfadc").toString
    Pq.saveIvfAdc(emb, "embedding", "vec_id", cb, nlist = 8, dir,
      mode = "overwrite")
    val ix = Pq.loadIvfAdc(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val probed = Pq.ivfAdcTopK(ix, queries, "embedding", "vec_id", k = 10,
      nprobe = 3, shortlist = 60)
    assert(probed.queryExecution.executedPlan.toString
      .contains("dynamicpruning"), "code scan must be partition-pruned")
    val exact = Pq.exactL2TopK(emb, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "corpus_id")
    val rec = probed.select("query_id", "corpus_id")
      .join(exact, Seq("query_id", "corpus_id")).count().toDouble / exact.count()
    assert(rec >= 0.5, s"IVFADC recall@10 $rec below floor")
    // probing EVERY cell removes the coarse-quantizer loss: equals the
    // flat code scan + rerank bit-for-bit
    val full = Pq.ivfAdcTopK(ix, queries, "embedding", "vec_id", k = 10,
        nprobe = 8, shortlist = 60)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flat = Pq.adcRerankTopK(emb, queries, "embedding", "vec_id", k = 10,
        cb, shortlist = 60)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == flat, "nprobe == nlist must equal the flat PQ path")
  }

  test("adcTopK / adcRerankTopK: recall@10 vs exact; rerank dominates") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Pq.exactL2TopK(emb, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "corpus_id")
    val nExact = exact.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "corpus_id")
        .join(exact, Seq("query_id", "corpus_id")).count() / nExact
    val plain = recall(
      Pq.adcTopK(emb, queries, "embedding", "vec_id", k = 10, cb))
    val rerank = recall(Pq.adcRerankTopK(emb, queries, "embedding",
      "vec_id", k = 10, cb, shortlist = 60))
    assert(plain >= 0.2, s"ADC recall@10 $plain below floor")
    assert(rerank >= 0.7, s"rerank recall@10 $rerank below floor")
    assert(rerank >= plain, "exact re-rank of a superset cannot lose recall")
  }
}
