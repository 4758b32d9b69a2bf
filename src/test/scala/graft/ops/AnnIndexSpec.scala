package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
  }

  test("build/save/load round-trips; loaded topK equals built topK; recall vs brute force") {
    val dir = java.nio.file.Files.createTempDirectory("annix").toString
    val ix = AnnIndex.build(corpus, "embedding", "vec_id", nlist = 8)
    AnnIndex.save(ix, dir)
    val loaded = AnnIndex.load(spark, dir)
    assert((loaded.nlist, loaded.seed) == (8, 42L))
    val queries = corpus.filter(col("vec_id") < 5)
    def hits(ix2: AnnIndex.Index) =
      AnnIndex.topK(ix2, queries, "embedding", "vec_id", k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(hits(loaded) == hits(ix), "loaded index must answer identically")
    // recall vs exact brute force at nprobe=3 of 8 cells
    val exact = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = hits(ix).map { case (q, c, _) => (q, c) }
    val recall = approx.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for isotropic-random worst case")
  }

  test("append assigns to existing centroids; appended vectors are findable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annix2").toString
    val ix = AnnIndex.build(corpus, "embedding", "vec_id", nlist = 8)
    AnnIndex.save(ix, dir)
    // duplicate vector 7 under a new id: lands in 7's cell, is its top hit
    val v7 = corpus.filter(col("vec_id") === 7L)
      .select(lit(900L).as("vec_id"), col("embedding")).collect().head
    val newVecs = Seq((900L, v7.getSeq[Double](1))).toDF("vec_id", "embedding")
    AnnIndex.append(newVecs, ix, dir, "embedding", "vec_id")
    val grown = AnnIndex.load(spark, dir)
    assert(grown.cells.count() == 201)
    val top = AnnIndex.topK(grown, corpus.filter(col("vec_id") === 7L),
      "embedding", "vec_id", k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top == Set((7L, 900L)), s"got $top")
    // assign() parity: re-assigning the ORIGINAL corpus reproduces the
    // fitted model's cells (argmin over the centroid table == transform)
    val re = AnnIndex.assign(corpus, ix, "embedding", "vec_id")
      .select("corpus_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = ix.cells.select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re == orig)
  }

  test("tombstoned vectors disappear from loaded answers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annix_rm").toString
    AnnIndex.save(AnnIndex.build(corpus, "embedding", "vec_id", nlist = 8), dir)
    val q = corpus.filter(col("vec_id") === 7L)
    // a query vector always tops ITSELF unless filtered; before removal
    // the identical vector 7 is absent from results (query==corpus id),
    // so check via a duplicate: append 900 = copy of 7, then remove it
    val v7 = corpus.filter(col("vec_id") === 7L).collect().head.getSeq[Double](1)
    AnnIndex.append(Seq((900L, v7)).toDF("vec_id", "embedding"),
      AnnIndex.load(spark, dir), dir, "embedding", "vec_id")
    val before = AnnIndex.topK(AnnIndex.load(spark, dir), q, "embedding", "vec_id",
      k = 1, nprobe = 8).collect().map(_.getLong(1)).toSet
    assert(before == Set(900L))
    AnnIndex.remove(Seq(900L).toDF("corpus_id"), dir)
    val after = AnnIndex.topK(AnnIndex.load(spark, dir), q, "embedding", "vec_id",
      k = 1, nprobe = 8).collect().map(_.getLong(1)).toSet
    assert(!after.contains(900L), s"ghost vector: $after")
  }

  test("graphTopK: probe budget equals IVF's; panel recall >= IVF at equal nprobe") {
    import spark.implicits._
    // anisotropic panel — the regime centroid ranking gets wrong:
    // stretched clusters along dim 1, queries past the stretch tip, so
    // true neighbors live in ADJACENT sub-cells whose centroids are not
    // among the globally nearest. Recall is compared as a PANEL AVERAGE
    // (k-means cell shapes wobble with session parallelism; the policy's
    // tie-or-win behavior is the stable property, per-fixture ranks are
    // not), at the same cells-read budget.
    def fixture(stretch: Double, sep: Double, nlist: Int) = {
      val rnd = new scala.util.Random(7)
      val pts = (0 until 8).flatMap { c =>
        (0 until 40).map { j =>
          val base = Array.fill(8)(rnd.nextGaussian() * 0.15)
          base(0) += c * sep
          base(1) += rnd.nextGaussian() * stretch
          ((c * 40 + j).toLong, base.toSeq)
        }
      }
      val corpus2 = pts.toDF("vec_id", "embedding")
      val queries = (0 until 8).map { c =>
        ((1000 + c).toLong,
          Seq(c * sep, stretch * 1.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      }.toDF("vec_id", "embedding")
      (corpus2, queries, AnnIndex.build(corpus2, "embedding", "vec_id", nlist = nlist))
    }
    val panel = for (stretch <- Seq(3.0, 5.0); sep <- Seq(2.0, 3.0); nlist <- Seq(16, 24)) yield {
      val (corpus2, queries, ix) = fixture(stretch, sep, nlist)
      val exact = Similarity.bruteForceTopK(corpus2, queries, "embedding", "vec_id", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double =
        df.collect().map(r => (r.getLong(0), r.getLong(1)))
          .count(exact.contains).toDouble / exact.size
      (recall(AnnIndex.topK(ix, queries, "embedding", "vec_id", k = 10, nprobe = 4)),
       recall(AnnIndex.graphTopK(ix, queries, "embedding", "vec_id",
         k = 10, nprobe = 4, degree = 4)))
    }
    val (ivfAvg, graphAvg) = (panel.map(_._1).sum / panel.size,
      panel.map(_._2).sum / panel.size)
    assert(graphAvg >= ivfAvg,
      s"panel graph recall $graphAvg must be >= IVF $ivfAvg (${panel.mkString(";")})")
    // equal budget: never more than nprobe cells per query
    val (_, queries, ix) = fixture(5.0, 2.0, 24)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    val perQuery = AnnIndex.graphProbes(ix, q, nprobe = 4, degree = 4)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ <= 4), s"budget blown: ${perQuery.mkString(",")}")
    // below the expansion threshold (nprobe < 3) there is no expansion
    // phase: identical to IVF
    val a = AnnIndex.graphTopK(ix, queries, "embedding", "vec_id", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = AnnIndex.topK(ix, queries, "embedding", "vec_id", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }

  test("twoPhaseTopK: candidate-feedback expansion holds budget; panel recall >= IVF; expand=0 == IVF") {
    import spark.implicits._
    // same anisotropic panel as graphTopK's (panel-average comparison —
    // per-fixture ranks wobble with session-dependent k-means)
    def fixture(stretch: Double, sep: Double, nlist: Int) = {
      val rnd = new scala.util.Random(7)
      val pts = (0 until 8).flatMap { c =>
        (0 until 40).map { j =>
          val base = Array.fill(8)(rnd.nextGaussian() * 0.15)
          base(0) += c * sep
          base(1) += rnd.nextGaussian() * stretch
          ((c * 40 + j).toLong, base.toSeq)
        }
      }
      val corpus2 = pts.toDF("vec_id", "embedding")
      val queries = (0 until 8).map { c =>
        ((1000 + c).toLong,
          Seq(c * sep, stretch * 1.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      }.toDF("vec_id", "embedding")
      (corpus2, queries, AnnIndex.build(corpus2, "embedding", "vec_id", nlist = nlist))
    }
    val panel = for (stretch <- Seq(3.0, 5.0); sep <- Seq(2.0, 3.0); nlist <- Seq(16, 24)) yield {
      val (corpus2, queries, ix) = fixture(stretch, sep, nlist)
      val exact = Similarity.bruteForceTopK(corpus2, queries, "embedding", "vec_id", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double =
        df.collect().map(r => (r.getLong(0), r.getLong(1)))
          .count(exact.contains).toDouble / exact.size
      (recall(AnnIndex.topK(ix, queries, "embedding", "vec_id", k = 10, nprobe = 4)),
       recall(AnnIndex.twoPhaseTopK(ix, queries, "embedding", "vec_id",
         k = 10, nprobe = 4, degree = 4)))
    }
    val (ivfAvg, twoAvg) = (panel.map(_._1).sum / panel.size,
      panel.map(_._2).sum / panel.size)
    assert(twoAvg >= ivfAvg,
      s"panel two-phase recall $twoAvg must be >= IVF $ivfAvg (${panel.mkString(";")})")
    // budget: every returned candidate's source cell is one of <= nprobe
    // distinct probed cells per query
    val (_, queries, ix) = fixture(5.0, 2.0, 24)
    val perQueryCells = AnnIndex.twoPhaseTopKCells(ix, queries, "embedding",
        "vec_id", k = 10, nprobe = 4, degree = 4, expandSlots = 1)
      .groupBy("query_id").agg(countDistinct(col("__cell")).as("n"))
      .collect().map(_.getLong(1))
    assert(perQueryCells.nonEmpty && perQueryCells.forall(_ <= 4),
      s"budget blown: ${perQueryCells.mkString(",")}")
    // expandSlots=0 degenerates to plain IVF bit-for-bit
    val a = AnnIndex.twoPhaseTopK(ix, queries, "embedding", "vec_id",
      k = 5, nprobe = 3, expandSlots = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = AnnIndex.topK(ix, queries, "embedding", "vec_id", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }

  test("topK on a loaded index prunes cell partitions (the layout is the index)") {
    val dir = java.nio.file.Files.createTempDirectory("annix3").toString
    val ix = AnnIndex.build(corpus, "embedding", "vec_id", nlist = 8)
    AnnIndex.save(ix, dir)
    val loaded = AnnIndex.load(spark, dir)
    val plan = AnnIndex.topK(loaded, corpus.filter(col("vec_id") < 2),
      "embedding", "vec_id", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic partition pruning on the cell directories in:\n$plan")
  }
}
