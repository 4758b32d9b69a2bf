package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the d6_dup_components and d7_decontaminate
  * bench queries (the two dominant items in BENCH_r03: 12.7 s + 10.4 s).
  * Times each pipeline stage with a count() so the expensive stage is
  * measurable instead of guessed. Not part of the library surface.
  */
object ProfileD6D7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.Dedup
    import graft.core.Tables

    // ---- d6: ngramJaccardPairs + components ----
    val near = graft.queries.DedupQueries.nearCorpus(spark, sfDir)
    time("warmup nearCorpus")(near.count())
    val pairs = Dedup.ngramJaccardPairs(near, "text", "doc_id", n = 3,
      threshold = 0.7)
    time("d6: pairs (jaccard)")(println("[profile] n_pairs = " + pairs.count()))
    val pairsCp = pairs.transform(graft.core.Materialize.frame)
    time("d6: components only") {
      println("[profile] n_labels = " + Dedup.components(pairsCp).count())
    }
    time("d6: end2end") {
      Dedup.components(Dedup.ngramJaccardPairs(near, "text", "doc_id", n = 3,
        threshold = 0.7)).count()
    }

    // ---- d7: decontaminate ----
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
    val benchmark = corpus.filter(col("doc_id") < 30)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
    time("warmup corpus")(corpus.count())
    val cs = Dedup.shingleHashRows(corpus, "text", "doc_id", 3)
    time("d7: corpus shingles")(cs.count())
    val bs = Dedup.shingleHashRows(benchmark, "text", "doc_id", 3)
      .select("__h").distinct()
    time("d7: benchmark shingles")(bs.count())
    time("d7: sizes")(cs.groupBy("id").agg(count(lit(1))).count())
    time("d7: hits join")(cs.join(bs, "__h").groupBy("id").agg(count(lit(1))).count())
    time("d7: end2end") {
      Dedup.decontaminate(corpus, benchmark, "text", "doc_id", 3, 0.8).count()
    }
    time("d7: end2end again") {
      Dedup.decontaminate(corpus, benchmark, "text", "doc_id", 3, 0.8).count()
    }
    spark.stop()
  }
}

/** Stage-profiler INSIDE ngramJaccardPairs (the shared cost of d2 and
  * d6): shingle rows, stop-shingle prune, sizes, pair self-join. */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.Dedup
    val near = graft.queries.DedupQueries.nearCorpus(spark, sfDir)
    time("warmup nearCorpus")(near.count())
    val sh = Dedup.shingleHashRows(near, "text", "doc_id", 3)
      .withColumnRenamed("__h", "sh")
    time("shingleHashRows")(println("[profile] n_shingle_rows = " + sh.count()))
    val pruned = sh.withColumn("__df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= 1000).drop("__df")
    time("pruned (stop-shingle)")(pruned.count())
    val sizes = pruned.groupBy("id").agg(count(lit(1)).as("n_sh"))
    time("sizes")(sizes.count())
    val common = pruned.as("a").join(pruned.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    time("pair self-join + count")(println("[profile] n_pair_rows = " + common.count()))
    time("end2end")(Dedup.ngramJaccardPairs(near, "text", "doc_id", 3, 0.7).count())
    time("end2end again")(Dedup.ngramJaccardPairs(near, "text", "doc_id", 3, 0.7).count())
    // A/B: aggregate+join stop-shingle prune instead of the window.
    // Measured at sf0.1: 1.95 s vs 2.11 s warm — a tie within run noise
    // (the window's sort feeds the downstream sort-merge join, so
    // removing it doesn't remove a sort). The op keeps the window form.
    def aggPruneEnd2End(): Long = {
      import org.apache.spark.sql.types.DoubleType
      val sh2 = Dedup.shingleHashRows(near, "text", "doc_id", 3)
        .withColumnRenamed("__h", "sh")
      val keep = sh2.groupBy("sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= 1000).select("sh")
      val pruned2 = sh2.join(keep, "sh")
      val sizes2 = pruned2.groupBy("id").agg(count(lit(1)).as("n_sh"))
      val common2 = pruned2.as("a").join(pruned2.as("b"),
          col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"))
      common2
        .join(sizes2.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes2.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("jaccard", col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.7).count()
    }
    time("aggPrune end2end")(println("[profile] n = " + aggPruneEnd2End()))
    time("aggPrune again")(aggPruneEnd2End())
    spark.stop()
  }
}
