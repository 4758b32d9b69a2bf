package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the d3_minhash_lsh bench query. Times each
  * pipeline stage with a count() so the expensive stage is measurable
  * instead of guessed. Banding config comes from DedupQueries (single
  * source of truth — retuning d3 retunes this profiler with it). Not part
  * of the library surface.
  */
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.queries.DedupQueries.{D3Bands, D3RowsPerBand, D3Shingle, D3Threshold}
    val corpus = graft.queries.DedupQueries.nearCorpus(spark, sfDir)
    time("warmup corpus")(corpus.count())

    import graft.ops.Dedup
    val ex = Dedup.shingleHashRows(corpus, "text", "doc_id", D3Shingle)
    time("shingleHashRows")(ex.count())
    time("sizes count")(ex.groupBy("id").agg(count(lit(1)).as("n_sh")).count())
    val banded = Dedup.minhashBandKeys(ex, "id", D3Bands, D3RowsPerBand)
    time("band keys")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("candidates")(println("[profile] n_cand = " + cand.count()))
    time("full query end2end") {
      Dedup.minhashLshPairs(corpus, "text", "doc_id", D3Shingle,
        D3Bands, D3RowsPerBand, D3Threshold).count()
    }
    time("end2end again") {
      Dedup.minhashLshPairs(corpus, "text", "doc_id", D3Shingle,
        D3Bands, D3RowsPerBand, D3Threshold).count()
    }
    println("[profile] persistentRDDs after runs = " +
      spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
