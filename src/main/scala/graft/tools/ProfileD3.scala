package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the d3_minhash_lsh bench query. Times each
  * pipeline stage with a count() so the expensive stage is measurable
  * instead of guessed. Not part of the library surface.
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
    val corpus = graft.queries.DedupQueries.nearCorpus(spark, sfDir)
    time("warmup corpus")(corpus.count())

    import graft.ops.{Dedup, Hashing}
    val exploded = time("shingleRows") {
      val e = Dedup.shingleRows(corpus, "text", "doc_id", 3).persist()
      e.count(); e
    }
    val sizes = time("sizes")(exploded.groupBy("id").agg(count(lit(1)).as("n_sh")))
    time("sizes count")(sizes.count())
    val sigs = time("signatures 63") {
      val s = Dedup.minhashSignatures(exploded, "id", 63); s.count(); s
    }
    val banded = sigs
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(20)),
          b => struct(b.as("band"), slice(col("sig"), b * 3 + 1, lit(3)).as("key"))))
          .as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    time("banded count")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b").persist()
    time("candidates")(println("[profile] n_cand = " + cand.count()))
    val hashed = exploded.select(col("id"), Hashing.md5Int(col("sh")).as("__h"))
    val withA = cand.join(hashed.withColumnRenamed("id", "id_a"), "id_a")
    val common = withA.join(hashed.withColumnRenamed("id", "id_b"), Seq("id_b", "__h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    time("verify join")(common.count())
    time("full query end2end") {
      Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 21, 3, 0.7).count()
    }
    spark.stop()
  }
}
