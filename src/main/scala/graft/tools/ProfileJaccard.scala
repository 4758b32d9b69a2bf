package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of the exact n-gram-Jaccard pair generation (r13:
  * the sf10 probe's d6 8x-last-decade row turned out to be THIS, not
  * label propagation — ProfileD6D7 at sf10: pairs 128 s, components
  * 1.4 s). Replicates `Dedup.jaccardPairsFromShingles`'s stages as
  * cumulative pipelines and reports deltas, plus the key cardinalities
  * (occurrences, vocab, candidates) that decide which join shape wins.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "runMain graft.tools.ProfileJaccard"
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jac] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.Dedup
    val threshold = 0.7
    val maxDocsPerShingle = 1000

    val near = graft.queries.DedupQueries.nearCorpus(spark, sfDir)
    time("warmup corpus")(near.count())

    val sh = Dedup.shingleHashRows(near, "text", "doc_id", 3)
      .withColumnRenamed("__h", "sh")
      .repartition(col("id"))
    time("P0 occurrences (shingle+repart)") {
      println("[jac]   n_occ = " + sh.count())
    }
    val dfCounts = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocsPerShingle)
    time("P1 vocab df counts") {
      println("[jac]   n_vocab = " + dfCounts.count())
    }
    val pruned = sh.join(dfCounts, "sh")
    time("P2 prune join") {
      println("[jac]   n_pruned = " + pruned.count())
    }
    val docs = pruned.groupBy("id").agg(
      sort_array(collect_list(struct(col("__df"), col("sh")))).as("__ordered"),
      count(lit(1)).as("n_sh"))
    time("P3 docs agg (collect+sort)") {
      println("[jac]   sum_arr = " +
        docs.agg(sum(size(col("__ordered")))).head.getLong(0))
    }
    val prefLen = (col("n_sh") - ceil(col("n_sh") * lit(threshold) - lit(1e-9)) + 1).cast("int")
    val prefix = docs.select(col("id"), col("n_sh"),
      explode(slice(col("__ordered.sh"), lit(1), prefLen)).as("sh"))
    time("P4 prefix explode") {
      println("[jac]   n_prefix = " + prefix.count())
    }
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
          greatest(col("a.n_sh"), col("b.n_sh")) * lit(threshold) <=
            least(col("a.n_sh"), col("b.n_sh")) + lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("P5 candidate join") {
      println("[jac]   n_cand = " + cand.count())
    }
    val full = Dedup.ngramJaccardPairs(near, "text", "doc_id", 3, threshold)
    time("P6 full (verify incl.)") {
      println("[jac]   n_pairs = " + full.count())
    }
    spark.stop()
  }
}
