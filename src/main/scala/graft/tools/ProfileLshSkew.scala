package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Adversarial hot-bucket proof for the MinHash-LSH `maxDocsPerBand`
  * guard (r10 VERDICT #2): plant one boilerplate document repeated
  * `SPARK_GRAFT_PLANT` times (default 100000) into the sf documents
  * table, then measure
  *   (a) the EXACT uncapped candidate-pair count, computed from band-key
  *       bucket sizes as sum k*(k-1)/2 — the number of join-output rows
  *       the unguarded self-join would emit (an O(n) aggregate, so the
  *       number is measurable even when the join itself is not runnable);
  *   (b) the guarded pipeline's real candidate count + wall time at
  *       maxDocsPerBand=256;
  *   (c) the UNGUARDED pipeline's wall time at a smaller plant
  *       (SPARK_GRAFT_PLANT_SMALL, default 5000) where the quadratic
  *       join is still runnable — the quadratic-vs-flat trend line.
  * Also checks canonicalize() still collapses the planted cluster to
  * one survivor under the cap. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileLshSkew"
  */
object ProfileLshSkew {
  private val Boiler = ("this page is part of the standard site template " +
    "navigation header footer copyright terms of service privacy policy " +
    "contact about careers help faq subscribe newsletter follow us") // ~30 tokens

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plant = sys.env.getOrElse("SPARK_GRAFT_PLANT", "100000").toInt
    val plantSmall = sys.env.getOrElse("SPARK_GRAFT_PLANT_SMALL", "5000").toInt
    val cap = 256
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.DedupQueries.{D3Bands, D3RowsPerBand, D3Shingle, D3Threshold}

    val allDocs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nDocsAll = allDocs.count()
    // plant by hash-mod over the whole corpus — doc_id ranges are
    // replica-shifted at scaled SFs, so a raw id threshold would only
    // ever catch the first replica
    def planted(k: Int) = allDocs
      .withColumn("__plant",
        pmod(xxhash64(col("doc_id")), lit(nDocsAll)) < k)
      .withColumn("text",
        when(col("__plant"), lit(Boiler)).otherwise(col("text")))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val corpus = planted(plant)
    val nDocs = nDocsAll
    val nPlanted = corpus.filter(col("__plant")).count()

    // (a) exact uncapped candidate count from bucket sizes (O(n))
    val ex = Dedup.shingleHashRows(corpus, "text", "doc_id", D3Shingle)
    val bandKeys = Dedup.minhashBandKeys(ex, "id", D3Bands, D3RowsPerBand)
    val (uncappedPairs, tCount) = time {
      bandKeys.groupBy("key").agg(count(lit(1)).as("k"))
        .agg(sum((col("k").cast("decimal(38,0)") * (col("k") - 1)) / 2)
          .as("p"))
        .first().getDecimal(0).longValueExact()
    }

    // (b) guarded pipeline, full plant
    val (cappedCand, tCapped) = time {
      Dedup.minhashLshPairs(corpus, "text", "doc_id", D3Shingle,
        D3Bands, D3RowsPerBand, D3Threshold, maxDocsPerBand = cap).count()
    }
    // keep-one still collapses the planted cluster: survivors among the
    // planted ids must be exactly one
    val (plantSurvivors, tCanon) = time {
      Dedup.canonicalize(corpus,
        Dedup.minhashLshPairs(corpus, "text", "doc_id", D3Shingle,
          D3Bands, D3RowsPerBand, D3Threshold, maxDocsPerBand = cap),
        "doc_id")
        .join(corpus.filter(col("__plant")).select("doc_id"), Seq("doc_id"))
        .count()
    }
    val (smallPlanted, nDocsSmallPlanted) = {
      val s = planted(plantSmall)
      (s, s.filter(col("__plant")).count())
    }

    // (c) quadratic trend at the small plant: guarded vs unguarded
    val small = smallPlanted
    val (smallUncapped, tSmallUncapped) = time {
      Dedup.minhashLshPairs(small, "text", "doc_id", D3Shingle,
        D3Bands, D3RowsPerBand, D3Threshold).count()
    }
    val (smallCapped, tSmallCapped) = time {
      Dedup.minhashLshPairs(small, "text", "doc_id", D3Shingle,
        D3Bands, D3RowsPerBand, D3Threshold, maxDocsPerBand = cap).count()
    }

    println(s"""{"sf_dir":"$sfDir","n_docs":$nDocs,"plant":$nPlanted,""" +
      s""""plant_requested":$plant,"small_planted":$nDocsSmallPlanted,""" +
      s""""cap":$cap,"uncapped_candidate_pairs":$uncappedPairs,""" +
      s""""count_s":${f"$tCount%.2f"},""" +
      s""""capped_pairs":$cappedCand,"capped_s":${f"$tCapped%.2f"},""" +
      s""""plant_survivors":$plantSurvivors,"canonicalize_s":${f"$tCanon%.2f"},""" +
      s""""plant_small":$plantSmall,"small_uncapped_pairs":$smallUncapped,""" +
      s""""small_uncapped_s":${f"$tSmallUncapped%.2f"},""" +
      s""""small_capped_pairs":$smallCapped,""" +
      s""""small_capped_s":${f"$tSmallCapped%.2f"}}""")
    spark.stop()
  }
}
