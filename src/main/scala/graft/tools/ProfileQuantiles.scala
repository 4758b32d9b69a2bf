package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ordinals, Quantiles}

/** Measured A/B for the r10 sketch-percentile claim: the per-group
  * percentile PANEL (5 quantiles of l_extendedprice per returnflag)
  * computed (a) EXACTLY via the per-key global-rank sort — the shape
  * the pre-r10 percentile panels used — and (b) via one
  * `kll_quantiles` aggregate. Prints one JSON line with median-of-N
  * seconds for each path plus the sketch's worst-case rank-error bound
  * at this scale, so the speed/accuracy trade is a recorded number,
  * not a guess. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileQuantiles"
  */
object ProfileQuantiles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(3)

    def base = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("x"))

    /** The pre-r10 exact path: one range sort for per-key ranks, one
      * broadcast of group sizes, value rows filtered at the 5 target
      * ranks per group. */
    def exactPanel(): Long = {
      val sizes = base.groupBy("g").agg(count(lit(1)).as("n"))
      val ranked = Ordinals.withPerKeyRank(base, "g", Seq(col("x").asc), "r")
      val pSpine = spark.range(1)
        .select(explode(array(probs.map(lit): _*)).as("p"))
      val targets = sizes.crossJoin(pSpine)
        .select(col("g").as("gk"), col("p"),
          greatest(lit(1L), ceil(col("p") * col("n").cast("double"))).as("tr"))
      ranked.join(broadcast(targets),
          col("g") === col("gk") && (col("r") === col("tr")))
        .select("g", "p", "x").count()
    }

    def sketchPanel(): Long =
      Quantiles.sketchQuantiles(base.withColumnRenamed("g", "grp"), "x",
        "grp", probs, k = 256).count()

    def medianTime(f: () => Long): Double = {
      val ts = (1 to repeat).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.size / 2)
    }
    exactPanel(); sketchPanel() // warm codegen
    val tExact = medianTime(() => exactPanel())
    val tSketch = medianTime(() => sketchPanel())
    val errRow = Quantiles.sketchQuantiles(
      base.withColumnRenamed("g", "grp"), "x", "grp", probs, k = 256)
      .agg(max("rank_err_bound"), max("n")).head()
    println(s"""{"metric":"quantile_panel_ab","exact_sec":$tExact,""" +
      s""""sketch_sec":$tSketch,"repeat":$repeat,""" +
      s""""max_rank_err_bound":${errRow.getLong(0)},""" +
      s""""max_group_n":${errRow.getLong(1)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
