package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Encoding, Quantiles, Relational}

/** Measured A/B for the r11 "ride KLL under the percentile consumers"
  * work (r10 VERDICT #4): the two expensive exact consumers against
  * their sketch-backed production paths, median-of-N fresh counts:
  *   - equi-depth binning: [[Encoding.QuantileBin]] (range sort +
  *     distributed rank) vs [[Quantiles.sketchBin]] (one aggregate +
  *     map-only assignment)
  *   - winsorize: [[Relational.winsorizeBounds]]+clip (exact rank
  *     selection) vs [[Quantiles.sketchWinsorize]]
  *   - bootstrap median CI: [[graft.ops.Audit.bootstrapQuantileCi]]'s
  *     full audit (exact + sketch + proof) vs the sketch-only
  *     replicate pass a 100 TB caller would run
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileQuantileConsumers"
  */
object ProfileQuantileConsumers {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = graft.core.Tables.lineitem(spark, sfDir)
    def ev = graft.core.Tables.events(spark, sfDir)

    def med(f: => Long): (Double, Long) = {
      val runs = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(repeat / 2), runs.head._2)
    }

    val (tBinExact, nBin) = med {
      Encoding.QuantileBin("l_extendedprice", k = 8,
        tieCols = Seq("l_orderkey", "l_linenumber"))(li)
        .filter(col("l_extendedprice_bin") === 3).count()
    }
    val (tBinSketch, nBinS) = med {
      Quantiles.sketchBin(li, "l_extendedprice", k = 8, sketchK = 256)
        .filter(col("l_extendedprice_bin") === 3).count()
    }
    val (tWinExact, _) = med {
      val (lo, hi) = Relational.winsorizeBounds(li, "l_extendedprice", 5, 95)
      Relational.winsorizeWith(li, "l_extendedprice", lo, hi)
        .filter(col("l_extendedprice") > lit(0)).count()
    }
    val (tWinSketch, _) = med {
      Quantiles.sketchWinsorize(li, "l_extendedprice", 0.05, 0.95,
        sketchK = 256).filter(col("l_extendedprice") > lit(0)).count()
    }
    val (tCiAudit, _) = med {
      graft.ops.Audit.bootstrapQuantileCi(ev, "event_type", "value",
        "event_id", p = 0.5, b = 50, sketchK = 64).count()
    }
    // the sketch-only replicate pass (what a 100 TB caller runs): one
    // weighted kll aggregate per (group, replicate), CI over estimates
    val (tCiSketch, _) = med {
      graft.ops.Audit.bootstrapQuantileSketchOnly(ev, "event_type", "value",
        "event_id", p = 0.5, b = 50, sketchK = 64).count()
    }

    println(s"""{"sf_dir":"$sfDir","repeat":$repeat,""" +
      s""""bin_exact_s":${f"$tBinExact%.2f"},""" +
      s""""bin_sketch_s":${f"$tBinSketch%.2f"},""" +
      s""""bin3_exact_rows":$nBin,"bin3_sketch_rows":$nBinS,""" +
      s""""win_exact_s":${f"$tWinExact%.2f"},""" +
      s""""win_sketch_s":${f"$tWinSketch%.2f"},""" +
      s""""ci_audit_s":${f"$tCiAudit%.2f"},""" +
      s""""ci_sketch_only_s":${f"$tCiSketch%.2f"}}""")
    spark.stop()
  }
}
