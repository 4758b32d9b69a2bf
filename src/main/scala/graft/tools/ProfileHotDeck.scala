package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Neighbors

/** Phase breakdown for the i6_hotdeck_impute floor (r11 VERDICT #1):
  * the exact-mode (width=0) hot-deck pipeline decomposed into (1) the
  * probe/donor split, (2) the k=20 candidate kNN alone, (3) the
  * edge-list x dictionary joins + mixed re-rank window, (4) the full
  * op — each timed to a count() fence so the 30 s phase is a measured
  * number, not a guess. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileHotDeck"
  */
object ProfileHotDeck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val target = "c_acctbal"
    val nums = Seq("c_custkey", "c_nationkey")
    val cats = Seq("c_mktsegment")
    val df = graft.core.Tables.customer(spark, sfDir).withColumn(target,
      when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col(target)))

    // phase 1: id + scale + split, materialized
    val ((withId, probes, donors), t1) = time {
      val w = df.withColumn("__id", col("c_custkey")).persist()
      val params = Neighbors.scaleParams(w, nums)
      val scaled = Neighbors.withScaled(w, params)
      val d = scaled.filter(col(target).isNotNull)
      val p = scaled.filter(col(target).isNull)
      println(s"[hotdeck] probes=${p.count()} donors=${d.count()}")
      (w, p, d)
    }
    println(f"[hotdeck] phase1 split+scale: $t1%.2f s")

    // phase 2: candidate kNN alone (k=20, exact mode) + k A/B
    for (kk <- Seq(5, 20)) {
      val (_, tk) = time {
        val c = Neighbors.knnJoin(probes, donors, "__id", kk, 0.0, 42L)
        println(s"[hotdeck] k=$kk cand rows=${c.count()}")
      }
      println(f"[hotdeck] phase2 kNN k=$kk exact: $tk%.2f s")
    }
    // phase 2c: the grid-accelerated exact join (r12)
    val (_, t2c) = time {
      val c = Neighbors.knnJoinExact(probes, donors, "__id", 20, 42L)
      println(s"[hotdeck] accel cand rows=${c.count()}")
    }
    println(f"[hotdeck] phase2c kNN k=20 grid-exact: $t2c%.2f s")
    val cand = Neighbors.knnJoin(probes, donors, "__id", 20, 0.0, 42L)

    // phase 3: re-run kNN + dict joins + window (mirrors HotDeckImpute)
    val (_, t3) = time {
      val dcols = donors.select((col("__id").as("nbr_id") +:
        (col(target).as("__tv") +: cats.map(c => col(c).as(s"__d_$c")))): _*)
      val pcols = probes.select((col("__id").as("l_id") +:
        cats.map(c => col(c).as(s"__p_$c"))): _*)
      val mixed = cand.join(dcols, "nbr_id").join(pcols, "l_id")
        .withColumn("__hamming",
          cats.map(c =>
            when(col(s"__d_$c") <=> col(s"__p_$c"), 0.0).otherwise(1.0): Column)
            .reduce(_ + _))
        .withColumn("__mixed", col("dist") + col("__hamming"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_id").orderBy(asc("__mixed"), asc("nbr_id"))
      val fills = mixed.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("l_id").as("__id"), col("__tv").as("__fill"))
      println(s"[hotdeck] fills rows=${fills.count()}")
    }
    println(f"[hotdeck] phase3 joins+window (incl kNN rerun): $t3%.2f s")

    // phase 3b: the full i5 op for comparison (boards at 0.55 s sf1?!)
    val (_, t3b) = time {
      val out = graft.ops.NnImpute.KnnImpute(target, features = nums,
        k = 5, width = 0.0, idCol = Some("c_custkey"))(df)
      println(s"[hotdeck] i5 out rows=${out.count()}")
    }
    println(f"[hotdeck] phase3b full i5 op: $t3b%.2f s")

    // phase 4: the full op as the query runs it
    val (_, t4) = time {
      val out = graft.ops.NnImpute.HotDeckImpute(target, numFeatures = nums,
        catFeatures = cats, width = 0.0, idCol = Some("c_custkey"))(df)
      println(s"[hotdeck] out rows=${out.count()}")
    }
    println(f"[hotdeck] phase4 full op: $t4%.2f s")
    withId.unpersist()
    spark.stop()
  }
}
