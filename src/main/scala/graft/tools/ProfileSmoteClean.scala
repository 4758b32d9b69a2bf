package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.ops.{Neighbors, Smote}

/** Phase breakdown for the b9/b10 floors (r10 VERDICT #1): SMOTE-Tomek
  * and SMOTE-ENN decomposed into (1) the SMOTE pass, (2) width
  * derivation on the augmented frame, (3) the cleanup kNN self-join,
  * (4) the link/vote + filter tail — each timed to a count() fence so
  * the expensive stage is a measured number, not a guess. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileSmoteClean"
  */
object ProfileSmoteClean {
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

    val orders = graft.core.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val n0 = orders.count()
    val width = Neighbors.autoWidth(n0)
    val target = "o_orderstatus"

    // phase 1: the SMOTE pass (same op b9/b10 run first), materialized
    val (smoted, tSmote) = time {
      val s = Smote.SmoteOp(target, k = 5, width = width)(orders)
        .transform(graft.core.Materialize.frame)
      s.count(); s
    }

    // phase 2: prep + scale + measured-occupancy width on the augmented
    // frame (mirrors SmoteTomekOp's internals via the public API)
    val feats = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val ((all, linkWidth), tPrep) = time {
      val base = smoted.select((feats.map(c => col(c).cast(DoubleType).as(c)) :+
        col(target).cast(StringType).as(target)): _*)
        .withColumn("__id", monotonically_increasing_id())
      val params = Neighbors.scaleParams(base, feats)
      val a = Neighbors.withScaled(base, params)
        .transform(graft.core.Materialize.frame)
      a.count()
      (a, Neighbors.autoWidth(smoted.count(), 16))
    }

    // occupancy + exact candidate volume at a given width: histogram the
    // grid, then sum cnt(c) * cnt(c') over cell pairs within Chebyshev 1
    def gridStats(w: Double): (Double, Long) = {
      val hist = all.select(
          floor(col("__f0") / w).cast("long").as("c1"),
          floor(col("__f1") / w).cast("long").as("c2"))
        .groupBy("c1", "c2").count()
      val occ = hist.agg((sum(col("count") * col("count")) / sum(col("count"))))
        .head().getDouble(0)
      val candidates = hist.as("a").join(hist.as("b"),
          (col("b.c1") >= col("a.c1") - 1) && (col("b.c1") <= col("a.c1") + 1) &&
          (col("b.c2") >= col("a.c2") - 1) && (col("b.c2") <= col("a.c2") + 1))
        .agg(sum(col("a.count") * col("b.count"))).head().getLong(0)
      (occ, candidates)
    }
    // A/B the POST-adaptive grid at three cell budgets: pre-refine the
    // width here so knnSelfJoin's internal adaptiveWidth(target=64)
    // accepts it unchanged (occ <= 256 after any of these refinements)
    val budgets = Seq(64, 16, 8)
    val stats = budgets.map { t =>
      val wT = Neighbors.adaptiveWidth(all, 2, linkWidth, t)
      val (occ, cand) = gridStats(wT)
      val (_, t1) = time { Neighbors.knnSelfJoin(all, "__id", 1, wT, 42L).count() }
      val (_, t3) = time { Neighbors.knnSelfJoin(all, "__id", 3, wT, 42L).count() }
      (t, wT, occ, cand, t1, t3)
    }
    val wTight = Neighbors.adaptiveWidth(all, 2, linkWidth, budgets.last)
    val (nn1, tNn1) = time {
      val nn = Neighbors.knnSelfJoin(all, "__id", 1, wTight, 42L)
        .select(col("l_id"), col("nbr_id"))
        .transform(graft.core.Materialize.frame)
      nn.count(); nn
    }

    // phase 4a: mutual-link self-join + class filter + anti-join
    val (dropped, tLinks) = time {
      val cls = all.select(col("__id"), col(target))
      val links = nn1.as("a").join(nn1.as("b"),
          col("a.l_id") === col("b.nbr_id") && col("a.nbr_id") === col("b.l_id") &&
            col("a.l_id") < col("a.nbr_id"))
        .select(col("a.l_id").as("x"), col("a.nbr_id").as("y"))
        .join(cls.withColumnRenamed("__id", "x").withColumnRenamed(target, "cx"), "x")
        .join(cls.withColumnRenamed("__id", "y").withColumnRenamed(target, "cy"), "y")
        .filter(col("cx") =!= col("cy"))
      val toDrop = links.select(col("x").as("__id"))
        .unionByName(links.select(col("y").as("__id"))).distinct()
      all.join(toDrop, Seq("__id"), "left_anti").count()
    }

    // phase 3b: ENN's 3-NN vote + filter at the tight budget
    val (kept, tEnn) = time {
      val votes = Neighbors.knnSelfJoin(all, "__id", 3, wTight, 42L)
        .join(all.select(col("__id").as("nbr_id"), col(target).as("__nbr_cls")), "nbr_id")
        .groupBy(col("l_id").as("__id"), col("__nbr_cls"))
        .agg(count(lit(1)).as("__v"))
      val majorityVote = votes
        .groupBy("__id")
        .agg(min(struct((-col("__v")).as("__nv"), col("__nbr_cls"))).as("__top"))
        .select(col("__id"), col("__top.__nbr_cls").as("__vote"))
      all.join(majorityVote, Seq("__id"), "left")
        .filter(col("__vote").isNull || col("__vote") === col(target))
        .count()
    }

    println(s"""{"sf_dir":"$sfDir","n_orders":$n0,"n_smoted":${smoted.count()},""" +
      s""""smote_s":${f"$tSmote%.2f"},"prep_scale_width_s":${f"$tPrep%.2f"},""" +
      stats.map { case (t, wT, occ, cand, t1, t3) =>
        s""""budget$t":{"w":${f"$wT%.6f"},"occ":${f"$occ%.1f"},""" +
          s""""cand":$cand,"nn1_s":${f"$t1%.2f"},"nn3_s":${f"$t3%.2f"}},"""
      }.mkString +
      s""""tomek_nn1_s":${f"$tNn1%.2f"},"tomek_links_s":${f"$tLinks%.2f"},""" +
      s""""enn_vote_s":${f"$tEnn%.2f"},""" +
      s""""tomek_survivors":$dropped,"enn_survivors":$kept}""")
    spark.stop()
  }
}
