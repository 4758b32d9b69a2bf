package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.{Metrics, Models}

/** Per-member breakdown of m1b_model_zoo (r11 VERDICT #3): the board's
  * largest row at both scales (15.3 s sf0.1 / 35.7 s sf1), flat since
  * r8, never decomposed. Times each member's fit and eval separately,
  * then the concurrent 3-member submission the query actually runs, at
  * the given SF. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileModelZoo"
  */
object ProfileModelZoo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val df = graft.core.Tables.orders(spark, sfDir).select(
      col("o_custkey").cast("double").as("o_custkey"),
      col("o_totalprice"),
      (col("o_totalprice") > 150000).cast("int").as("expensive"))
      .persist()
    println(s"[zoo] rows=${df.count()}")
    val params: Map[String, Models.Params] =
      Map("logreg" -> Map("C" -> 100.0)).withDefaultValue(Map.empty)

    def member(name: String): Double = {
      val (_, tFit) = time {
        Models.fit(df, "expensive", name, Models.Classification, params(name))
      }
      val m = Models.fit(df, "expensive", name, Models.Classification, params(name))
      val (acc, tEval) = time {
        val pred = Models.transformLabeled(m, df, "expensive",
          Models.Classification, train = Some(df))
        Metrics.classificationMetrics(pred, "label", "prediction")("accuracy")
      }
      println(f"[zoo] $name%-8s fit=$tFit%6.2f s  eval=$tEval%6.2f s  acc=$acc%.4f")
      tFit + tEval
    }
    val serialSum = Seq("logreg", "rf", "gb").map(member).sum
    println(f"[zoo] serial sum (2nd fit excluded): $serialSum%.2f s")

    val (_, tConc) = time {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence(Seq("logreg", "rf", "gb").map { name =>
        Future {
          val m = Models.fit(df, "expensive", name, Models.Classification,
            params(name))
          val pred = Models.transformLabeled(m, df, "expensive",
            Models.Classification, train = Some(df))
          Metrics.classificationMetrics(pred, "label", "prediction")("accuracy")
        }
      }), Duration.Inf)
    }
    println(f"[zoo] concurrent 3-member (the query shape): $tConc%.2f s")

    // A/B: GBT iteration count on the separable threshold label
    for (it <- Seq(50, 20, 10)) {
      val (_, t) = time {
        val m = Models.fit(df, "expensive", "gb", Models.Classification,
          Map("n_estimators" -> it.toDouble))
        val pred = Models.transformLabeled(m, df, "expensive",
          Models.Classification, train = Some(df))
        val acc = Metrics.classificationMetrics(pred, "label", "prediction")("accuracy")
        println(f"[zoo] gb n_estimators=$it%3d acc=$acc%.4f")
      }
      println(f"[zoo] gb n_estimators=$it%3d: $t%.2f s")
    }
    spark.stop()
  }
}
