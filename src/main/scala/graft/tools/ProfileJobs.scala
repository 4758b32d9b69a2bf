package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level breakdown of ONE declared query (r14): attaches a
  * SparkListener, runs the query `SPARK_GRAFT_PJ_REPS` times (default 3,
  * first run marked warm), and prints every Spark job's wall time, stage
  * count and task count — the measurement that separates "one slow
  * stage" from "thirty fast stages and a scheduling floor", which the
  * bench median alone cannot. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileJobs d2_ngram_jaccard"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobs <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PJ_REPS", "3").toInt
    val spark = graft.core.Sessions.local("graft-profile-jobs")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val stagesOf = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val taskSum = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var lines: List[String] = Nil
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, js.stageIds.size))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        taskSum.addAndGet(sc.stageInfo.numTasks.toLong)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, nStages) =>
          lines synchronized {
            lines = f"[pj]   job ${je.jobId}%3d  ${(je.time - t0) / 1e3}%6.2f s  $nStages%2d stages" :: lines
          }
        }
      }
    })
    val all = graft.SparkEntry.queries
    args.filter(all.contains).foreach { name =>
      (1 to reps).foreach { r =>
        lines = Nil
        taskSum.set(0)
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[pj] $name rep $r wall $wall%.2f s  jobs ${lines.size}  tasks ${taskSum.get}")
        lines.reverse.foreach(println)
      }
    }
    spark.stop()
  }
}
