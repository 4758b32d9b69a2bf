package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level breakdown of declared queries (r15): prints every
  * stage's wall time, task count, and the head of its name/details so
  * serial stages (1 task) and re-executed subtrees are visible — the
  * level below [[ProfileJobs]]. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileStages <q>"
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileStages <queryName> [...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PS_REPS", "2").toInt
    val spark = graft.core.Sessions.local("graft-profile-stages")
    @volatile var lines: List[String] = Nil
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        val run = si.taskMetrics.executorRunTime / 1e3
        lines synchronized {
          lines = f"[ps]   stage ${si.stageId}%3d ${wall}%6.2f s wall " +
            f"${run}%7.2f s cpuSum ${si.numTasks}%3d tasks  " +
            si.name.take(60) :: lines
        }
      }
    })
    val all = graft.SparkEntry.queries
    args.filter(all.contains).foreach { name =>
      (1 to reps).foreach { r =>
        lines = Nil
        val t0 = System.nanoTime()
        all(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[ps] $name rep $r wall $wall%.2f s stages ${lines.size}")
        lines.reverse.foreach(println)
      }
    }
    spark.stop()
  }
}
