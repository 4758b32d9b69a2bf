package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Prints the FINAL adaptive executed plan of named queries (r14 dev
  * tool): runs each query through the noop sink and captures the
  * post-execution QueryExecution via listener, so AQE stage reuse
  * (ReusedExchange / ShuffleQueryStage) is visible — Explain.scala shows
  * only the initial plan. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-execplan")
    @volatile var last: Option[QueryExecution] = None
    @volatile var latch = new java.util.concurrent.CountDownLatch(1)
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        last = Some(qe); latch.countDown()
      }
      def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })
    val all = graft.SparkEntry.queries
    args.filter(all.contains).foreach { name =>
      val df = all(name)(spark, sfDir)
      last = None
      latch = new java.util.concurrent.CountDownLatch(1)
      df.write.format("noop").mode("overwrite").save()
      // the listener bus is async: wait for the sink's onSuccess instead
      // of a fixed sleep (r14-ADVICE — a loaded JVM could print nothing)
      latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      println(s"########## $name executed ##########")
      last.foreach(qe => println(qe.executedPlan.toString))
    }
    spark.stop()
  }
}
