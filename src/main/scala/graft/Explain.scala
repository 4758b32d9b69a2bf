package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the named queries
  * (default: the Bench headline set) so pushdown / broadcast / codegen
  * regressions are visible. Usage:
  *   sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = graft.core.Sessions.local("graft-explain", cores = "4",
      shufflePartitions = "4")
    val all = SparkEntry.queries
    names.filter(all.contains).foreach { name =>
      println(s"\n########## $name ##########")
      try {
        val plan = all(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
