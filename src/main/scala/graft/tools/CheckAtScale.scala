package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc count-contract check of a named query at an arbitrary scale
  * dir — the sfN probes only TIME queries; this prints the result rows
  * so count-contract inversions (a query getting FASTER with 10x data)
  * can be ruled benign or exposed as silent wrong answers.
  * Usage: sbt "runMain graft.tools.CheckAtScale <sfDir> <query> [query...]" */
object CheckAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.core.Sessions.local("check-at-scale", cores = "32",
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"== $n @ $sfDir")
      graft.SparkEntry.queries(n)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
