package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local-session fixture for operator specs. One session per JVM
  * (scalatest forks a single JVM per `sbt test`); small parallelism keeps
  * spec latency low. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = graft.core.Sessions.local(
    appName = "graft-test", cores = "4", shufflePartitions = "4")
}
