package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MatViewSpec extends SparkSpec {

  test("two-batch fold maintains a manifest equal to a from-scratch aggregate") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_mv").toString + "/ds"
    val cfg = MatView.Config(out, "p", "v")
    // batch 1 builds (a, b); batch 2 refreshes only (b, c)
    MatView.step(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "p", "v"), cfg)
    MatView.step(Seq((3L, "b", 30L), (4L, "c", 40L)).toDF("id", "p", "v"), cfg)
    val m = graft.io.AggManifest.read(spark, out)
      .as[(String, Long, BigDecimal)].collect()
      .map { case (p, n, sv) => p -> (n, sv.toLong) }.toMap
    assert(m == Map("a" -> (1L, 10L), "b" -> (2L, 50L), "c" -> (1L, 40L)))
    val Array(t) = graft.io.AggManifest.total(spark, out).collect()
    assert(t.getLong(0) == 4L && t.getDecimal(1).longValue() == 100L)
  }
}
