package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  test("bestMatches: blocking, distance cap, deterministic argmin") {
    import spark.implicits._
    val clean = Seq(
      (1L, "cold widget", "b1"), (2L, "bold widget", "b1"),
      (3L, "gold widget", "b1"), (4L, "cold widget", "b2"),
      (5L, "tiny gizmo", "b2"))
      .toDF("id", "name", "blk")
    val dirty = Seq(
      (10L, "cld widget", "b1"),   // dist 1 to cold (id 1) only
      (11L, "old widget", "b1"),   // dist 1 to ALL of 1,2,3 -> min id 1
      (12L, "cold widget", "b2"),  // exact match in b2 -> id 4, dist 0
      (13L, "cold widget", "b9"),  // block with no candidates -> absent
      (14L, "zzzzzzzzzzzz", "b2")) // nothing within dist 2 -> absent
      .toDF("id", "name", "blk")
    val got = Linkage.bestMatches(dirty, clean, "id", "name", "id", "name",
        col("blk"), col("blk"), maxDist = 2)
      .as[(Long, Long, Int)].collect()
      .map { case (d, m, x) => d -> (m, x) }.toMap
    assert(got == Map(10L -> (1L, 1), 11L -> (1L, 1), 12L -> (4L, 0)))
    // blocking really is an equi-join: cross-block near-match 13 is out
    assert(!got.contains(13L) && !got.contains(14L))
  }
}
