package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WinnowSpec extends SparkSpec {

  test("winnow_fps: hand-replayed selection on a tiny text") {
    import spark.implicits._
    val s = "abcdefgh"
    val k = 3
    val w = 2
    // driver-side replay of the published algorithm
    val hashes = (0 to s.length - k).map(i => ShingleHashes.md5Int60(s.substring(i, i + k)))
    val expected = scala.collection.mutable.ArrayBuffer[Long]()
    var last = -1
    for (j <- 0 until math.max(hashes.length - w + 1, 1)) {
      val hi = math.min(j + w, hashes.length)
      var (mp, mv) = (j, hashes(j))
      for (p <- j + 1 until hi) if (hashes(p) <= mv) { mv = hashes(p); mp = p }
      if (mp != last) { expected += mv; last = mp }
    }
    val got = Seq(s).toDF("t")
      .select(call_function("winnow_fps", col("t"), lit(k), lit(w)))
      .head().getSeq[Long](0)
    assert(got == expected.toSeq)
  }

  test("winnow guarantee: docs sharing a >= w+k-1 substring share a fingerprint") {
    import spark.implicits._
    // k=8, w=4: any common substring of length >= 11 must yield a common fp
    val common = "THE-SHARED-SEGMENT-IS-HERE"
    val df = Seq(
      (1L, s"left padding junk $common and unrelated tail"),
      (2L, s"totally different prelude $common closing words")).toDF("id", "t")
    val fps = df.select(col("id"),
        explode(call_function("winnow_fps", col("t"), lit(8), lit(4))).as("fp"))
      .distinct()
    val shared = fps.filter(col("id") === 1L).select("fp")
      .intersect(fps.filter(col("id") === 2L).select("fp")).count()
    assert(shared >= 1)
  }

  test("winnow_fps edge cases: short text, sub-window text, null") {
    import spark.implicits._
    val df = Seq(Some("ab"), Some("abcdefghi"), None).toDF("t")
    val out = df.select(call_function("winnow_fps", col("t"), lit(8), lit(4)))
      .collect()
    assert(out(0).getSeq[Long](0).isEmpty)      // shorter than k
    assert(out(1).getSeq[Long](0).length == 1)  // 2 grams < w: one window
    assert(out(2).isNullAt(0))
  }
}
