package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("bm25Search: doc hit by both terms outscores single-hit; misses absent") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val s = Lexicon.bm25Search(df, "text", "doc_id", Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.keySet == Set(1L, 2L)) // doc 3 hits nothing
    assert(s(1L) > s(2L))           // alpha+beta beats alpha alone
  }

  test("rrfFuse: overlap dominates, absent lists contribute nothing, no window") {
    import spark.implicits._
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(a, b, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // 11 is in both lists -> highest fused score
    assert(fused.head._1 == 11L)
    assert(fused.head._2 == BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // 10 (rank 1 in a only) beats 13 (rank 2 in b only)
    val m = fused.toMap
    assert(m(10L) > m(13L))
    assert(fused.map(_._2).sameElements(fused.map(_._2).sorted.reverse))
  }

  test("rankBy: global ranks via RunningTotal, no keyless WindowExec") {
    import spark.implicits._
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("doc_id", "score")
    val ranked = Retrieval.rankBy(df, "doc_id", "score", k = 3)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rankBy must not use a window:\n$plan")
    val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 1L -> 3L)) // ties on id
  }
}
