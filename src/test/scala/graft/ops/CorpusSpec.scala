package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  test("repetitionStats: spam scores high, prose low, short docs are whole-text grams") {
    import spark.implicits._
    val df = Seq(
      // "buy now" 3x -> 2-grams: (buy now)x3, (now buy)x2 -> top 3/5, dup 1 - 2/5
      (1L, "buy now buy now buy now"),
      // all distinct 2-grams
      (2L, "the quick brown fox jumps"),
      // single token -> one whole-text gram
      (3L, "hello"))
      .toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (0.6, 0.6))   // top 3/5; dup 1 - 2/5
    assert(out(2L) == (0.25, 0.0))  // 4 distinct grams
    assert(out(3L) == (1.0, 0.0))
  }

  test("packSequences: docs fill shards in id order, never split, budget respected") {
    import spark.implicits._
    // token counts: 3, 4, 2, 6, 1 — budget 5 with exclusive prefix sums
    // 0,3,7,9,15 -> seq ids 0,0,1,1,3
    val df = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a b c d e f"), (5L, "a"))
      .toDF("doc_id", "text")
    val out = Corpus.packSequences(df, "text", "doc_id", budget = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L),
      (4L, 6L, 1L), (5L, 1L, 3L)))
  }

  test("mixSources: quotas honored in id order, short sources cap at available rows") {
    import spark.implicits._
    val df = (0L until 10L).map(i => (i, "a")) ++
      (10L until 14L).map(i => (i, "b")) ++
      (20L until 25L).map(i => (i, "c"))
    val mixed = Corpus.mixSources(df.toDF("doc_id", "source"), "source", "doc_id",
      weights = Map("a" -> 0.6, "b" -> 0.4), totalRows = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = mixed.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    assert(bySource("a") == (0L until 6L))        // quota 6 of 10, first by id
    assert(bySource("b") == (10L until 14L))      // quota 4, all 4 available
    assert(!bySource.contains("c"))               // unweighted source dropped
  }
}
