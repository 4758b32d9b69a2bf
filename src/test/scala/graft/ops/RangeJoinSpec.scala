package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("within: boundary-inclusive pairs, bucket straddling, no cross-key pairs") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(1000)), (2L, 10L, ts(5000)), (3L, 20L, ts(1000)))
      .toDF("event_id", "user_id", "t")
    val right = Seq(
      (101L, 10L, ts(1000)),  // delta 0 (inclusive lower bound)
      (102L, 10L, ts(1060)),  // delta 60 = gap (inclusive upper bound)
      (103L, 10L, ts(1061)),  // delta 61 > gap
      (104L, 10L, ts(5059)),  // straddles a bucket boundary from 5000
      (105L, 20L, ts(999)),   // before left
      (106L, 30L, ts(1000)))  // key with no left rows
      .toDF("event_id", "user_id", "t")
    val got = RangeJoin.within(left, right, "user_id", "t", gapSec = 60)
      .select("l_event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (1L, 102L), (2L, 104L)))
  }

  test("within matches the naive range join on random event sets") {
    import spark.implicits._
    val gen = Gen.listOfN(120, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 500L)))
    for (i <- 0 until 3) {
      val evs = gen(Gen.Parameters.default, Seed(11L + i)).get
        .zipWithIndex.map { case ((u, sec), id) => (id.toLong, u, ts(sec)) }
      val df = evs.toDF("event_id", "user_id", "t")
      val (l, r) = (df, df)
      val fast = RangeJoin.within(l, r, "user_id", "t", gapSec = 37)
        .select("l_event_id", "r_event_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = evs.flatMap { case (la, ua, ta) =>
        evs.collect { case (rb, ub, tb)
          if ua == ub && tb.getTime >= ta.getTime &&
            tb.getTime <= ta.getTime + 37000L => (la, rb) }
      }.toSet
      assert(fast == naive, s"trial $i: ${(fast diff naive) ++ (naive diff fast)}")
    }
  }

  test("asOf: latest-at-or-before match, left-join nulls, null keys, tolerance") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(10)), (2L, 10L, ts(5)), (3L, 20L, ts(7)))
      .toDF("event_id", "user_id", "t")
      .unionByName(Seq((4L, ts(9))).toDF("event_id", "t")
        .withColumn("user_id", lit(null).cast("long")).select("event_id", "user_id", "t"))
    val right = Seq((10L, 10L, ts(5)), (11L, 10L, ts(8)), (12L, 30L, ts(1)))
      .toDF("event_id", "user_id", "t")
      .unionByName(Seq(13L).toDF("event_id")
        .withColumn("user_id", lit(10L))
        .withColumn("t", lit(null).cast("timestamp"))
        .select("event_id", "user_id", "t")) // null ts must never match
    def run(tol: Option[Long]) =
      RangeJoin.asOf(left, right, "user_id", "t", tol)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val got = run(None)
    // 1: latest of {5, 8} <= 10 is 8; 2: equal-ts inclusive; 3: no rows
    // for key 20; 4: null key never matches
    assert(got == Map(1L -> Some(11L), 2L -> Some(10L), 3L -> None, 4L -> None))
    val tol = run(Some(1L))
    // 10 - 8 = 2s > 1s tolerance -> nulled; 5 - 5 = 0 stays
    assert(tol == Map(1L -> None, 2L -> Some(10L), 3L -> None, 4L -> None))
  }

  test("asOf matches the naive per-row argmax on random event sets") {
    import spark.implicits._
    val gen = Gen.listOfN(100, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 300L)))
    val evs = gen(Gen.Parameters.default, Seed(7L)).get
      .zipWithIndex.map { case ((u, sec), id) => (id.toLong, u, ts(sec * 7 + id)) }
    // ts unique per key by construction (id folded into the second);
    // right side is a strict subset so matches are non-trivial
    val rEvs = evs.filter(_._1 % 3 == 0)
    val df = evs.toDF("event_id", "user_id", "t")
    val rdf = rEvs.toDF("event_id", "user_id", "t")
    val fast = RangeJoin.asOf(df, rdf, "user_id", "t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val naive = evs.map { case (la, ua, ta) =>
      val cands = rEvs.filter { case (_, ub, tb) =>
        ub == ua && !tb.after(ta) }
      la -> (if (cands.isEmpty) None
             else Some(cands.maxBy(_._3.getTime)._1))
    }.toMap
    assert(fast == naive)
  }
}
