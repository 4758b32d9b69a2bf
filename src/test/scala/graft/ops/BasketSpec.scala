package graft.ops

import graft.SparkSpec

class BasketSpec extends SparkSpec {

  test("pairRules: hand-computed support/confidence/lift; within-basket " +
    "duplicates count once") {
    import spark.implicits._
    // baskets: {x,y} x3, {x,z}, {y} — N=5; x:4, y:4, z:1 (pruned at
    // minSupport 2); pair (x,y): n_ab=3
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // duplicate y counts once
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "x"), (4L, "z"),
      (5L, "y"))
    val out = Basket.pairRules(rows.toDF("b", "i"), "b", "i",
      minSupport = 2L, topK = 10).collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("x", "y")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((4L, 4L, 3L)))
    assert(r.getDouble(5) == 0.6)      // 3/5
    assert(r.getDouble(6) == 0.75)     // 3/4
    assert(r.getDouble(7) == 0.75)
    assert(r.getDouble(8) == 0.9375)   // 5*3/(4*4)
  }

  test("pairRules: apriori prune drops sub-support items; mega-basket cap " +
    "excludes the degenerate basket entirely") {
    import spark.implicits._
    // basket 99 holds 6 items > cap 5 — its pairs AND its basket must
    // not count; remaining: {p,q} x2 -> lift uses N=2
    val rows = (1 to 6).map(i => (99L, s"m$i")) ++
      Seq((1L, "p"), (1L, "q"), (2L, "p"), (2L, "q"))
    val out = Basket.pairRules(rows.toDF("b", "i"), "b", "i",
      minSupport = 2L, topK = 10, maxBasketSize = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("p", "q")))
    assert(r.getDouble(5) == 1.0)  // support 2/2 — N excludes basket 99
    assert(r.getDouble(8) == 1.0)  // lift = N*n_ab/(n_a*n_b) = 2*2/(2*2)
  }
}
