package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WebGraphSpec extends SparkSpec {

  test("extractHrefs: quote styles, case, attribute order, non-anchors") {
    import spark.implicits._
    val html =
      """<p><a href="https://a.com/x">1</a>
        |<A CLASS="z" HREF='http://b.org/y?q=1'>2</A>
        |<a id="k" href="/relative">3</a>
        |<a href="#frag">4</a>
        |<link href="https://not-an-anchor.com/css">
        |<a name="no-href">5</a></p>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(WebGraph.extractHrefs(col("h"))).head().getSeq[String](0)
    assert(got == Seq("https://a.com/x", "http://b.org/y?q=1",
      "/relative", "#frag"))
  }

  test("hostEdges: absolute-only, canonical hosts, self-loops dropped, distinct") {
    import spark.implicits._
    val df = Seq(
      ("https://src1.com/p",
        """<a href="HTTPS://DST1.com:443/a">x</a> <a href='/rel'>y</a>
          |<a href="https://src1.com/self">s</a>
          |<a href="https://dst1.com/other">dup-host</a>""".stripMargin),
      ("https://src2.com/q", """<a href="#f">z</a>"""))
      .toDF("url", "html")
    val edges = WebGraph.hostEdges(df, "url", "html")
      .as[(String, String)].collect().toSet
    assert(edges == Set(("src1.com", "dst1.com")))
  }

  /** In-test replay of the documented integer semantics — an independent
    * implementation (plain Scala maps), not a re-run of the Spark code. */
  private def replay(edges: Seq[(String, String)], iters: Int,
                     seed: Long = 1000000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var rank = nodes.map(_ -> seed).toMap
    for (_ <- 1 to iters) {
      val shares = e.map { case (s, d) =>
        d -> ((rank(s) * 85L / 100L) / deg(s))
      }
      val recv = shares.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      val sent = shares.map(_._2).sum
      val pool = rank.values.sum - sent
      rank = nodes.map(h => h -> (recv.getOrElse(h, 0L) + pool / n)).toMap
    }
    rank
  }

  test("hostRank matches the independent integer replay exactly (K=1..4)") {
    import spark.implicits._
    // a dangling node (d), a hub (c), a 2-cycle, and a self-contained src
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d"))
    val df = edges.toDF("src", "dst")
    for (k <- 1 to 4) {
      val got = WebGraph.hostRank(df, iterations = k)
        .as[(String, Long)].collect().toMap
      assert(got == replay(edges, k), s"iteration count $k")
    }
  }

  test("hostRank: dangling mass teleports; totals never grow; determinism") {
    import spark.implicits._
    val edges = Seq(("a", "d"), ("b", "d"), ("c", "d")) // d is dangling
    val df = edges.toDF("src", "dst")
    val r1 = WebGraph.hostRank(df, iterations = 3).as[(String, Long)]
      .collect().toMap
    val r2 = WebGraph.hostRank(df, iterations = 3).as[(String, Long)]
      .collect().toMap
    assert(r1 == r2, "bit-identical across runs")
    // the sink accumulated the most; sources hold only teleport shares
    assert(r1("d") > r1("a") && r1("a") == r1("b") && r1("b") == r1("c"))
    assert(r1.values.sum <= 4L * 1000000000L, "integer mass never grows")
    assert(r1 == replay(edges, 3))
  }

  test("hostRank: star hub outranks leaves; checkpointEvery changes nothing") {
    import spark.implicits._
    val edges = (1 to 8).map(i => (s"leaf$i", "hub")) ++
      Seq(("hub", "leaf1"))
    val df = edges.toDF("src", "dst")
    // lazy (0) vs the default eager-checkpoint loop: identical results
    val plain = WebGraph.hostRank(df, iterations = 3, checkpointEvery = 0)
      .as[(String, Long)].collect().toMap
    val ckpt = WebGraph.hostRank(df, iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(plain == ckpt, "localCheckpoint is semantics-free")
    assert(plain("hub") > plain("leaf2"), "hub collects the star's mass")
    assert(plain == replay(edges, 3))
  }

  test("triangleCount: canonicalization, multigraph input, exact counts") {
    import spark.implicits._
    // path + one closing edge => exactly one triangle; duplicate and
    // reversed edges and a self-loop must not change anything
    val g1 = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
        ("b", "a"), ("d", "d"), ("a", "b"))
      .toDF("src", "dst")
    val Array(r1) = WebGraph.triangleCount(g1).collect()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == (4L, 4L, 1L))
    // K4 has C(4,3) = 4 triangles
    val nodes = Seq("w", "x", "y", "z")
    val k4 = (for { a <- nodes; b <- nodes if a < b } yield (a, b))
      .toDF("src", "dst")
    val Array(r2) = WebGraph.triangleCount(k4).collect()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == (4L, 6L, 4L))
    // triangle-free bipartite square
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("src", "dst")
    assert(WebGraph.triangleCount(sq).collect()(0).getLong(2) == 0L)
  }

  test("clusteringCoefficient: triangle with pendant = 3/5") {
    import spark.implicits._
    // K3 (a,b,c) + pendant edge (c,d): degrees 2,2,3,1 ->
    // wedges = 1+1+3+0 = 5, triangles = 1, coefficient = 0.6
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")).toDF("src", "dst")
    val Array(r) = WebGraph.clusteringCoefficient(g).collect()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == (5L, 1L, 0.6))
    // K4: wedges = 4 * C(3,2) = 12, triangles = 4 -> coefficient 1.0
    val nodes = Seq("w", "x", "y", "z")
    val k4 = (for { a <- nodes; b <- nodes if a < b } yield (a, b))
      .toDF("src", "dst")
    val Array(r2) = WebGraph.clusteringCoefficient(k4).collect()
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2)) == (12L, 4L, 1.0))
  }

  test("extractHrefs plan is map-only (no exchange before the explode output)") {
    import spark.implicits._
    val plan = Seq("<a href=\"https://x.com\">x</a>").toDF("h")
      .select(explode(WebGraph.extractHrefs(col("h"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"link extraction must not shuffle:\n$plan")
  }
}
