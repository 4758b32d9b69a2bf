package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph curation for crawl corpora — the step AFTER [[graft.io.WarcSource]]
  * / [[Text.htmlToText]] / [[Urls]] in the Common Crawl path: extract the
  * link structure and rank hosts by centrality, the signal public crawl
  * curation uses to weight or gate domains (Common Crawl itself publishes
  * host-level harmonic/PageRank centrality for exactly this purpose).
  *
  * Scale shape: link extraction is one map-only codegen regex per row
  * (runs at scan speed on 100 TB of HTML, streaming-safe); the rank loop
  * is the canonical distributed PageRank — per iteration one hash join of
  * ranks into the edge list (keyed by source host) and one
  * map-side-combined aggregate (keyed by destination host). Hot hosts
  * (everyone links to wikipedia.org) collapse in partial aggregation
  * because the combine is an integer sum. Host graphs are corpus-SMALL
  * (hosts, not pages: tens of millions of rows for a full crawl), so the
  * iteration state is a slim (host, rank) table, never the corpus.
  *
  * Determinism contract: ranks are INTEGER token counts (see [[hostRank]])
  * — long sums are order-independent, so results are bit-identical under
  * retries, partitioning changes, AND engine replays (the DuckDB oracle
  * reproduces them exactly, which no floating-point PageRank can promise).
  */
object WebGraph {

  /** Raw `href` values of anchor tags in an HTML column — one row-local
    * codegen regex, Java/RE2 SHARED syntax (no lookaround, no
    * backreference) so the oracle replays it verbatim. `[^>]*?` keeps the
    * match inside one tag; the quote class accepts either quote style
    * (a mismatched-quote pair would also match — documented slack for a
    * regex extractor; real-world HTML needs exactly this tolerance). */
  def extractHrefs(c: Column): Column =
    regexp_extract_all(c,
      lit("(?i)<a\\b[^>]*?\\shref\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))

  /** (src host, dst host) edge list from crawl rows: explode the hrefs,
    * keep absolute http(s) links (relative links stay on-host and add no
    * cross-host signal), canonicalize, drop self-loops, distinct.
    * Map-only until the final distinct — the one shuffle this needs. */
  def hostEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(Urls.urlHost(col(urlCol)).as("src"),
        explode(extractHrefs(col(htmlCol))).as("__href"))
      .filter(col("__href").rlike("(?i)^https?://"))
      .select(col("src"),
        Urls.urlHost(Urls.canonicalizeUrl(col("__href"))).as("dst"))
      .filter(col("src") =!= col("dst") && col("dst") =!= "")
      .distinct()

  /** Global triangle count of the UNDIRECTED simple graph underlying an
    * edge list: one row (n_nodes, n_edges, triangles). Edges are
    * canonicalized to (min, max) and deduplicated (self-loops dropped),
    * so multigraph inputs are fine. Counting joins the oriented edge
    * list to itself twice under the a < b < c total order — every
    * triangle matches exactly one (a,b)(b,c)(a,c) pattern, so no
    * de-duplication pass is needed. String order is byte-wise in both
    * engines, hence replayable.
    *
    * Scale shape: both joins are EQUI-joins on a node key (never a
    * cross product); the wedge table (a,b)x(b,c) is the size of the
    * path-count, the standard distributed triangle algorithm (the
    * MapReduce NodeIterator++ shape). On power-law host graphs the
    * refinement is degree-ordered orientation — orient each edge toward
    * the higher-(degree, id) endpoint so every wedge pivots at its
    * LOWEST-degree vertex, bounding wedges by sum(min-deg per edge)
    * instead of sum(deg^2) at hubs; same joins, one extra degree
    * aggregate + broadcast. The lexicographic orientation here keeps
    * the oracle replay one line and is exact on any graph. */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val wedges = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges.join(und.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"))
    val nodes = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v"))).distinct()
    tris.agg(count(lit(1)).as("triangles"))
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n_nodes"))))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_nodes"), col("n_edges"), col("triangles"))
  }

  /** Global clustering coefficient: one row (wedges, triangles,
    * coefficient = 3*triangles/wedges). Wedges = sum over nodes of
    * C(deg, 2) — one degree aggregate over the canonical edge list
    * (integer arithmetic); triangles from [[triangleCount]]'s join
    * pair. The ratio of two exact longs is a deterministic double. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String = "src",
                            dstCol: String = "dst"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("__d"))
    val wedges = deg.agg(sum(col("__d") * (col("__d") - 1) / 2)
      .cast("long").as("wedges"))
    val tris = triangleCount(edges, srcCol, dstCol).select("triangles")
    broadcast(wedges).crossJoin(broadcast(tris))
      .select(col("wedges"), col("triangles"),
        round((lit(3.0) * col("triangles").cast("double")) /
          col("wedges").cast("double"), 6).as("coefficient"))
  }

  /** Integer-token PageRank over a host edge list.
    *
    * Every node starts with `seedTokens`. Per iteration, a node with
    * out-degree d sends each out-neighbor
    * `share = ((rank * dampNum) div dampDen) div d` tokens (integer
    * division throughout); everything NOT delivered anywhere — flooring
    * remainders plus the full rank of dangling nodes — forms the teleport
    * pool T, and every node additionally receives `T div n`. The
    * `T mod n` tail (< n tokens per iteration) evaporates: this is a
    * RANKING, not a probability distribution, and the payoff for the
    * leak is exact cross-engine replayability — all arithmetic is long
    * division and order-independent long sums, so Spark, an SQL oracle,
    * and a hand replay agree bit for bit (no float summation-order
    * hazard, no retry nondeterminism).
    *
    * Overflow bound: rank*dampNum stays below 2^63 while
    * n * seedTokens * dampNum < 2^63 — at the default seed of 1e9 that
    * allows ~1e8 hosts even if ALL mass concentrates on one node
    * (documented headroom; shrink seedTokens for larger graphs).
    *
    * Scale: per iteration ONE hash join (ranks into edges, keyed by src)
    * and ONE map-side-combined sum (keyed by dst); the teleport pool is
    * two scalar aggregates riding a 1-row broadcast.
    *
    * `checkpointEvery` (default 1) truncates lineage with an eager
    * localCheckpoint of the edge/degree base ONCE and of the rank frame
    * each Nth iteration. This is load-bearing, not hygiene: `ranks`
    * feeds two branches per iteration (contributions + the teleport
    * pool), so an unbroken lazy lineage DOUBLES per iteration — 2^K
    * plan copies, each re-reading the sources — where the checkpointed
    * loop computes every frame exactly once (the canonical iterative-
    * Spark shape). 0 keeps the fully lazy plan for inspection/tests.
    * At cluster scale prefer a reliable `sc.setCheckpointDir` checkpoint
    * for the same truncation with executor-loss tolerance (localCheckpoint
    * blocks die with their executor; documented trade).
    */
  def hostRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 5,
               dampNum: Long = 85L, dampDen: Long = 100L,
               seedTokens: Long = 1000000000L,
               checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointEvery > 0) df.transform(graft.core.Materialize.frame) else df
    val e = ckpt(edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct())
    val nodes = ckpt(e.select(col("__src").as("host"))
      .union(e.select(col("__dst"))).distinct())
    // node count: the ONE driver-side scalar (O(1) state; the dictionary-
    // collect pattern every encoder here uses)
    val n = nodes.count()
    val eDeg = ckpt(e.join(e.groupBy("__src").agg(count(lit(1)).as("__deg")),
      "__src"))
    var ranks = nodes.withColumn("rank_tokens", lit(seedTokens))
    for (i <- 1 to iterations) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("host", "__src"), "__src")
        .select(col("__dst"),
          call_function("div",
            call_function("div", col("rank_tokens") * lit(dampNum),
              lit(dampDen)),
            col("__deg")).as("__share"))
      val recv = contrib.groupBy("__dst").agg(sum("__share").as("__recv"))
      val pool = ranks.agg(sum("rank_tokens").as("__tot"))
        .crossJoin(recv.agg(sum("__recv").as("__sent")))
      val next = nodes
        .join(recv.withColumnRenamed("__dst", "host"), Seq("host"), "left")
        .crossJoin(broadcast(pool))
        .select(col("host"),
          (coalesce(col("__recv"), lit(0L)) +
            call_function("div",
              col("__tot") - coalesce(col("__sent"), lit(0L)), lit(n)))
            .as("rank_tokens"))
      ranks =
        if (checkpointEvery > 0 && i % checkpointEvery == 0)
          next.transform(graft.core.Materialize.frame)
        else next
    }
    ranks
  }
}
