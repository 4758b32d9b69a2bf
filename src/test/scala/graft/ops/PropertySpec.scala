package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests (SURVEY §5): operator invariants over ScalaCheck-
  * generated frames. The scalatest/scalacheck bridge isn't in the offline
  * dependency set, so generation is driven directly: each property samples
  * `Trials` deterministic frames from a Gen. */
class PropertySpec extends SparkSpec {

  private val Trials = 5

  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until Trials).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, Option[Double], String)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 30L),
      Gen.option(Gen.choose(-100.0, 100.0)), Gen.oneOf("a", "b", "c")))

  test("winsorize clips into exact bounds, keeps rows, passes nulls and in-range values") {
    for (data <- samples(rowsGen) if data.count(_._2.isDefined) >= 10) {
      import spark.implicits._
      val df = data.map { case (k, v, c) => (k, v.map(Double.box).orNull, c) }
        .toDF("k", "x", "c").withColumn("x", col("x").cast("double"))
      val (lo, hi) = Relational.winsorizeBounds(df, "x", 10, 90)
      assert(lo <= hi)
      val out = Relational.winsorize(df, "x", 10, 90)
      assert(out.count() == df.count(), "winsorize never drops rows")
      assert(out.filter(col("x").isNull).count() ==
        df.filter(col("x").isNull).count(), "nulls pass through")
      assert(out.filter(col("x") < lo || col("x") > hi).count() == 0,
        "every non-null value lands inside the bounds")
      // strictly-inside values are untouched and gain no new members
      // (clipping maps outliers onto the bounds, never into the open
      // interval) — compare the (lo, hi) multisets
      val inside = (d: org.apache.spark.sql.DataFrame) =>
        d.filter(col("x") > lo && col("x") < hi).groupBy("x").count()
      val diff = inside(df).as("b")
        .join(inside(out).as("a"), Seq("x"), "full_outer")
        .filter(!(col("b.count") <=> col("a.count")))
      assert(diff.count() == 0, "open-interval multiset must be unchanged")
    }
  }

  test("imputation never changes non-null cells and fills every null (I1/I2)") {
    for (data <- samples(rowsGen) if data.exists(_._2.isDefined)) {
      import spark.implicits._
      val df = data.map { case (k, v, c) => (k, v.map(Double.box).orNull, c) }
        .toDF("k", "x", "c").withColumn("x", col("x").cast("double"))
      for (op <- Seq(Imputation.FillMean("x"), Imputation.FillMedian("x"))) {
        val out = op(df)
        assert(out.filter(col("x").isNull).count() == 0)
        // the multiset of original non-null values survives
        val before = df.filter(col("x").isNotNull).groupBy("x").count()
        val after = out.groupBy("x").count()
        val lost = before.as("b").join(after.as("a"), Seq("x"))
          .filter(col("a.count") < col("b.count"))
        assert(lost.count() == 0)
      }
    }
  }

  test("exactMedian (sort + rank selection) equals the in-memory median (A7)") {
    for (data <- samples(rowsGen)) {
      import spark.implicits._
      val df = data.map { case (k, v, c) => (k, v.map(Double.box).orNull, c) }
        .toDF("k", "x", "c").withColumn("x", col("x").cast("double"))
      val vals = data.flatMap(_._2).sorted
      val expected =
        if (vals.isEmpty) None
        else if (vals.size % 2 == 1) Some(vals(vals.size / 2))
        else Some((vals(vals.size / 2 - 1) + vals(vals.size / 2)) / 2.0)
      val got = Relational.exactMedian(df, "x")
      assert(got.map(BigDecimal(_).setScale(9, BigDecimal.RoundingMode.HALF_UP)) ==
        expected.map(BigDecimal(_).setScale(9, BigDecimal.RoundingMode.HALF_UP)),
        s"got $got want $expected over ${vals.size} values")
    }
  }

  test("dedupKeepFirst returns exactly ONE input row per key, min tiebreaker (A12)") {
    for (data <- samples(rowsGen) if data.nonEmpty) {
      import spark.implicits._
      // duplicate every row so rows tying on (keys, tiebreaker) exist —
      // the r3-ADVICE case the old min+leftsemi shape kept twice
      val df = (data ++ data).map { case (k, v, c) => (k, v.getOrElse(0.0), c) }
        .toDF("k", "x", "c")
      val out = Relational.dedupKeepFirst(df, Seq("c"), "k")
      val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      val perKey = rows.groupBy(_._3)
      assert(rows.length == perKey.size, "more than one survivor for some key")
      val minK = data.groupBy(_._3).map { case (c, rs) => c -> rs.map(_._1).min }
      perKey.foreach { case (c, rs) => assert(rs.head._1 == minK(c)) }
      // every survivor is a real input row
      val input = (data ++ data).map { case (k, v, c) => (k, v.getOrElse(0.0), c) }.toSet
      rows.foreach(r => assert(input.contains(r)))
    }
  }

  test("trim never exceeds N per class and never invents rows (B12)") {
    for (data <- samples(rowsGen) if data.nonEmpty; n <- Seq(1L, 3L, 10L)) {
      import spark.implicits._
      val df = data.map { case (k, v, c) => (k, v.getOrElse(0.0), c) }.toDF("k", "x", "c")
      val out = Balancing.TrimEqual("c", n, orderCols = Seq("k", "x"))(df)
      assert(out.groupBy("c").count().collect().forall(_.getLong(1) <= n))
      assert(out.join(df, Seq("k", "x", "c"), "left_anti").count() == 0)
    }
  }

  test("label encoding is injective and alphabetical on categories (E2)") {
    val catsGen = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
    for (cats <- samples(catsGen)) {
      import spark.implicits._
      val df = cats.zipWithIndex.map { case (c, i) => (i, c) }.toDF("i", "c")
      val mapping = Encoding.LabelEncode("c")(df)
        .select("c", "c_label").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sorted = cats.distinct.sorted
      assert(mapping.size == sorted.size)
      sorted.zipWithIndex.foreach { case (c, i) => assert(mapping(c) == i.toLong, c) }
    }
  }

  test("hash ops stay in range [0, n) and are deterministic (H2/H5)") {
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.alphaNumStr), Gen.choose(2, 64))
    for ((vals, n) <- samples(gen)) {
      import spark.implicits._
      val df = vals.toDF("c")
      for (op <- Seq(Hashing.FeatureHash("c", n), Hashing.UniversalHash("c", n))) {
        val out1 = op(df).select("c_hashed").collect().map(_.getLong(0))
        assert(out1.forall(h => h >= 0 && h < n))
        val out2 = op(df).select("c_hashed").collect().map(_.getLong(0))
        assert(out1.sameElements(out2))
      }
    }
  }

  test("merge-interval remaps inside values and leaves outside values (P7)") {
    val gen = Gen.zip(rowsGen, Gen.choose(-50.0, 0.0), Gen.choose(0.0, 50.0))
    for ((data, lo, hi) <- samples(gen) if data.nonEmpty && lo <= hi) {
      import spark.implicits._
      val df = data.map { case (k, v, c) => (k, v.getOrElse(0.0), c) }.toDF("k", "x", "c")
      val out = Relational.MergeInterval("x", lo, hi, lo)(df)
      assert(out.filter(col("x").between(lo, hi) && col("x") =!= lo).count() == 0)
      val outside = df.filter(!col("x").between(lo, hi)).groupBy("x").count()
      val outsideAfter = out.filter(!col("x").between(lo, hi)).groupBy("x").count()
      assert(outside.except(outsideAfter).count() == 0)
    }
  }

  test("normalizeText is idempotent; deterministicShuffle is a stable permutation") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.listOfN(8,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.oneOf(
        "café", "á", "“q”", "–", "—", "xy", " ", "  ", ""))))
    for (docs <- samples(gen)) {
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val once = df.select(col("doc_id"), Text.normalizeText(col("text")).as("n1"))
      val twice = once.select(col("doc_id"), Text.normalizeText(col("n1")).as("n2"),
        col("n1"))
      assert(twice.filter(col("n1") =!= col("n2")).count() == 0,
        "normalizeText must be a fixpoint after one application")
      val r1 = Corpus.deterministicShuffle(df, "doc_id")
        .select("doc_id", "shuffle_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val r2 = Corpus.deterministicShuffle(df, "doc_id")
        .select("doc_id", "shuffle_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(r1 == r2, "shuffle must be run-stable")
      assert(r1.values.toSeq.sorted == (0L until docs.size.toLong),
        "ranks must be a 0-based permutation")
    }
  }

  test("chunkDocs: zero-overlap chunks partition the tokens exactly; overlap covers (t16)") {
    val docGen = Gen.listOfN(6, Gen.zip(Gen.choose(0, 60),
      Gen.choose(3, 12), Gen.choose(0, 2)))
    for (specs <- samples(docGen)) {
      import spark.implicits._
      val docs = specs.zipWithIndex.map { case ((nTok, _, _), i) =>
        (i.toLong, (0 until nTok).map(t => s"d${i}t$t").mkString(" "))
      }.toDF("doc_id", "text")
      for ((_, chunk, overlap) <- specs.take(1)) { // one (chunk, overlap) per frame
        val out = Corpus.chunkDocs(docs, "text", "doc_id", chunk, overlap)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        specs.zipWithIndex.foreach { case ((nTok, _, _), i) =>
          val mine = out.filter(_._1 == i.toLong).sortBy(_._2)
          val toks = if (nTok == 0) Seq("") else (0 until nTok).map(t => s"d${i}t$t")
          // coverage: every token appears in >= 1 chunk, in order
          val stride = chunk - overlap
          mine.zipWithIndex.foreach { case ((_, k, text), idx) =>
            assert(k == idx, "chunk ids are dense from 0")
            assert(text == toks.slice(k * stride, k * stride + chunk).mkString(" "),
              s"doc $i chunk $k content")
          }
          // zero overlap: concatenation reconstructs the doc exactly
          if (overlap == 0)
            assert(mine.map(_._3).mkString(" ") == toks.mkString(" "), s"doc $i partition")
          // last chunk reaches the end
          assert(mine.nonEmpty && {
            val (_, k, _) = mine.last; k * stride + chunk >= toks.size
          }, s"doc $i tail coverage")
        }
      }
    }
  }

  private val eventsGen: Gen[List[(Long, Long, Double, String)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 5000L),
      Gen.choose(0.0, 100.0), Gen.oneOf("x", "y", "z")))

  test("sessionize partitions the events: counts sum to n, durations bound gaps") {
    for (data <- samples(eventsGen) if data.nonEmpty) {
      import spark.implicits._
      val gap = 300L * 1000000 // 5 min in us
      val df = data.zipWithIndex.map { case ((u, sec, v, _), i) =>
        (u, new java.sql.Timestamp(sec * 1000), i.toLong, v)
      }.toDF("user_id", "ts", "event_id", "value")
      val sess = Timeseries.sessionize(df, "user_id", "ts", "event_id", gap)
        .collect()
      assert(sess.map(_.getLong(2)).sum == df.count(),
        "every event lands in exactly one session")
      // a session's duration is at most (n_events - 1) * gap, by the
      // gap rule; single-event sessions have zero duration
      sess.foreach { r =>
        val (n, dur) = (r.getLong(2), r.getLong(5))
        assert(dur <= (n - 1) * gap, s"duration $dur exceeds rule for n=$n")
        if (n == 1) assert(dur == 0)
      }
      // session ids are 1..k per user with no holes
      sess.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val ids = rows.map(_.getLong(1)).sorted.toSeq
        assert(ids == (1L to ids.size.toLong))
      }
    }
  }

  test("stateIslands covers every row once; merging islands replays the input runs") {
    for (data <- samples(eventsGen) if data.nonEmpty) {
      import spark.implicits._
      val df = data.zipWithIndex.map { case ((u, sec, _, st), i) =>
        (u, new java.sql.Timestamp(sec * 1000), i.toLong, st)
      }.toDF("user_id", "ts", "event_id", "event_type")
      val isl = Timeseries.stateIslands(df, "user_id", "ts", "event_id",
        "event_type").collect()
      assert(isl.map(_.getLong(4)).sum == df.count(), "islands cover all rows")
      // islands of one user are ordered and non-overlapping (a shared
      // boundary timestamp is possible only when the state flips
      // between two equal-timestamp events)
      isl.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r.getLong(2), r.getLong(3)))
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a.getLong(3) <= b.getLong(2), "islands ordered, non-overlapping")
          case _ => ()
        }
      }
    }
  }

  test("twap lies within [min, max] of the entity's values") {
    for (data <- samples(eventsGen) if data.nonEmpty) {
      import spark.implicits._
      val df = data.zipWithIndex.map { case ((u, sec, v, _), i) =>
        (u, new java.sql.Timestamp(sec * 1000), i.toLong, math.rint(v * 1000) / 1000)
      }.toDF("user_id", "ts", "event_id", "value")
      val bounds = df.groupBy("user_id")
        .agg(min("value").as("lo"), max("value").as("hi"))
      val joined = Timeseries.twap(df, "user_id", "ts", "event_id", "value")
        .join(bounds, "user_id").collect()
      joined.foreach { r =>
        val (t, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        assert(t >= lo - 1e-6 && t <= hi + 1e-6, s"twap $t outside [$lo, $hi]")
      }
    }
  }

  private val pairsGen: Gen[List[(Long, Double, Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L),
      // coarse-quantized dists plant plenty of TIES; a sprinkle of the
      // same id under different dists exercises the (dist, id) tie-break
      Gen.choose(0, 7).map(_ * 0.5), Gen.choose(0L, 25L), Gen.choose(0L, 9L)))

  test("topk_pairs / topk_pairs_tag == sorted-take reference on random tied streams") {
    for (data <- samples(pairsGen) if data.nonEmpty) {
      import spark.implicits._
      val k = 4
      // one deterministic tag per (g, dist, id) — duplicate (dist, id)
      // inserts occupy separate buffer slots by design, so the property
      // feeds unique keys and checks ordering + tag transport
      val rows = data.groupBy(r => (r._1, r._2, r._3))
        .map { case ((g, d, i), dup) => (g, d, i, dup.map(_._4).min) }.toList
      val df = rows.toDF("g", "d", "i", "t")
      val viaTag = df.groupBy("g")
        .agg(call_function("topk_pairs_tag", col("d"), col("i"), col("t"), lit(k)).as("tk"))
        .select(col("g"), explode(col("tk")).as("p"))
        .select(col("g"), col("p.dist"), col("p.nbr_id"), col("p.tag"))
        .as[(Long, Double, Long, Long)].collect().toSet
      val viaPlain = df.groupBy("g")
        .agg(call_function("topk_pairs", col("d"), col("i"), lit(k)).as("tk"))
        .select(col("g"), explode(col("tk")).as("p"))
        .select(col("g"), col("p.dist"), col("p.nbr_id"))
        .as[(Long, Double, Long)].collect().toSet
      val expect = rows.groupBy(_._1).flatMap { case (_, grp) =>
        grp.sortBy { case (_, d, i, _) => (d, i) }.take(k)
      }.toSet
      assert(viaTag == expect, "tagged mismatch vs sorted-take reference")
      assert(viaPlain == expect.map { case (g, d, i, _) => (g, d, i) },
        "plain/tagged ranking diverged")
    }
  }
  test("kll_quantiles: the rank-error contract holds for RANDOM data, k, " +
    "and partitioning (the bound is order-independent by accounting)") {
    import spark.implicits._
    val cfgGen = Gen.zip(
      Gen.listOfN(1200, Gen.choose(-1e6, 1e6)),
      Gen.oneOf(8, 16, 32, 64),
      Gen.choose(1, 17))
    for ((values, k, parts) <- samples(cfgGen)) {
      val probs = Seq(0.1, 0.5, 0.9, 1.0)
      val row = values.toDF("x").repartition(parts)
        .agg(call_function("kll_quantiles", col("x"), lit(k),
          array(probs.map(lit): _*)).as("sk"))
        .select("sk.n", "sk.err", "sk.est").head()
      val n = row.getLong(0)
      val err = row.getLong(1)
      val est = row.getSeq[Double](2)
      assert(n == values.size.toLong)
      val sorted = values.sorted
      probs.zipWithIndex.foreach { case (prob, i) =>
        val r = math.max(1L, math.ceil(prob * n).toLong)
        val lt = sorted.count(_ < est(i)).toLong
        val le = sorted.count(_ <= est(i)).toLong
        assert(lt + 1 <= r + err && le >= r - err,
          s"k=$k parts=$parts p=$prob est=${est(i)} err=$err violates")
      }
    }
  }

  test("hammingPairs: banding NEVER misses a pair within maxDist on " +
    "random 64-bit signatures (pigeonhole completeness)") {
    import spark.implicits._
    val sigGen = Gen.zip(
      Gen.listOfN(60, Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.oneOf(1, 3, 8))
    for ((raw, maxDist) <- samples(sigGen)) {
      // plant guaranteed-close pairs among the random signatures: flip
      // up to maxDist random bits of the first ten
      val rnd = new scala.util.Random(raw.hashCode)
      val planted = raw.take(10).map { s =>
        (0 until rnd.nextInt(maxDist + 1)).foldLeft(s)((acc, _) =>
          acc ^ (1L << rnd.nextInt(64)))
      }
      val sigs = (raw ++ planted).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val expected = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxDist
      } yield (ia, ib)).toSet
      val got = Dedup.hammingPairs(sigs.toDF("id", "h"), "h", "id",
        bits = 64, maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"maxDist=$maxDist missed ${expected -- got}, extra ${got -- expected}")
    }
  }
}
