package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class AuditSpec extends SparkSpec {

  test("auditReport: one scan, metrics and verdicts per constraint") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), "A"), (2L, Some(20.0), "B"), (2L, None, "A"),
      (3L, Some(99.0), "C"), (4L, Some(-5.0), "A"))
      .toDF("id", "v", "flag")
    val got = Audit.auditReport(df, Seq(
        Audit.Complete("v", atLeast = 0.8),
        Audit.Unique("id", atLeast = 0.9),
        Audit.InRange("v", 0, 50, atLeast = 0.5),
        Audit.InSet("flag", Seq("A", "B"), atLeast = 0.9)))
      .as[(String, Double, Boolean)].collect()
      .map { case (c, m, p) => c -> (m, p) }.toMap
    assert(got("complete(v)") == (0.8, true))
    assert(got("unique(id)") == (0.8, false))         // 4 distinct / 5
    assert(got("in_range(v,0.0,50.0)") == (0.4, false)) // 10,20 of 5 rows
    assert(got("in_set(flag)") == (0.8, false))        // C fails
  }

  test("momentStats: hand-computed shape of a tiny distribution") {
    import spark.implicits._
    val df = (Seq.fill(1)(1.0) ++ Seq(2.0, 3.0, 4.0)).map(("a", _))
      .toDF("k", "value")
    val Array(r) = Audit.momentStats(df, "k", "value").collect()
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.5)       // mean
    assert(r.getDouble(3) == 1.25)      // population variance
    assert(r.getDouble(4) == 0.0)       // symmetric -> zero skew
    assert(r.getDouble(5) == -1.36)     // m4/m2^2 - 3 = 2.5625/1.5625 - 3
  }

  test("momentStats is partitioning-invariant (decimal sums)") {
    import spark.implicits._
    val vals = (1 to 500).map(i => ("k", (i % 37) + i * 0.001))
    val a = Audit.momentStats(vals.toDF("k", "value").repartition(1), "k", "value").collect()
    val b = Audit.momentStats(vals.toDF("k", "value").repartition(13), "k", "value").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("mutualInformation: hand-computed 2x2 MI and entropies") {
    import spark.implicits._
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val Array(r) = Audit.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .collect()
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) == 0.610864)  // H(a) = -(0.3 ln 0.3 + 0.7 ln 0.7)
    assert(r.getDouble(2) == 0.673012)  // H(b) = -(0.4 ln 0.4 + 0.6 ln 0.6)
    assert(r.getDouble(3) == 0.004022)  // sum p_ab ln(p_ab / (p_a p_b))
    // independence sanity: MI is tiny relative to either entropy
    assert(r.getDouble(3) < 0.01 * r.getDouble(1))
  }

  test("ksTest: hand-computed two-sample D on overlapping supports") {
    import spark.implicits._
    val rows = Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toDouble))
    val Array(r) = Audit.ksTest(rows.toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert((r.getLong(0), r.getLong(1)) == (4L, 4L))
    assert(r.getLong(2) == 8L)          // max |ca*nb - cb*na| at v=2..4
    assert(r.getDouble(3) == 0.5)       // F_a(2)=0.5 vs F_b(2)=0
  }

  test("ksTest: ties step the CDF atomically; identical samples give 0") {
    import spark.implicits._
    val tied = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 1.0), ("b", 2.0), ("b", 2.0))
    val Array(t) = Audit.ksTest(tied.toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert(t.getLong(2) == 3L && t.getDouble(3) == 0.333333) // D = 1/3
    val same = Seq("a", "b").flatMap(g => (1 to 9).map(v => (g, v * 1.0)))
    val Array(z) = Audit.ksTest(same.toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert(z.getLong(2) == 0L && z.getDouble(3) == 0.0)
  }

  test("psiReport: hand-computed terms under a full shift") {
    import spark.implicits._
    val rows = (1 to 8).map(v => ("ref", v.toDouble)) ++
      Seq(7, 8, 9, 10).map(v => ("cur", v.toDouble))
    val got = Audit.psiReport(rows.toDF("g", "v"), "g", "v", "ref", "cur",
        bins = 4).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == (2L, 0L, 0.183102))  // (1/12-1/4)*ln((1/12)/(1/4))
    assert(got(2L) == (2L, 0L, 0.183102))
    assert(got(3L) == (2L, 0L, 0.183102))
    assert(got(4L) == (2L, 4L, 0.549306))  // (3/4-1/4)*ln(3)
  }

  test("psiReport: heavy atom keeps cut multiplicity; no drift is zero") {
    import spark.implicits._
    val atom = Seq.fill(4)(("ref", 1.0)) ++ Seq.fill(4)(("ref", 5.0)) ++
      Seq(("cur", 1.0), ("cur", 6.0))
    val got = Audit.psiReport(atom.toDF("g", "v"), "g", "v", "ref", "cur",
        bins = 4).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ranks 2,4,6 all select cut values (1,1,5): bin 2 is emptied on
    // both slices, values in (1,5] skip to bin 3
    assert(got(2L) == (0L, 0L))
    assert(got(1L) == (4L, 1L) && got(3L) == (4L, 0L) && got(4L) == (0L, 1L))
    val same = Seq("ref", "cur").flatMap(g => (1 to 20).map(v => (g, v * 1.0)))
    val zero = Audit.psiReport(same.toDF("g", "v"), "g", "v", "ref", "cur",
      bins = 5)
    assert(zero.collect().forall(_.getDouble(3) == 0.0))
  }

  test("madOutliers: hand-computed median/MAD and robust verdict") {
    import spark.implicits._
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val Array(r) = Audit.madOutliers(df, "v").collect()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 5.5)   // middle-pair average of 1..9,1000
    assert(r.getDouble(2) == 2.5)   // median of |x - 5.5|
    // threshold 3 * 1.4826 * 2.5 = 11.12 — only the planted 1000 exceeds
    assert(r.getLong(3) == 1L)
  }

  test("welchT: hand-computed two-sample statistic") {
    import spark.implicits._
    // a = {1,2,3,4,5}: mean 3, var 2.5; b = {2,4,6}: mean 4, var 4
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("b", _))
    val Array(r) = Audit.welchT(rows.toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert((r.getLong(0), r.getLong(1)) == (5L, 3L))
    assert(r.getDouble(2) == -1.0)
    // se2 = 2.5/5 + 4/3 = 1.833333; t = -1/sqrt(1.833333) = -0.738549
    assert(r.getDouble(3) == -0.738549)
    // df = se2^2 / ((0.5^2/4) + (1.333333^2/2)) = 3.361111/0.951389
    assert(r.getDouble(4) == 3.5328, r.getDouble(4).toString)
  }

  test("chiSquare: hand-computed 2x2 statistic") {
    import spark.implicits._
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val Array(r) = Audit.chiSquare(rows.toDF("a", "b"), "a", "b").collect()
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 1L)
    // 4/12 + 4/18 + 4/28 + 4/42 = 0.793651 (rounded to 6)
    assert(r.getDouble(2) == 0.793651)
  }

  test("anovaF: hand-computed k-sample statistic; equal groups give F=0") {
    import spark.implicits._
    // a = {1,2,3} mean 2, b = {2,4,6} mean 4, grand 3
    // SSB = 3*1 + 3*1 = 6; SSW = 2 + 8 = 10; F = (6/1)/(10/4) = 2.4
    val rows = Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0).map(("b", _))
    val Array(r) = Audit.anovaF(rows.toDF("g", "v"), "g", "v").collect()
    assert((r.getLong(0), r.getLong(1)) == (6L, 2L))
    assert(r.getDouble(2) == 6.0, "ss_between")
    assert(r.getDouble(3) == 10.0, "ss_within")
    assert(r.getDouble(4) == 2.4, "f_stat")

    val same = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(1.0, 2.0, 3.0).map(("b", _))).toDF("g", "v")
    val Array(r2) = Audit.anovaF(same, "g", "v").collect()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(4) == 0.0)
  }

  test("woeIv: hand-computed smoothed WOE, symmetric categories mirror") {
    import spark.implicits._
    // x: 3 pos / 1 neg; y: 1 pos / 3 neg; tp = tn = 4, k = 2
    // pPos_x = 3.5/5 = 0.7, pNeg_x = 1.5/5 = 0.3 -> woe = ln(7/3)
    val rows = Seq.fill(3)(("x", 1)) ++ Seq(("x", 0)) ++
      Seq(("y", 1)) ++ Seq.fill(3)(("y", 0))
    val out = Audit.woeIv(rows.toDF("f", "y"), "f", col("y") === 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("x")._1 == 3L && out("x")._2 == 1L)
    assert(out("x")._3 == 0.847298)  // ln(7/3)
    assert(out("x")._4 == 0.338919)  // 0.4 * ln(7/3)
    assert(out("y")._3 == -0.847298 && out("y")._4 == 0.338919)
  }

  test("twoProportionZ: hand-computed pooled z") {
    import spark.implicits._
    // a: 4/10, b: 2/10 -> pool 0.3, se = sqrt(0.3*0.7*0.2), z = 0.9759
    val rows = (1 to 10).map(i => ("a", i <= 4)) ++
      (1 to 10).map(i => ("b", i <= 2))
    val Array(r) = Audit.twoProportionZ(rows.toDF("g", "s"), "g",
      col("s"), "a", "b").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 4L, 10L, 2L)))
    assert(r.getDouble(4) == 0.2)
    assert(r.getDouble(5) == 0.9759, r.getDouble(5).toString)
  }

  test("cusumChangepoint: planted level shift located exactly") {
    import spark.implicits._
    // 10 hours at 10.0 then 10 at 30.0: cusum peaks at the boundary
    // (hour index 9), max |cusum| = 10*|10-20| = 100, share = 0.5
    val events = (0 until 20).map(h =>
      (new java.sql.Timestamp(h * 3600000L),
        if (h < 10) 10.0 else 30.0)).toDF("ts", "v")
    val Array(r) = Audit.cusumChangepoint(events, "ts", "v").collect()
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 9L * 3600000000L, s"changepoint ${r.getLong(1)}")
    assert(r.getDouble(2) == 100.0)
    assert(r.getDouble(3) == 0.5)
    // partitioning invariance (integer-thousandths prefix is exact)
    val Array(r2) = Audit.cusumChangepoint(events.repartition(7), "ts", "v")
      .collect()
    assert(r.toSeq == r2.toSeq)
  }

  test("psiPanel == per-column psiReport on every (bin, counts, term)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      (if (i % 2 == 0) "ref" else "cur",
        i.toDouble,
        if (i % 11 == 0) None else Some(rng.nextInt(50).toDouble))
    }.toDF("g", "v1", "v2")
    val panel = Audit.psiPanel(df, "g", Seq("v1", "v2"), "ref", "cur")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    for (c <- Seq("v1", "v2")) {
      val single = Audit.psiReport(df, "g", c, "ref", "cur")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3))).toMap
      single.foreach { case (bin, v) =>
        assert(panel((c, bin)) == v, s"$c bin $bin: ${panel((c, bin))} vs $v")
      }
    }
    assert(panel.size == 20)
  }

  test("jackknifeSe: hand-computed leave-one-out blocks") {
    import spark.implicits._
    // ids 1..10, values 1..10, k=2: odd block sums 25, even 30;
    // theta = {5, 6}, tbar 5.5, SE = sqrt((1/2)*0.5) = 0.5
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val Array(r) = Audit.jackknifeSe(df, "v", "id", k = 2).collect()
    assert((r.getLong(0), r.getLong(1)) == (10L, 2L))
    assert(r.getDouble(2) == 5.5)
    assert(r.getDouble(3) == 0.5)
    // partitioning-invariant (DECIMAL block sums, round-9 reductions)
    val Array(r2) = Audit.jackknifeSe(df.repartition(7), "v", "id", k = 2)
      .collect()
    assert(r.toSeq == r2.toSeq)
  }

  test("gini: equal values give 0, single holder gives 1 - 1/n") {
    import spark.implicits._
    val equal = (1 to 8).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val Array(r) = Audit.gini(equal, "v", Seq("id")).collect()
    assert(r.getLong(0) == 8L && r.getDouble(2) == 0.0)

    val oneHolder = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 10.0))
      .toDF("id", "v")
    val Array(r2) = Audit.gini(oneHolder, "v", Seq("id")).collect()
    assert(r2.getDouble(1) == 10.0)    // total
    assert(r2.getDouble(2) == 0.75)    // 1 - 1/4
  }

  test("jsDrift: identical slices give 0, disjoint give ln 2") {
    import spark.implicits._
    val same = (Seq.fill(5)(("a", "k1")) ++ Seq.fill(3)(("a", "k2")) ++
      Seq.fill(5)(("b", "k1")) ++ Seq.fill(3)(("b", "k2"))).toDF("g", "k")
    val Array(r) = Audit.jsDrift(same, "g", "k", "a", "b").collect()
    assert((r.getLong(0), r.getLong(1)) == (8L, 8L))
    assert(r.getDouble(2) == 0.0)

    val disjoint = (Seq.fill(4)(("a", "k1")) ++ Seq.fill(4)(("b", "k2")))
      .toDF("g", "k")
    val Array(r2) = Audit.jsDrift(disjoint, "g", "k", "a", "b").collect()
    assert(r2.getDouble(2) == 0.693147)  // ln 2 — JS's upper bound
  }

  test("mannWhitney: hand-computed U and tie-corrected z") {
    import spark.implicits._
    // A = {1, 2, 2}, B = {2, 3}: ranks (avg ties) 1, 3, 3, 3, 5
    // R_A = 7, U = 7 - 6 = 1; mu = 3; ties: t=3 -> 24
    // sigma2 = (6/12) * (6 - 24/20) = 2.4; z = (1-3)/sqrt(2.4)
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0),
      ("b", 3.0))).toDF("g", "v")
    val Array(r) = Audit.mannWhitney(df, "g", "v", "a", "b").collect()
    assert((r.getLong(0), r.getLong(1)) == (3L, 2L))
    assert(r.getDouble(2) == 1.0)
    assert(math.abs(r.getDouble(3) - (-2.0 / math.sqrt(2.4))) < 1e-6)
    val again = Audit.mannWhitney(df, "g", "v", "a", "b").collect()(0)
    assert(r.toSeq == again.toSeq)
  }

  test("cramersV: perfect association gives 1, independence gives 0") {
    import spark.implicits._
    val perfect = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val Array(r) = Audit.cramersV(perfect, "a", "b").collect()
    assert(r.getLong(0) == 20L && r.getLong(1) == 1L)
    assert(r.getDouble(3) == 1.0)
    // balanced independent table: chi2 = 0
    val indep = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("x", "q")) ++
      Seq.fill(5)(("y", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val Array(r2) = Audit.cramersV(indep, "a", "b").collect()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("spearman: monotone gives 1, reversed gives -1, ties hand case") {
    import spark.implicits._
    val mono = (1 to 10).map(i => (i.toDouble, math.exp(i.toDouble)))
      .toDF("x", "y")
    assert(Audit.spearman(mono, "x", "y").collect()(0).getDouble(1) == 1.0)
    val rev = (1 to 10).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(Audit.spearman(rev, "x", "y").collect()(0).getDouble(1) == -1.0)
    // ties: x = (1,2,2,3), y = (1,1,2,2) -> ranks x: 1, 2.5, 2.5, 4;
    // y: 1.5, 1.5, 3.5, 3.5; pearson of those = 0.777714 (hand)
    val t = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (3.0, 2.0))
      .toDF("x", "y")
    val rho = Audit.spearman(t, "x", "y").collect()(0).getDouble(1)
    // direct pearson over the average ranks
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.5, 1.5, 3.5, 3.5)
    val n = 4.0
    val cov = rx.zip(ry).map { case (a, b) => a * b }.sum - rx.sum * ry.sum / n
    val vx = rx.map(a => a * a).sum - rx.sum * rx.sum / n
    val vy = ry.map(a => a * a).sum - ry.sum * ry.sum / n
    assert(math.abs(rho - cov / math.sqrt(vx * vy)) < 1e-6)
  }

  test("leveneBf: unequal spreads flagged, identical spreads give F = 0") {
    import spark.implicits._
    // group a tight around 10 (z = 1 each), group b wide (z = 9 each);
    // medians: a -> 10, b -> 10; BF is ANOVA on |x - med_g|
    val df = (Seq(9.0, 10.0, 11.0, 9.0, 11.0).map(("a", _)) ++
      Seq(1.0, 10.0, 19.0, 1.0, 19.0).map(("b", _))).toDF("g", "v")
    val Array(r) = Audit.leveneBf(df, "g", "v").collect()
    assert((r.getLong(0), r.getLong(1)) == (10L, 2L))
    assert(r.getDouble(4) > 10.0, r.toString) // clearly heteroscedastic
    // same spread in both groups: z-values identical -> F = 0
    val same = (Seq(9.0, 10.0, 11.0).map(("a", _)) ++
      Seq(109.0, 110.0, 111.0).map(("b", _))).toDF("g", "v")
    val Array(q) = Audit.leveneBf(same, "g", "v").collect()
    assert(q.getDouble(4) == 0.0, q.toString)
  }

  test("bhFdr: drifted segments rejected, on-rate ones kept, prefix rule") {
    import spark.implicits._
    // 4 segments x 200 rows; global rate ~ 0.30. segments 0/1 sit at the
    // pooled rate; 2 and 3 drift hard in opposite directions
    def seg(id: Int, pos: Int, n: Int) =
      (0 until n).map(i => (id, i < pos))
    val df = (seg(0, 60, 200) ++ seg(1, 62, 200) ++
      seg(2, 130, 200) ++ seg(3, 5, 200)).toDF("s", "y")
    val out = Audit.bhFdr(df, "s", col("y"), q = 0.1)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(out(2)._3 && out(3)._3, s"drifted segments must reject: $out")
    assert(!out(0)._3 && !out(1)._3, s"on-rate segments must hold: $out")
    // step-up structure: the rejected set is exactly a prefix of ranks
    val rejectedRanks = out.values.filter(_._3).map(_._2).toSeq.sorted
    assert(rejectedRanks == (1L to rejectedRanks.length))
    // p-values sane: two-sided in (0, 1], monotone with the rank
    val byRank = out.values.toSeq.sortBy(_._2).map(_._1)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    assert(byRank.forall(p => p >= 0.0 && p <= 1.0000001))
  }

  test("bootstrapCi: brackets the mean, zero-variance degenerates, " +
    "identical under any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map(i => (i.toLong, "a", 50.0 + rnd.nextGaussian() * 10)) ++
      (0 until 300).map(i => (1000L + i, "b", 7.0)) // constant group
    val df = spark.createDataFrame(rows).toDF("id", "g", "x")
    def run(parts: Int) = Audit.bootstrapCi(df.repartition(parts), "g", "x", "id", b = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val out = run(3)
    val (n, mean, lo, hi) = out("a")
    assert(n == 400L)
    assert(lo < mean && mean < hi, s"interval must bracket the mean: $out")
    assert(hi - lo > 0.1 && hi - lo < 10.0, s"width sane for sigma=10,n=400: $out")
    // constant column: every replicate mean is exactly 7 -> zero width
    assert(out("b") == ((300L, 7.0, 7.0, 7.0)), s"degenerate: ${out("b")}")
    // weights hash the ROW, not the partition: CI is partitioning-proof
    assert(run(13) == out, "bootstrap CI must not depend on partitioning")
  }
}
