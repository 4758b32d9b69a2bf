package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ml.Models.{Classification, Regression}

class MlSpec extends SparkSpec {

  /** Synthetic separable dataset: y = 1 iff 2*x1 - x2 > 0 (+ noise feat). */
  private lazy val synth = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 2000).map { i =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val noise = rng.nextGaussian()
      (i.toLong, x1, x2, noise, if (2 * x1 - x2 > 0) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "noise", "y").persist()
  }

  test("M1/M2 logistic regression learns a separable rule (acc > 0.9)") {
    val Array(tr, te) = synth.randomSplit(Array(0.8, 0.2), 1L)
    val m = Models.fit(tr, "y", "logreg", Classification)
    val metrics = Metrics.classificationMetrics(
      Models.transformLabeled(m, te, "y", Classification), "label", "prediction")
    assert(metrics("accuracy") > 0.9, s"accuracy ${metrics("accuracy")}")
  }

  test("M1 random forest regressor beats the mean baseline") {
    val Array(tr, te) = synth.randomSplit(Array(0.8, 0.2), 2L)
    val data = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("target", col("x1") * 3 + col("x2"))
    val m = Models.fit(data(tr).drop("y"), "target", "rf", Regression)
    val metrics = Metrics.regressionMetrics(
      Models.transformLabeled(m, data(te), "target", Regression), "label", "prediction")
    assert(metrics("r2") > 0.5, s"r2 ${metrics("r2")}")
  }

  test("M7 stratified CV: per-fold scores returned, all reasonable") {
    val scores = Validation.crossValidate(synth, "y", "logreg", Classification,
      k = 3, metric = "accuracy", orderCols = Seq("id"))
    assert(scores.size == 3)
    assert(scores.forall(_._2 > 0.85), scores.toString)
  }

  test("M8 random search returns trials sorted best-first") {
    val trials = Validation.randomSearch(synth, "y", "rf", Classification,
      space = Map("n_estimators" -> Seq(5, 20), "max_depth" -> Seq(2, 5)),
      nTrials = 3, k = 2, metric = "accuracy", orderCols = Seq("id"))
    assert(trials.size == 3)
    assert(trials.sliding(2).forall { case Seq(a, b) => a.mean >= b.mean; case _ => true })
    // multi-scoring: every trial carries the full metric dict (M9)
    assert(trials.forall(t => Seq("accuracy", "precision", "recall", "f1")
      .forall(t.metrics.contains)), trials.head.metrics.toString)
  }

  test("M11 learning curve: val score improves with more data") {
    val Array(tr, te) = synth.randomSplit(Array(0.8, 0.2), 3L)
    val curve = Validation.learningCurve(tr, te, "y", "logreg", Classification,
      fractions = Seq(0.1, 1.0), metric = "accuracy")
    assert(curve.size == 2)
    assert(curve.last.valScore >= curve.head.valScore - 0.05)
  }

  test("M3 weighted OvR AUC on perfect scores is 1.0") {
    import spark.implicits._
    val pred = Seq((0, 0.9, 0.1), (0, 0.8, 0.2), (1, 0.2, 0.8), (1, 0.1, 0.9))
      .toDF("label", "p0", "p1")
    val auc = Metrics.weightedOvrAuc(pred, "label",
      c => col(s"p$c"), Seq(0, 1))
    assert(math.abs(auc - 1.0) < 1e-9)
  }

  test("M12/M16 final train, persist, reload, single-row inference") {
    val dir = graft.queries.Q.tempDir("model")
    val Array(tr, te) = synth.randomSplit(Array(0.8, 0.2), 4L)
    val res = Inference.finalTrain(tr, te, "y", "logreg", Classification,
      Map.empty, "accuracy", dir, "synth")
    assert(res.metrics("accuracy") > 0.9)
    assert(res.metrics.contains("roc_auc") && res.metrics("roc_auc") > 0.95,
      res.metrics.toString)
    val reloaded = Inference.load(res.modelPath)
    val features = Seq("id", "x1", "x2", "noise")
    val pos = Inference.inferOne(spark, reloaded,
      Map("id" -> 1.0, "x1" -> 2.0, "x2" -> -1.0, "noise" -> 0.0), features)
    val neg = Inference.inferOne(spark, reloaded,
      Map("id" -> 1.0, "x1" -> -2.0, "x2" -> 1.0, "noise" -> 0.0), features)
    assert(pos == 1.0 && neg == 0.0, s"pos=$pos neg=$neg")
  }

  test("M6/M13 permutation importance ranks real features above noise") {
    val Array(tr, te) = synth.randomSplit(Array(0.8, 0.2), 5L)
    val m = Models.fit(tr, "y", "logreg", Classification)
    val imps = Importance.permutation(m, te, "y",
      Seq("x1", "x2", "noise"), Classification, metric = "accuracy", nRepeats = 2)
    val byName = imps.toMap
    assert(byName("x1") > byName("noise"), imps.toString)
    assert(byName("x2") > byName("noise"), imps.toString)
  }

  test("M6 native importances align with coefficients") {
    val m = Models.fit(synth, "y", "logreg", Classification)
    val imps = Importance.native(m, Seq("id", "x1", "x2", "noise")).toMap
    assert(imps("x1") > imps("noise"))
  }

  test("M13 linear SHAP is exact: phi_i = w_i (x_i - mu_i), completeness holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2.0, 10.0), (2L, 4.0, 20.0), (3L, 6.0, 60.0))
      .toDF("id", "a", "b")
    val w = Seq(3.0, -0.5)
    val shap = Importance.linearShap(df, Seq("a", "b"), w).orderBy("id")
      .select("phi_a", "phi_b").collect()
    // means: a = 4, b = 30 -> exact hand values
    assert(shap.map(_.getDouble(0)).toSeq == Seq(3.0 * -2.0, 0.0, 3.0 * 2.0))
    assert(shap.map(_.getDouble(1)).toSeq == Seq(-0.5 * -20.0, -0.5 * -10.0, -0.5 * 30.0))
    // completeness: sum_i phi_i(x) = f(x) - f(mu) for every row
    val b0 = 7.0
    val full = Importance.linearShap(df, Seq("a", "b"), w)
      .withColumn("fx", lit(3.0) * col("a") + lit(-0.5) * col("b") + lit(b0))
      .collect()
    val fmu = 3.0 * 4.0 - 0.5 * 30.0 + b0
    full.foreach { r =>
      val s = r.getAs[Double]("phi_a") + r.getAs[Double]("phi_b")
      assert(math.abs(s - (r.getAs[Double]("fx") - fmu)) < 1e-9)
    }
    // explicit background frame overrides the scored frame's means
    val bg = Seq((9L, 0.0, 0.0)).toDF("id", "a", "b")
    val z = Importance.linearShap(df, Seq("a"), Seq(2.0), background = Some(bg))
      .orderBy("id").select("phi_a").collect().map(_.getDouble(0)).toSeq
    assert(z == Seq(4.0, 8.0, 12.0))
  }

  test("M10 adaptive search beats pure random at equal trial budget") {
    // seeded quadratic objective with a unique optimum at (21, 13): the
    // top-quantile resampler must find better configs than uniform draws
    // on average over seeds (equal budget, identical space)
    val space: Map[String, Seq[Any]] = Map(
      "x" -> (0 until 30).map(i => i: Any),
      "y" -> (0 until 30).map(i => i: Any))
    def obj(p: Models.Params): Double = {
      val x = p("x").toString.toDouble; val y = p("y").toString.toDouble
      -((x - 21) * (x - 21) + (y - 13) * (y - 13))
    }
    val seeds = (1L to 9L)
    def bestOf(exploit: Double): Double = seeds.map { s =>
      Validation.searchWith(space, nTrials = 30, seed = s, warmup = 6,
        quantile = 0.25, exploit = exploit)(obj).head.mean
    }.sum / seeds.size
    val adaptive = bestOf(0.5)
    val random = bestOf(0.0)
    assert(adaptive > random, s"adaptive $adaptive vs random $random")
  }

  test("M10 TPE sampler >= random AND >= quantile-adaptive on two seeded objectives") {
    // equal budget, identical space, averaged over seeds; objective 1 is
    // the separable gain quadratic, objective 2 an asymmetric LOSS bowl
    // exercising the higherIsBetter=false orientation end to end
    val space: Map[String, Seq[Any]] = Map(
      "x" -> (0 until 30).map(i => i: Any),
      "y" -> (0 until 30).map(i => i: Any))
    def quad(p: Models.Params): Double = {
      val x = p("x").toString.toDouble; val y = p("y").toString.toDouble
      -((x - 21) * (x - 21) + (y - 13) * (y - 13))
    }
    def bowl(p: Models.Params): Double = {
      val x = p("x").toString.toDouble; val y = p("y").toString.toDouble
      (x - 7) * (x - 7) + 2.0 * (y - 23) * (y - 23)
    }
    val seeds = (1L to 9L)
    def best(obj: Models.Params => Double, sampler: String, hib: Boolean): Double =
      seeds.map { s =>
        (sampler match {
          case "tpe" => Validation.searchTpe(space, nTrials = 30, seed = s,
            warmup = 6, higherIsBetter = hib)(obj)
          case "quantile" => Validation.searchWith(space, nTrials = 30, seed = s,
            warmup = 6, quantile = 0.25, exploit = 0.5, higherIsBetter = hib)(obj)
          case _ => Validation.searchWith(space, nTrials = 30, seed = s,
            warmup = 6, quantile = 0.25, exploit = 0.0, higherIsBetter = hib)(obj)
        }).head.mean
      }.sum / seeds.size
    for ((obj, hib) <- Seq((quad _, true), (bowl _, false))) {
      val tpe = best(obj, "tpe", hib)
      val quant = best(obj, "quantile", hib)
      val rand = best(obj, "random", hib)
      def beats(a: Double, b: Double) = if (hib) a >= b else a <= b
      assert(beats(tpe, rand), s"tpe $tpe must beat random $rand (hib=$hib)")
      assert(beats(tpe, quant), s"tpe $tpe must beat quantile-adaptive $quant (hib=$hib)")
    }
    // the adaptiveSearch seam routes the sampler switch
    intercept[IllegalArgumentException] {
      Validation.adaptiveSearch(synth, "y", "logreg", Classification,
        space = Map("C" -> Seq(1.0)), nTrials = 1, sampler = "nope")
    }
  }

  test("M10 loss objectives: higherIsBetter=false exploits the LOW trials and ranks ascending") {
    // minimize a quadratic loss: with the orientation flag the adaptive
    // sampler must do at least as well as (and here better than) uniform
    // random, and the returned ranking must lead with the smallest loss
    val space: Map[String, Seq[Any]] = Map(
      "x" -> (0 until 30).map(i => i: Any),
      "y" -> (0 until 30).map(i => i: Any))
    def loss(p: Models.Params): Double = {
      val x = p("x").toString.toDouble; val y = p("y").toString.toDouble
      (x - 21) * (x - 21) + (y - 13) * (y - 13)
    }
    val seeds = (1L to 9L)
    def bestOf(exploit: Double): Double = seeds.map { s =>
      val trials = Validation.searchWith(space, nTrials = 30, seed = s, warmup = 6,
        quantile = 0.25, exploit = exploit, higherIsBetter = false)(loss)
      assert(trials.head.mean == trials.map(_.mean).min) // best-first = smallest loss
      trials.head.mean
    }.sum / seeds.size
    assert(bestOf(0.5) < bestOf(0.0),
      s"adaptive ${bestOf(0.5)} should beat random ${bestOf(0.0)} on a loss")
    // and the metric-name default wires through: mae is a loss
    assert(!Metrics.higherIsBetter("mae") && Metrics.higherIsBetter("f1"))
  }

  test("text classifier separates planted vocabularies and round-trips persistence") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(vocab: Seq[String]) = (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val good = Seq("clear", "prose", "relevant", "informative", "useful")
    val bad = Seq("spam", "click", "buy", "winner", "casino")
    // even ids draw from the good vocab and carry label 1
    val rows = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) doc(good) else doc(bad), if (i % 2 == 0) 1 else 0))
    val df = rows.toDF("id", "text", "y")
    val m = graft.ml.TextClassifier.train(df, "text", "y", numFeatures = 1 << 10)
    val scored = graft.ml.TextClassifier.score(m, df, "text")
    val acc = scored.filter(
      ((col("quality_prob") >= 0.5).cast("int")) === col("y")).count() / 40.0
    assert(acc >= 0.95, s"train accuracy $acc on separable vocab")
    // persistence round trip (S8 contract)
    val dir = java.nio.file.Files.createTempDirectory("txtclf").toString + "/m"
    m.write.overwrite().save(dir)
    val back = org.apache.spark.ml.PipelineModel.load(dir)
    val again = graft.ml.TextClassifier.score(back, df, "text")
      .select("id", "quality_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val orig = scored.select("id", "quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == orig)
  }

  test("M10 adaptive search appends a resumable trial log") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m10_").toString
    val log = s"$dir/trials.jsonl"
    val space: Map[String, Seq[Any]] = Map("C" -> Seq(0.1, 1.0, 10.0))
    val df = synth
    Validation.adaptiveSearch(df, "y", "logreg", Classification, space,
      nTrials = 2, k = 2, metric = "accuracy", warmup = 1,
      orderCols = Seq("id"), logPath = Some(log))
    assert(graft.io.TrialLog.read(log).map(_.number) == Seq(0, 1))
    Validation.adaptiveSearch(df, "y", "logreg", Classification, space,
      nTrials = 1, k = 2, metric = "accuracy", warmup = 1,
      orderCols = Seq("id"), logPath = Some(log))
    // numbering resumed from the existing log (load_if_exists contract)
    assert(graft.io.TrialLog.read(log).map(_.number) == Seq(0, 1, 2))
  }

  test("liftGains: perfect ranking gives top-bucket lift = 1/base") {
    import spark.implicits._
    // scores 20..1, positives are the top half: each of buckets 1-5
    // holds 2 positives, 6-10 none; base rate 0.5
    val df = (1 to 20).map(i => (i.toLong, 21.0 - i, i <= 10))
      .toDF("id", "score", "y")
    val out = Metrics.liftGains(df, "score", col("y"), Seq("id"), 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out.keySet == (1 to 10).toSet)
    assert(out(1) == ((2L, 2L, 2L, 2.0, 0.2, 2.0)), out(1).toString)
    assert(out(5) == ((2L, 2L, 10L, 2.0, 1.0, 2.0)))
    assert(out(6) == ((2L, 0L, 10L, 0.0, 1.0, 1.666667)))
    assert(out(10) == ((2L, 0L, 10L, 0.0, 1.0, 1.0)))
  }

  test("liftGains: uneven n leaves bucket depths within one row; " +
    "partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 23).map(i => (i.toLong, i.toDouble, i % 2 == 0))
      .toDF("id", "score", "y")
    val rows = Metrics.liftGains(df, "score", col("y"), Seq("id"), 10)
      .collect()
    val depths = rows.map(_.getLong(1))
    assert(depths.sum == 23L && depths.forall(d => d == 2L || d == 3L))
    val again = Metrics.liftGains(df.repartition(7), "score", col("y"),
      Seq("id"), 10).collect().toSet
    assert(rows.toSet == again)
  }

  test("mcnemar: hand-computed discordant-pair statistic") {
    import spark.implicits._
    // truth all true; A right on 8 (wrong 2), B right on 5 (wrong 5),
    // overlap chosen so b = 4 (A-only), c = 1 (B-only)
    // stat = (|4-1|-1)^2 / 5 = 0.8
    val rows = Seq(
      (true, true, true), (true, true, true), (true, true, true),
      (true, true, true), (true, true, false), (true, true, false),
      (true, true, false), (true, true, false), (true, false, true),
      (true, false, false)).toDF("t", "a", "b")
    val Array(r) = Compare.mcnemar(rows, col("t"), col("a"), col("b"))
      .collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (10L, 4L, 1L))
    assert(r.getDouble(3) == 0.8)
    // identical models: no discordant pairs -> null statistic
    val Array(q) = Compare.mcnemar(rows, col("t"), col("a"), col("a"))
      .collect()
    assert(q.isNullAt(3))
  }

  test("prCurve: hand-computed two-bucket operating points") {
    import spark.implicits._
    // high bucket: 3 pos + 1 neg; low bucket: 1 pos + 5 neg
    val df = (Seq.fill(3)((0.9, true)) ++ Seq((0.9, false)) ++
      Seq((0.1, true)) ++ Seq.fill(5)((0.1, false))).toDF("p", "y")
    val out = Metrics.prCurve(df, "p", col("y"), bins = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out(2) == ((0.5, 4L, 3L, 0.75, 0.75, 0.75)), out.toString)
    // threshold 0: everything predicted positive
    assert(out(1)._2 == 10L && out(1)._3 == 4L)
    assert(out(1)._4 == 0.4 && out(1)._5 == 1.0)
    assert(math.abs(out(1)._6 - 0.571429) < 1e-6)
  }

  test("cohenKappa: identical raters 1, hand-computed partial agreement") {
    import spark.implicits._
    val same = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val Array(r) = Compare.cohenKappa(same, col("a"), col("b")).collect()
    assert(r.getDouble(1) == 1.0 && r.getDouble(3) == 1.0, r.toString)
    // classic 2x2 hand case: agree 20+15 of 50; marginals a: 25/25,
    // b: 30/20 -> pe = 0.5*0.6 + 0.5*0.4 = 0.5; kappa = (0.7-0.5)/0.5
    val mixed = (Seq.fill(20)(("p", "p")) ++ Seq.fill(5)(("p", "q")) ++
      Seq.fill(10)(("q", "p")) ++ Seq.fill(15)(("q", "q"))).toDF("a", "b")
    val Array(m) = Compare.cohenKappa(mixed, col("a"), col("b")).collect()
    assert(m.getLong(0) == 50L)
    assert(m.getDouble(1) == 0.7 && m.getDouble(2) == 0.5)
    assert(math.abs(m.getDouble(3) - 0.4) < 1e-9, m.toString)
  }
}
