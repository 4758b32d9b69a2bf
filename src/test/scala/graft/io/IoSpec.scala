package graft.io

import graft.SparkSpec
import graft.core.Tables

class IoSpec extends SparkSpec {

  test("B16 savePair writes train/test with one shared version that validates") {
    val dir = graft.queries.Q.tempDir("pair")
    val df = Tables.region(spark, sf)
    val tracker = new MetaTracker
    tracker.addChange("balanced with SMOTE")
    val (trainPath, testPath) = VersionedCsv.savePair(df, df, dir, "sales", tracker)
    assert(trainPath.endsWith("sales_train_v1.csv"))
    assert(testPath.endsWith("sales_test_v1.csv"))
    val (back, meta) = VersionedCsv.readVersioned(spark, trainPath)
    assert(back.count() == df.count())
    assert(meta.version == 1)
  }

  test("S12 trial log: append, read back, resume picks best") {
    val path = graft.queries.Q.tempDir("trials") + "/study.jsonl"
    TrialLog.append(path, TrialLog.Trial(0, Map("d" -> "3"), 0.7))
    TrialLog.append(path, TrialLog.Trial(1, Map("d" -> "7"), 0.9))
    // "resume": a new writer continues from what's on disk
    val resumed = TrialLog.read(path)
    assert(resumed.map(_.number) == Seq(0, 1))
    TrialLog.append(path, TrialLog.Trial(resumed.size, Map("d" -> "5"), 0.8))
    assert(TrialLog.bestTrial(path).get.value == 0.9)
    assert(TrialLog.read(path).size == 3)
  }

  test("S10/S11 template and description files round-trip") {
    val dir = graft.queries.Q.tempDir("tmpl")
    val template = Map(
      "age" -> Nil,
      "sex" -> Seq("F", "M"),
      "priority" -> Seq("1-URGENT", "2-HIGH"))
    TemplateIo.writeQuestionTemplate(s"$dir/q.txt", template)
    val back = TemplateIo.readQuestionTemplate(s"$dir/q.txt")
    assert(back.keySet == template.keySet)
    assert(back("sex")._2 == Seq("F", "M"))
    assert(back("age")._2.isEmpty)
    assert(back("priority")._2 == Seq("1-URGENT", "2-HIGH"))

    val desc = Map("age" -> "age in years", "sex" -> "biological sex")
    TemplateIo.writeDescriptions(s"$dir/d.txt", desc)
    assert(TemplateIo.readDescriptions(s"$dir/d.txt") == desc)
  }

  test("M5 Compare.run returns per-model metrics with timing") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toDouble, i % 2 == 0))
      .map { case (x, y) => (x, if (y) 1.0 else 0.0) }.toDF("x", "y")
    val res = graft.ml.Compare.run(df, df, "y", graft.ml.Models.Classification,
      Seq("logreg", "rf"))
    assert(res.map(_.model) == Seq("logreg", "rf"))
    assert(res.forall(_.seconds > 0))
    assert(res.forall(_.metrics.contains("accuracy")))
  }
}
