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

  test("S5 wrapped-META header wraps at 150 chars on | boundaries and round-trips") {
    val t = new MetaTracker
    (1 to 12).foreach { i =>
      t.addChange(s"change number $i with a reasonably long description text")
      t.commit()
    }
    val lines = MetaTracker.wrappedLines(t)
    assert(lines.length > 1, "long history should wrap")
    assert(lines.forall(_.startsWith("# META: ")))
    assert(lines.forall(_.length <= 150), lines.map(_.length).toString)
    val back = MetaTracker.parseWrapped(lines)
    assert(back.version == 12)
    assert(back.historyPairs == t.historyPairs)
    // short history stays on one line
    val short = new MetaTracker
    short.addChange("import"); short.commit()
    assert(MetaTracker.wrappedLines(short) == Seq("# META: v1 import"))
  }

  test("S4 Excel roundtrip: header, values, ragged rows, escaping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_").toString
    val path = s"$dir/t.xlsx"
    ExcelSource.write(Seq(
      Seq("id", "name", "note"),
      Seq("1", "a<b&c", "x"),
      Seq("2", "plain", null), // missing trailing cell
      Seq("3", "z", "y")), path)
    val df = ExcelSource.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "note"))
    val rows = df.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("1", "a<b&c", "x"), ("2", "plain", null), ("3", "z", "y")))
  }

  test("S4 Excel reader resolves shared strings") {
    // hand-built minimal xlsx exercising t="s" cells + sharedStrings.xml
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_ss_").toString
    val path = s"$dir/ss.xlsx"
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8")); out.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>col</t></si><si><t>hello world</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42.5</v></c></row>""" +
        """</sheetData></worksheet>""")
    out.close()
    val df = ExcelSource.read(spark, path)
    assert(df.columns.toSeq == Seq("col", "_c1"))
    val r = df.collect().head
    assert(r.getString(0) == "hello world" && r.getString(1) == "42.5")
  }

  test("Jsonl read quarantines corrupt lines, skips blanks, keeps typed rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "hello world"}""",
        """{"doc_id": 2, "text": "quoted \" brace } inside"}""",
        "",                                  // blank: skipped entirely
        """{"doc_id": 3 "text": "missing comma"}""", // corrupt
        "not json at all",                   // corrupt
        """{"doc_id": "not a number", "text": "type mismatch"}""", // quarantined too
        "null"                               // JSON literal null: NULL STRUCT from
                                             // from_json -> quarantine, not an all-null good row
      ).mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val (good, bad) = Jsonl.read(spark, dir, schema)
    val rows = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "hello world"), (2L, "quoted \" brace } inside")),
      s"got $rows")
    val q = bad.collect().map(_.getString(0)).toSet
    assert(q == Set("""{"doc_id": 3 "text": "missing comma"}""", "not json at all",
      """{"doc_id": "not a number", "text": "type mismatch"}""", "null"),
      s"quarantine $q")
    // write + read round-trips exactly
    val out = s"$dir/out"
    Jsonl.write(good.filter(good("doc_id").isNotNull), out)
    val (back, none) = Jsonl.read(spark, out, schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "hello world"), (2L, "quoted \" brace } inside")))
    assert(none.count() == 0)
  }

  test("SkippingIndex: overlap files only, exact results, empty range") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_skip")
      .toString + "/data"
    spark.range(0, 1000).select(col("id").as("doc_id"),
        (col("id") % 7).as("grp"))
      .repartitionByRange(10, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    SkippingIndex.build(spark, dir, Seq("doc_id"))
    val cand = SkippingIndex.candidateFiles(spark, dir, "doc_id", 100L, 199L)
    val total = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(total >= 8, s"expected many files, got $total")
    assert(cand.nonEmpty && cand.size <= 3,
      s"range-clustered data must confine a 10% range to few files: ${cand.size} of $total")
    val got = SkippingIndex.prunedRead(spark, dir, "doc_id", 100L, 199L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (100L to 199L).toSeq, "pruned read must equal full filter")
    assert(SkippingIndex.prunedRead(spark, dir, "doc_id", 5000L, 6000L)
      .count() == 0, "out-of-range reads nothing")
    // the manifest dir is invisible to plain readers of the dataset
    assert(spark.read.parquet(dir).columns.toSeq == Seq("doc_id", "grp"))
  }

  test("ORC round-trips exactly and pushes filters into the OrcScan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
      .toString + "/docs"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq ==
      docs.collect().map(_.getLong(0)).sorted.toSeq, "round trip")
    val plan = back.filter(col("doc_id") < 10).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"filter must reach the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"projection must prune the ORC scan:\n$plan")
  }
}
