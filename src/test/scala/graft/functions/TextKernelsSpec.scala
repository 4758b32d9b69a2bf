package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextKernelsSpec extends SparkSpec {

  test("fingerprint64 matches the higher-order rolling-hash form") {
    import spark.implicits._
    val df = Seq("abc", "", "hello world again", "MiXeD CaSe 123").toDF("s")
    val both = df.select(
      call_function("fingerprint64", col("s")).as("native"),
      aggregate(split(col("s"), ""), lit(0L),
        (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1000000007L))).as("ho"))
    assert(both.filter(col("native") =!= col("ho")).count() == 0)
  }

  test("count_in counts occurrences (not distinct matches), skips nulls") {
    import spark.implicits._
    val df = Seq(
      (Seq("the", "cat", "the", "dog"), Seq("the", "dog")),
      (Seq.empty[String], Seq("x")),
      (Seq("a", "b"), Seq.empty[String])).toDF("a", "b")
    val out = df.select(call_function("count_in", col("a"), col("b"))).collect()
    assert(out(0).getLong(0) == 3) // the, the, dog — duplicates count
    assert(out(1).getLong(0) == 0)
    assert(out(2).getLong(0) == 0)
  }

  test("every graft extension function is callable from plain SQL") {
    val r = spark.sql(
      """SELECT unicode_sum('abc')                       AS us,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       fingerprint64('abc')                     AS fp,
        |       count_in(array('a', 'b', 'a'), array('a')) AS ci,
        |       simhash64(array('tok'), 16)              AS sh,
        |       ngram_stats(array('x', 'y', 'x', 'y'), 2).dup_ngram_frac AS dup
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 'a' + 'b' + 'c')
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(5) > 0.0) // "x y" appears twice among 3 grams
  }

  test("nfc_normalize composes combining marks; normalizeText cleans the kitchen sink") {
    import spark.implicits._
    // "cafe" + combining acute (U+0301) NFC-composes to café (U+00E9)
    val decomposed = "café"
    val out = Seq(decomposed).toDF("s")
      .select(call_function("nfc_normalize", col("s"))).collect().head.getString(0)
    assert(out == "café" && out.length == 4, s"got ${out.codePoints().toArray.toSeq}")
    // already-NFC input passes through (fast path, same value)
    val same = spark.sql("SELECT nfc_normalize('café')").collect().head.getString(0)
    assert(same == "café")
    val messy = "a\u0301  \u201Cq\u201D \u2013 \u2014 x\u0007y\u00A0 "
    val norm = Seq(messy).toDF("s")
      .select(graft.ops.Text.normalizeText(col("s"))).collect().head.getString(0)
    assert(norm == "á \"q\" - - x y", s"got '$norm'")
    val codegen = spark.range(5).select(call_function("nfc_normalize",
      col("id").cast("string"))).queryExecution.executedPlan.toString
    assert(codegen.contains("*(1) Project [nfc_normalize"), codegen)
  }

  test("clean_lines keeps prose, drops boilerplate lines; codegen; SQL-callable") {
    import spark.implicits._
    val doc = Seq(
      "Welcome to our site!",          // 4 words, terminal -> kept
      "Home | About | Contact",        // no terminal punct -> dropped
      "",                              // empty -> dropped
      "  Accept cookies  ",            // 2 words -> dropped
      "This sentence is real prose.",  // kept
      "short.",                        // 1 word -> dropped
      "Is this a question?"            // kept
    ).mkString("\n")
    val out = Seq(doc).toDF("t")
      .select(graft.ops.Text.cleanLines(col("t"))).collect().head.getString(0)
    assert(out == Seq("Welcome to our site!", "This sentence is real prose.",
      "Is this a question?").mkString("\n"), s"got '$out'")
    // requireTerminal=false keeps the nav line too (word rule only)
    val loose = Seq(doc).toDF("t")
      .select(graft.ops.Text.cleanLines(col("t"), requireTerminal = false))
      .collect().head.getString(0)
    assert(loose.contains("Home | About | Contact"))
    val sql = spark.sql("SELECT clean_lines('one two three.', 3, true)")
      .collect().head.getString(0)
    assert(sql == "one two three.")
    val plan = spark.range(5).select(call_function("clean_lines",
      col("id").cast("string"), lit(3), lit(true)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [clean_lines"), plan)
  }

  test("both kernels participate in whole-stage codegen") {
    val fp = spark.range(50)
      .select(call_function("fingerprint64", col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(fp.contains("*(1) Project [fingerprint64"), fp)
    val ci = spark.range(50)
      .select(array(col("id").cast("string")).as("a"))
      .select(call_function("count_in", col("a"), col("a")))
      .queryExecution.executedPlan.toString
    assert(ci.contains("*(1) Project [count_in"), ci)
  }

  test("gopherRules: hand-checked stats on adversarial text; map-only plan") {
    import spark.implicits._
    val spam = (Seq("- bullet one ...", "- bullet two ...", "* bullet # three") ++
      Seq("tail line without markers")).mkString("\n")
    val prose = ("the quick brown fox jumps over " * 12).trim // 72 words, no symbols
    val df = Seq((1L, spam), (2L, prose)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), graft.ops.Text.gopherRules(col("text")).as("g"))
      .select("doc_id", "g.*").collect().map(r => r.getLong(0) -> r).toMap
    val s = out(1L)
    assert(s.getAs[Long]("word_count") == 16L)
    assert(s.getAs[Double]("bullet_frac") == 0.75)   // 3 of 4 lines
    assert(s.getAs[Double]("ellipsis_frac") == 0.5)  // 2 of 4 lines
    assert(s.getAs[Long]("stop_hits") == 0L)
    assert(!s.getAs[Boolean]("passes"))
    val p = out(2L)
    assert(p.getAs[Long]("word_count") == 72L)
    assert(p.getAs[Double]("alpha_frac") == 1.0)
    assert(p.getAs[Double]("bullet_frac") == 0.0)
    assert(p.getAs[Boolean]("passes")) // 72 words, stopword 'the' x12, clean
    val plan = df.select(graft.ops.Text.gopherRules(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "gopherRules must be map-only")
  }
}
