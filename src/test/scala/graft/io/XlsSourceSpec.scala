package graft.io

import graft.SparkSpec

class XlsSourceSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_xls").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/" + name
  }

  test("round trip: strings, RK ints, NUMBER doubles, nulls; header naming") {
    val path = tmp("basic.xls")
    XlsSource.write(Seq(
      Seq[Any]("id", "name", "score"),
      Seq[Any](1, "alpha", 1.5),
      Seq[Any](2, "beta", -2.25),
      Seq[Any](-3, null, 1e9)), path)
    val out = XlsSource.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("1", "alpha", "1.5"),
      ("2", "beta", "-2.25"),
      ("-3", null, "1000000000")))
  }

  test("unicode strings (UTF-16 run) and latin-1 compressed both survive") {
    val path = tmp("uni.xls")
    XlsSource.write(Seq(
      Seq[Any]("k", "v"),
      Seq[Any](1, "héllo"),        // latin-1, compressed run
      Seq[Any](2, "日本語テキスト"), // UTF-16 run
      Seq[Any](3, "mixed 値")), path)
    val out = XlsSource.read(spark, path).collect().map(_.getString(1))
    assert(out.toSeq == Seq("héllo", "日本語テキスト", "mixed 値"))
  }

  test("magic-byte dispatch: ExcelSource.read routes .xls content") {
    val path = tmp("sniffme.xlsx") // wrong extension on purpose
    XlsSource.write(Seq(Seq[Any]("a"), Seq[Any]("v1")), path)
    val out = ExcelSource.read(spark, path).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("v1"))
  }

  test("workbook stream above the 4096 cutoff uses regular FAT sectors") {
    val path = tmp("big.xls")
    val rows = Seq[Seq[Any]](Seq("id", "text")) ++
      (1 to 200).map(i => Seq[Any](i, s"row $i " + ("x" * 40)))
    XlsSource.write(rows, path)
    // stream is > 4096 bytes: 200 distinct ~47-char strings in the SST
    val df = XlsSource.read(spark, path)
    assert(df.count() == 200)
    val r42 = df.filter(org.apache.spark.sql.functions.col("id") === "42")
      .head().getString(1)
    assert(r42 == "row 42 " + ("x" * 40))
  }

  test("RK decoding: integer, x100, and truncated-double forms") {
    assert(XlsSource.decodeRk((7 << 2) | 2) == 7.0)
    assert(XlsSource.decodeRk((-11 << 2) | 2) == -11.0)
    assert(XlsSource.decodeRk(((325 << 2) | 2) | 1) == 3.25) // int/100
    // double form: high 30 bits of 2.5's IEEE bits, low 34 zero
    val bits = java.lang.Double.doubleToLongBits(2.5)
    val rk = ((bits >>> 32) & 0xFFFFFFFCL).toInt
    assert(XlsSource.decodeRk(rk) == 2.5)
  }

  test("numToString: whole numbers print without .0, fractions keep precision") {
    assert(XlsSource.numToString(3.0) == "3")
    assert(XlsSource.numToString(-17.0) == "-17")
    assert(XlsSource.numToString(2.5) == "2.5")
    assert(XlsSource.numToString(0.1) == "0.1")
  }
}
