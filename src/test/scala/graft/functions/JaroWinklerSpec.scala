package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("classic Winkler reference pairs") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
    // boost threshold: low-jaro pairs get NO prefix boost
    val low = jw("aaxxxxxxx", "aayyyyyyy") // shared prefix, jaro <= 0.7
    val expectJaro = (2.0 / 9 + 2.0 / 9 + 1.0) / 3.0
    assert(math.abs(low - expectJaro) < 1e-15, s"$low vs $expectJaro")
  }

  test("SQL function runs in codegen and handles nulls") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    val got = df.selectExpr("jaro_winkler(a, b) AS s").collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(math.abs(got(1).getDouble(0) - 0.84) < 1e-15)
    assert(got(2).isNullAt(0))
    // symmetric
    val sym = df.filter(col("a").isNotNull)
      .selectExpr("jaro_winkler(b, a) AS s").collect()
    assert(sym(0).getDouble(0) == got(0).getDouble(0))
  }

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("DamerauLevenshtein: unrestricted semantics, classic references") {
    assert(dl("CA", "ABC") == 2)      // UNRESTRICTED: OSA would give 3
    assert(dl("ab", "ba") == 1)       // adjacent transposition costs 1
    assert(dl("kitten", "sitting") == 3)
    assert(dl("abcdef", "abcfed") == 2)
    assert(dl("", "") == 0 && dl("a", "") == 1 && dl("", "ab") == 2)
    assert(dl("same", "same") == 0)
  }

  test("damerau_levenshtein SQL: transposition beats plain levenshtein") {
    import spark.implicits._
    val df = Seq(("jhon", "john"), ("smith", "smiht"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    val got = df.selectExpr("damerau_levenshtein(a, b) AS d",
      "levenshtein(a, b) AS l").collect()
    assert(got(0).getInt(0) == 1 && got(0).getInt(1) == 2)
    assert(got(1).getInt(0) == 1 && got(1).getInt(1) == 2)
    assert(got(2).isNullAt(0))
  }
}
