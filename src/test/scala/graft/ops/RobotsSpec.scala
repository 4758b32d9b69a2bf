package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  private lazy val robots = {
    import spark.implicits._
    Seq(
      // wildcard group with allow-override, comments, empty Disallow,
      // then a SEPARATE bot group whose rules must not leak into *
      ("h1.com",
        """User-agent: *
          |Disallow: /private  # keep out
          |Allow: /private/ok
          |Disallow:
          |
          |User-agent: badbot
          |Disallow: /""".stripMargin),
      // consecutive user-agent lines share ONE group
      ("h2.com",
        """User-agent: badbot
          |User-agent: *
          |Disallow: /x""".stripMargin),
      // no wildcard group at all -> no rules for *
      ("h3.com",
        """User-agent: badbot
          |Disallow: /""".stripMargin))
      .toDF("host", "body")
  }

  test("parseRules: wildcard group only, comments/empties dropped, CRLF ok") {
    import spark.implicits._
    val rules = Robots.parseRules(robots, "host", "body")
      .as[(String, Int, String)].collect().toSet
    assert(rules == Set(
      ("h1.com", 0, "/private"),
      ("h1.com", 1, "/private/ok"),
      ("h2.com", 0, "/x")))
    // CRLF bodies parse identically
    val crlf = Robots.parseRules(
      robots.withColumn("body", regexp_replace(col("body"), "\n", "\r\n")),
      "host", "body").as[(String, Int, String)].collect().toSet
    assert(crlf == rules)
  }

  test("isAllowed: longest prefix wins, allow beats disallow, no-rule hosts pass") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://h1.com/private/secret"),   // disallow /private
      (2L, "https://h1.com/private/okay"),     // allow /private/ok (longer)
      (3L, "https://h1.com/public"),           // no match -> allowed
      (4L, "https://h1.com"),                  // root path '/' -> allowed
      (5L, "https://h2.com/x/y"),              // consecutive-ua group disallow
      (6L, "https://h3.com/anything"),         // no wildcard group
      (7L, "https://h9.com/whatever"))         // host without robots row
      .toDF("id", "url")
    val rules = Robots.parseRules(robots, "host", "body")
    val got = Robots.isAllowed(urls, "url", rules)
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> true, 7L -> true), got.toString)
  }

  test("isAllowed surfaces host and path; path keeps query out") {
    import spark.implicits._
    val urls = Seq((1L, "https://H1.com/a/b?q=1#f")).toDF("id", "url")
    val r = Robots.isAllowed(urls, "url",
      Robots.parseRules(robots, "host", "body"))
      .select("host", "path").head()
    assert(r.getString(0) == "h1.com" && r.getString(1) == "/a/b")
  }
}
