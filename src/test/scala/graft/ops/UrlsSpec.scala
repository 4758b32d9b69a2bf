package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlsSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(Urls.canonicalizeUrl(col("u"))).head().getString(0)
  }

  test("canonicalizeUrl: case, ports, fragments, tracking runs, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/X?a=1#frag") ==
      "https://www.example.com/Path/X?a=1")
    assert(canon("http://Host.example:80/") == "http://host.example")
    assert(canon("http://host.example:8080/x") == "http://host.example:8080/x",
      "non-default port survives")
    // adjacent tracking run collapses in one pass; real params keep order
    assert(canon("https://e.com/p?utm_source=a&utm_medium=b&x=3") ==
      "https://e.com/p?x=3")
    assert(canon("https://e.com/p?x=1&fbclid=zz&y=2") == "https://e.com/p?x=1&y=2")
    assert(canon("https://e.com/p?gclid=1") == "https://e.com/p")
    // path/query case is significant and preserved
    assert(canon("https://E.com/CaseSensitive?Q=V") ==
      "https://e.com/CaseSensitive?Q=V")
    // already-canonical is a fixpoint
    val c = "https://www.site1.example.com/path/42?id=7"
    assert(canon(c) == c)
  }

  test("urlHost and registrableDomain") {
    import spark.implicits._
    val r = Seq("HTTPS://A.B.Example.COM:443/x").toDF("u")
      .select(Urls.urlHost(col("u")), Urls.registrableDomain(col("u"))).head()
    assert(r.getString(0) == "a.b.example.com")
    assert(r.getString(1) == "example.com")
  }

  test("dedupByUrl collapses variants to lowest id; blocklist drops by domain") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://a.example.com/p"),
      (2L, "HTTPS://A.Example.COM:443/p?utm_source=x"),   // variant of 1
      (3L, "https://b.blocked.net/q"),
      (4L, "https://c.example.com/r#frag"))
      .toDF("doc_id", "url")
    val deduped = Urls.dedupByUrl(df, "url", "doc_id")
    assert(deduped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L))
    val blocked = Seq("blocked.net").toDF("domain")
    val kept = Urls.filterBlockedDomains(df, "url", blocked, "domain")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L))
    // blocklist path is map-only + broadcast: no hash exchange on the corpus
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"blocklist must broadcast:\n$plan")
  }
}
