package graft.io

import graft.SparkSpec

class WarcSourceSpec extends SparkSpec {

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_warc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("round trip: plain and gzip files through one glob; header fields surface") {
    val dir = tmp()
    val recs = Seq(
      ("<urn:uuid:1>", "response", "http://a.example/x",
        "application/http; msgtype=response", WarcSource.httpResponse("hello body")),
      ("<urn:uuid:2>", "request", "http://a.example/x",
        "application/http; msgtype=request", "GET /x HTTP/1.1\r\n\r\n".getBytes),
      ("<urn:uuid:3>", "metadata", null, "application/json", "{}".getBytes))
    WarcSource.write(recs.take(2), s"$dir/a.warc")
    WarcSource.write(recs.drop(2), s"$dir/b.warc.gz", gzip = true)
    val out = WarcSource.read(spark, s"$dir/*.warc*").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getString(1) -> r).toMap
    assert(byId("<urn:uuid:1>").getString(2) == "response")
    assert(byId("<urn:uuid:1>").getString(3) == "http://a.example/x")
    assert(byId("<urn:uuid:3>").isNullAt(3)) // no target URI
    assert(new String(byId("<urn:uuid:2>").getAs[Array[Byte]](6)).startsWith("GET /x"))
  }

  test("httpBody=true strips response HTTP headers only; body survives byte-exact") {
    val dir = tmp()
    WarcSource.write(Seq(
      ("<u:1>", "response", "http://e/x", "application/http",
        WarcSource.httpResponse("the body text", "text/plain")),
      ("<u:2>", "metadata", null, "application/json", "{\"k\":1}".getBytes)),
      s"$dir/c.warc")
    val rows = WarcSource.read(spark, s"$dir/c.warc", httpBody = true).collect()
    val byId = rows.map(r => r.getString(1) -> new String(r.getAs[Array[Byte]](6))).toMap
    assert(byId("<u:1>") == "the body text")
    assert(byId("<u:2>") == "{\"k\":1}") // non-response untouched
  }

  test("Content-Length framing survives payloads containing WARC/ and CRLFCRLF") {
    val dir = tmp()
    val tricky = "WARC/1.0\r\n\r\nfake inner record\r\n\r\nmore"
    WarcSource.write(Seq(
      ("<u:1>", "resource", "http://e/t", "text/plain", tricky.getBytes),
      ("<u:2>", "resource", "http://e/u", "text/plain", "after".getBytes)),
      s"$dir/d.warc")
    val rows = WarcSource.read(spark, s"$dir/d.warc").collect()
      .map(r => r.getString(1) -> new String(r.getAs[Array[Byte]](6))).toMap
    assert(rows("<u:1>") == tricky, "payload bytes must not be re-parsed as records")
    assert(rows("<u:2>") == "after")
  }

  test("unicode bodies: Content-Length is BYTE length, text round-trips") {
    val dir = tmp()
    val s2 = "日本語 και ελληνικά — ü"
    WarcSource.write(Seq(("<u:1>", "response", "http://e/i",
      "application/http", WarcSource.httpResponse(s2))), s"$dir/e.warc")
    val got = new String(WarcSource.read(spark, s"$dir/e.warc", httpBody = true)
      .head().getAs[Array[Byte]](6), java.nio.charset.StandardCharsets.UTF_8)
    assert(got == s2)
  }
}
