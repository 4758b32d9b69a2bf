package graft.io

import java.io.{BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) source — the container Common Crawl ships, i.e. the
  * FIRST format a web-scale training-data pipeline touches. JDK-only
  * reader for WARC/1.0 and /1.1: records are header blocks (terminated
  * by a blank line) framed by `Content-Length`, separated by CRLFCRLF;
  * files may be gzip-compressed (member-per-record or whole-file — both
  * decode through one GZIPInputStream chain; plain files are sniffed by
  * the 0x1f8b magic).
  *
  * Scale shape: WARC's unit of parallelism is the FILE (Common Crawl
  * publishes ~100k ~1 GB segments per snapshot) — `read` lists the glob
  * through `binaryFile` and parses each file inside `mapPartitions`, so
  * a 1000-executor cluster chews segments independently with zero
  * shuffle; per-record splitting inside a gzip stream is inherently
  * sequential (gzip has no sync points), matching how every public WARC
  * toolchain processes it. HTTP response payloads can strip their HTTP
  * header block (`httpBody=true`) — the body is what the corpus keeps.
  */
object WarcSource {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content", BinaryType, nullable = false)))

  /** Parse one (possibly gzipped) WARC file's bytes into records. */
  private[io] def parseFile(bytes: Array[Byte]): Seq[(String, String, String, String, String, Array[Byte])] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
        // GZIPInputStream reads CONCATENATED members, covering both the
        // member-per-record and whole-file layouts
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      } else bytes
    val out = scala.collection.mutable.ListBuffer
      .empty[(String, String, String, String, String, Array[Byte])]
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j < data.length && data(j) != '\n') j += 1
      j
    }
    while (i < data.length) {
      // skip inter-record blank lines
      while (i < data.length && (data(i) == '\r' || data(i) == '\n')) i += 1
      if (i >= data.length) return out.toSeq
      val verEnd = lineEnd(i)
      val version = new String(data, i, verEnd - i, StandardCharsets.US_ASCII).trim
      require(version.startsWith("WARC/"),
        s"not a WARC record header at offset $i: '$version'")
      i = verEnd + 1
      // header block until blank line
      val headers = scala.collection.mutable.Map.empty[String, String]
      var blank = false
      while (!blank && i < data.length) {
        val e = lineEnd(i)
        val line = new String(data, i, e - i, StandardCharsets.UTF_8).stripSuffix("\r")
        i = e + 1
        if (line.isEmpty) blank = true
        else line.indexOf(':') match {
          case -1 => // tolerate malformed header lines
          case c => headers(line.substring(0, c).trim.toLowerCase) =
            line.substring(c + 1).trim
        }
      }
      val len = headers.getOrElse("content-length", "0").toInt
      val payload = java.util.Arrays.copyOfRange(data, i, math.min(i + len, data.length))
      i += len
      out += ((headers.getOrElse("warc-record-id", null),
        headers.getOrElse("warc-type", null),
        headers.getOrElse("warc-target-uri", null),
        headers.getOrElse("warc-date", null),
        headers.getOrElse("content-type", null),
        payload))
    }
    out.toSeq
  }

  /** Strip the HTTP header block from an HTTP message payload, returning
    * the body (the bytes after the first CRLFCRLF; the whole payload
    * when no header block is present). */
  private[io] def httpBodyOf(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /** Read a WARC file/glob into a DataFrame of records. `httpBody=true`
    * replaces each response record's payload with its HTTP body. */
  def read(spark: SparkSession, pathGlob: String,
           httpBody: Boolean = false): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val path = r.getString(0)
          parseFile(r.getAs[Array[Byte]](1)).map {
            case (id, tpe, uri, date, ct, payload) =>
              val body = if (httpBody && tpe == "response") httpBodyOf(payload)
                         else payload
              Row(path, id, tpe, uri, date, ct, body)
          }
        }
      }(encoder)
  }

  /** Fixture/export writer: one WARC/1.0 file (optionally gzipped) from
    * (recordId, warcType, targetUri, contentType, payload) records, with
    * exact Content-Length framing. */
  def write(records: Seq[(String, String, String, String, Array[Byte])],
            path: String, gzip: Boolean = false): Unit = {
    val buf = new ByteArrayOutputStream()
    records.foreach { case (id, tpe, uri, ct, payload) =>
      val h = new StringBuilder
      h.append("WARC/1.0\r\n")
      h.append(s"WARC-Type: $tpe\r\n")
      if (id != null) h.append(s"WARC-Record-ID: $id\r\n")
      if (uri != null) h.append(s"WARC-Target-URI: $uri\r\n")
      h.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
      if (ct != null) h.append(s"Content-Type: $ct\r\n")
      h.append(s"Content-Length: ${payload.length}\r\n\r\n")
      buf.write(h.toString.getBytes(StandardCharsets.UTF_8))
      buf.write(payload)
      buf.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    }
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      if (gzip) {
        val gz = new GZIPOutputStream(out)
        gz.write(buf.toByteArray); gz.finish()
      } else out.write(buf.toByteArray)
    } finally out.close()
  }

  /** An HTTP/1.1 200 response payload wrapping `body` — fixture helper
    * mirroring what a crawler stores in a response record. */
  def httpResponse(body: String, contentType: String = "text/html"): Array[Byte] = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${b.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8) ++ b
  }
}
