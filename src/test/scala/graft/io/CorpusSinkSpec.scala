package graft.io

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSinkSpec extends SparkSpec {

  test("writePartitioned: per-value directories, bounded files, pruned reads, exact round trip") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = graft.queries.Q.tempDir("corpus-sink")
    CorpusSink.writePartitioned(docs, out, "lang", maxRecordsPerFile = 20L)

    // one directory per language, hive-style
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSet
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(dirs == langs.map(l => s"lang=$l"))

    // every data file respects maxRecordsPerFile
    val files = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    for (f <- files) {
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 20, s"$f has $n rows > maxRecordsPerFile")
    }

    // round trip: same (doc_id -> lang) mapping
    val back = CorpusSink.readPartitioned(spark, out)
    val orig = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rt = back.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt == orig)

    // a per-language read prunes at the PARTITION level (no data IO for
    // other languages), visible as PartitionFilters in the scan
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected partition pruning in:\n$scan")
  }

  test("compact: file count shrinks, content and hive layout survive the rename swap") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = graft.queries.Q.tempDir("corpus-compact")
    CorpusSink.writePartitioned(docs, out, "lang", maxRecordsPerFile = 10L)
    def parquetCount = Files.walk(Paths.get(out)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    val before = parquetCount
    val (repBefore, repAfter) = CorpusSink.compact(spark, out,
      targetBytes = 1L << 30, partitionCol = Some("lang"))
    assert(repBefore == before, "report counts the files it saw")
    val after = parquetCount
    assert(repAfter == after, "report counts the files it wrote")
    assert(after < before, s"compaction must shrink files: $before -> $after")
    // layout preserved: still hive-partitioned by lang
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSet
    assert(dirs.nonEmpty)
    // content identical
    val back = CorpusSink.readPartitioned(spark, out)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == orig)
    // no leftover swap directories
    assert(!Files.exists(Paths.get(out + ".compact.tmp")))
    assert(!Files.exists(Paths.get(out + ".compact.bak")))
  }

  test("sortWithinFiles orders rows inside every written file (row-group stats lever)") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = graft.queries.Q.tempDir("corpus-sink-sorted")
    CorpusSink.writePartitioned(docs, out, "lang",
      maxRecordsPerFile = 1000000L, sortWithinFiles = Seq("doc_id"))
    val files = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    for (f <- files) {
      val ids = spark.read.parquet(f.toString).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$f not sorted")
    }
  }

  test("upsertPartitions: touched dirs rewrite, untouched files stay byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = graft.queries.Q.tempDir("corpus-upsert")
    val base = Seq((1L, "a", "v1"), (2L, "a", "v1"), (3L, "b", "v1"),
      (4L, "c", "v1")).toDF("id", "lang", "ver")
    CorpusSink.writePartitioned(base, out, "lang")
    def listing(langDir: String): Seq[(String, Long)] =
      Files.walk(Paths.get(out, s"lang=$langDir")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSeq.sorted
    val bBefore = listing("b")
    val cBefore = listing("c")
    // update id=1, insert id=10 (lang=a), insert id=20 into NEW lang=d
    val updates = Seq((1L, "a", "v2"), (10L, "a", "v2"), (20L, "d", "v2"))
      .toDF("id", "lang", "ver")
    val touched = CorpusSink.upsertPartitions(spark, out, updates, "id", "lang")
    assert(touched == Seq("a", "d"))
    val back = spark.read.parquet(out).select("id", "lang", "ver")
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "a", "v2"), (2L, "a", "v1"), (10L, "a", "v2"),
      (3L, "b", "v1"), (4L, "c", "v1"), (20L, "d", "v2")), back.toString)
    assert(listing("b") == bBefore && listing("c") == cBefore,
      "untouched partitions must keep their exact files")
    // no temp/backup leftovers
    val leftovers = Files.walk(Paths.get(out).getParent).iterator().asScala
      .map(_.toString).filter(s => s.contains(".upsert.")).toSeq
    assert(leftovers.isEmpty, leftovers.toString)
    // second upsert over the new partition works (d now exists)
    CorpusSink.upsertPartitions(spark, out,
      Seq((20L, "d", "v3")).toDF("id", "lang", "ver"), "id", "lang")
    val d = spark.read.parquet(out).filter(col("lang") === "d")
      .select("ver").collect().map(_.getString(0)).toSeq
    assert(d == Seq("v3"))
  }
}
