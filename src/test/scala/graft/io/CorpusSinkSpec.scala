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
}
