package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggManifestSpec extends SparkSpec {

  test("build + incremental refresh == full recompute; untouched partitions never rescanned") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_aggm").toString + "/ds"
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
      (5L, "c", 50L))
      .toDF("id", "p", "v")
    CorpusSink.writePartitioned(base, out, "p")
    AggManifest.build(spark, out, "p", "v")
    val m0 = AggManifest.read(spark, out).as[(String, Long, BigDecimal)]
      .collect().map { case (p, n, sv) => p -> (n, sv.toLong) }.toMap
    assert(m0 == Map("a" -> (2L, 30L), "b" -> (2L, 70L), "c" -> (1L, 50L)))

    // upsert touches only partition b (id 3 changes, id 6 inserts)
    val updates = Seq((3L, "b", 300L), (6L, "b", 60L)).toDF("id", "p", "v")
    val touched = CorpusSink.upsertPartitions(spark, out, updates, "id", "p")
    assert(touched == Seq("b"))

    // behavioral no-rescan proof: blow away an UNTOUCHED partition's
    // data before the refresh — if refresh read anything outside the
    // touched set it would fail or drop the row; instead the stale
    // partial must survive verbatim
    val cDir = new java.io.File(s"$out/p=c")
    cDir.listFiles().foreach(_.delete()); cDir.delete()
    AggManifest.refresh(spark, out, "p", "v", touched)
    val m1 = AggManifest.read(spark, out).as[(String, Long, BigDecimal)]
      .collect().map { case (p, n, sv) => p -> (n, sv.toLong) }.toMap
    assert(m1 == Map("a" -> (2L, 30L), "b" -> (3L, 400L), "c" -> (1L, 50L)))

    // totals answered from the manifest alone
    val Array(t) = AggManifest.total(spark, out).collect()
    assert(t.getLong(0) == 6L && t.getDecimal(1).longValue() == 480L)

    // the manifest is invisible to a normal dataset read
    assert(!CorpusSink.readPartitioned(spark, out).columns.contains("sum_v"))
  }
}
