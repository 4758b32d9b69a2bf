package graft.io

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** 1000-partition I/O-scoping proof for the lakehouse layer: the s31
  * MERGE and s33 manifest refresh must touch O(batch partitions) of the
  * table, not O(table) — at 100 TB an update batch hitting 2 of 5000
  * date partitions may rewrite 0.04% of the files and read nothing else.
  * These tests make that contract falsifiable at a scale where "it
  * rewrote everything" and "it rewrote the touched slice" are three
  * orders of magnitude apart.
  */
class LakehouseScaleSpec extends SparkSpec {

  private def md5(f: File): String = {
    val d = MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
  }

  /** (relative path -> md5) of every parquet data file under `root`. */
  private def fileHashes(root: String): Map[String, String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val base = new File(root).toPath
    walk(new File(root))
      .map(f => base.relativize(f.toPath).toString -> md5(f)).toMap
  }

  test("upsertPartitions over 1000 partitions rewrites ONLY the touched dirs; every untouched file stays byte-identical") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_lh").toString + "/ds"
    // 1000 partition values, 5 rows each
    val base = spark.range(5000)
      .select(col("id"),
        concat(lit("p"), format_string("%04d", pmod(col("id"), lit(1000))))
          .as("p"),
        (col("id") * 3).as("v"))
    CorpusSink.writePartitioned(base, out, "p")
    val before = fileHashes(out)
    assert(new File(out).listFiles().count(_.getName.startsWith("p=")) == 1000)

    // batch touches 2 of 1000 partitions: one update, one insert
    val updates = Seq((7L, "p0007", 999L), (99999L, "p0042", 1L))
      .toDF("id", "p", "v")
    val touched = CorpusSink.upsertPartitions(spark, out, updates, "id", "p")
    assert(touched == Seq("p0007", "p0042"))

    val after = fileHashes(out)
    val changedDirs = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .map(_.split("/")(0))
    // O(touched) contract: exactly the two touched directories changed,
    // and the 998 untouched directories' files are byte-identical
    assert(changedDirs == Set("p=p0007", "p=p0042"),
      s"unexpected rewrites: $changedDirs")
    val untouchedBefore = before.filterNot(k =>
      k._1.startsWith("p=p0007/") || k._1.startsWith("p=p0042/"))
    assert(untouchedBefore.forall { case (k, h) => after.get(k).contains(h) })

    // merge semantics held: updated row replaced, insert landed
    val got = CorpusSink.readPartitioned(spark, out)
    assert(got.filter(col("id") === 7L).select("v").as[Long].collect()
      .toSeq == Seq(999L))
    assert(got.filter(col("id") === 99999L).count() == 1L)
    assert(got.count() == 5001L)
  }

  test("AggManifest.refresh at 1000 partitions reads NOTHING outside the touched set; snapshot isolation holds") {
    val out = java.nio.file.Files.createTempDirectory("graft_lhm").toString + "/ds"
    val base = spark.range(5000)
      .select(col("id"),
        concat(lit("p"), format_string("%04d", pmod(col("id"), lit(1000))))
          .as("p"),
        (col("id") * 3).as("v"))
    CorpusSink.writePartitioned(base, out, "p")
    AggManifest.build(spark, out, "p", "v")
    assert(AggManifest.read(spark, out).count() == 1000L)

    // the hard no-rescan proof: DELETE all 998 untouched partition dirs.
    // If refresh listed or read any of them it would throw or drop their
    // manifest rows; instead every stale partial must survive verbatim.
    val touched = Seq("p0007", "p0042")
    new File(out).listFiles()
      .filter(f => f.getName.startsWith("p=") &&
        !touched.map("p=" + _).contains(f.getName))
      .foreach { d => d.listFiles().foreach(_.delete()); d.delete() }
    assert(new File(out).listFiles().count(_.getName.startsWith("p=")) == 2)

    AggManifest.refresh(spark, out, "p", "v", touched)
    val m = AggManifest.read(spark, out)
    assert(m.count() == 1000L)
    // totals come from the manifest alone — identical to a full recompute
    // of the ORIGINAL table even though 998 partitions no longer exist
    val t = AggManifest.total(spark, out).collect()(0)
    assert(t.getLong(0) == 5000L)
    assert(t.getDecimal(1).longValueExact() == (0L until 5000L).map(_ * 3).sum)

    // snapshot isolation: v1 (pre-refresh) is retained one generation for
    // in-flight readers; an UNCOMMITTED writer attempt is invisible
    val aggDir = new File(s"$out/_graft_aggs")
    val versions = aggDir.listFiles().map(_.getName).filter(_.startsWith("v")).sorted
    assert(versions.toSeq == Seq("v1", "v2"))
    val v3 = new File(aggDir, "v3"); v3.mkdir() // crashed publish: no _COMMIT
    assert(AggManifest.read(spark, out).count() == 1000L) // still resolves v2
    v3.delete()
  }
}
