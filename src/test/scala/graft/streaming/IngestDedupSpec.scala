package graft.streaming

import graft.SparkSpec
import graft.ops.LshIndex
import org.apache.spark.sql.functions._

class IngestDedupSpec extends SparkSpec {

  private def mkText(seed: Long): String =
    (0 until 20).map(j => s"w${(seed * 5 + j) % 80}").mkString(" ")

  test("file stream dedups batch 2 against batch 1's survivors and the seed corpus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val (srcDir, outDir, ixDir, cpDir) =
      (s"$root/src", s"$root/out", s"$root/ix", s"$root/cp")

    // seed corpus: docs 0..9, indexed up front
    val corpus = (0L until 10L).map(i => (i, mkText(i))).toDF("doc_id", "text")
    LshIndex.save(LshIndex.build(corpus, "text", "doc_id",
      n = 3, bands = 21, rowsPerBand = 3), ixDir)

    // batch 1 (file 1): 110 near-dups corpus doc 2 (dropped), 100/101
    // novel (kept — mkText(11) shares only a 10-token run with doc 9,
    // Jaccard ~0.29), internal dup pair 102/103 (min kept)
    Seq(
      (100L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"),
      (101L, mkText(11) + " y"),
      (102L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
      (103L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11"),
      (110L, mkText(2) + " x"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/f1")
    // batch 2 (file 2): 200 near-dups BATCH-1 survivor 100 (dropped —
    // the cross-batch property under test), 202 novel (kept)
    Seq(
      (200L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11"),
      (202L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/f2")
    // move the data files up so the stream sees exactly two parquet files
    val fs = new java.io.File(srcDir)
    for (sub <- Seq("f1", "f2"); f <- new java.io.File(s"$srcDir/$sub").listFiles()
         if f.getName.endsWith(".parquet")) {
      java.nio.file.Files.move(f.toPath, new java.io.File(fs, s"$sub.parquet").toPath)
    }
    Seq("f1", "f2").foreach(sub =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$srcDir/$sub")))

    val q = IngestDedup.start(spark, srcDir, corpus.schema, ixDir, outDir, cpDir,
      "text", "doc_id", threshold = 0.7)
    q.awaitTermination()

    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 101L, 102L, 202L), s"got $kept")
    // the index grew by exactly the survivors
    val ix = LshIndex.load(spark, ixDir)
    val ids = ix.sizes.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 10L).toSet ++ Set(100L, 101L, 102L, 202L), s"index ids $ids")
  }

  test("restart recovery: stop after batch 1, resume from the checkpoint — " +
    "file 1 is never replayed, output equals the uninterrupted run") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest_restart").toString
    val (srcDir, outDir, ixDir, cpDir) =
      (s"$root/src", s"$root/out", s"$root/ix", s"$root/cp")
    new java.io.File(srcDir).mkdirs()

    val corpus = (0L until 10L).map(i => (i, mkText(i))).toDF("doc_id", "text")
    LshIndex.save(LshIndex.build(corpus, "text", "doc_id",
      n = 3, bands = 21, rowsPerBand = 3), ixDir)

    def addFile(name: String, rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/$name")
      val part = new java.io.File(s"$srcDir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$srcDir/$name"))
    }
    def runOnce(): Unit =
      IngestDedup.start(spark, srcDir, corpus.schema, ixDir, outDir, cpDir,
        "text", "doc_id", threshold = 0.7).awaitTermination()

    // phase 1: only file 1 exists; AvailableNow drains it and STOPS —
    // the query object is discarded (the "crash"); only the checkpoint,
    // the index, and the output survive into phase 2
    addFile("f1", Seq(
      (100L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"),
      (102L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
      (110L, mkText(2) + " x")))
    runOnce()
    val after1 = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(100L, 102L), s"phase 1 survivors: $after1")

    // phase 2: file 2 arrives; a FRESH query on the SAME checkpoint must
    // process ONLY file 2 — doc 200 still near-dups phase-1 survivor 100
    // (the cross-restart state is the persisted index), and an f1 replay
    // would double-append 100/102 below
    addFile("f2", Seq(
      (200L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11"),
      (202L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")))
    runOnce()
    val counts = spark.read.parquet(outDir).groupBy("doc_id")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(100L -> 1L, 102L -> 1L, 202L -> 1L),
      s"exactly-once violated: $counts")

    // phase 3: restart again with NO new files — a no-op, nothing re-emitted
    runOnce()
    assert(spark.read.parquet(outDir).count() == 3L,
      "idle restart must not re-emit")
    // index rows stayed exactly-once too (a replay would duplicate
    // survivor entries and inflate later shingle-size verifies)
    val ixIds = LshIndex.load(spark, ixDir).sizes.groupBy("id")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ixIds.values.forall(_ == 1L), s"duplicate index entries: $ixIds")
    assert(ixIds.keySet == (0L until 10L).toSet ++ Set(100L, 102L, 202L))
  }
}
