package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, LshIndex}
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  /** Long, stopword-bearing text that clears the 0.75 quality gate;
    * seeds spaced 10 apart give DISJOINT word ranges (only the two
    * template shingles "is here the"/"here the word" are shared). */
  private def good(seed: Long): String =
    (0 until 25).map(j => s"the word w${seed * 5 + j} is here").mkString(" ")

  test("two-file stream: dedup vs history, decontamination, quality gate; stream == batch") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cpipe").toString

    // batch 1: doc 1 good, doc 2 good (benchmark-contaminated), doc 3
    // low-quality (mean word length > 12 fails two rules)
    val b1 = Seq(
      (1L, "a", good(0)),
      (2L, "a", good(10)),
      (3L, "b", ("z" * 30 + " ") * 20))
      .toDF("doc_id", "lang", "text")
    // batch 2: doc 10 near-dups batch-1 survivor 1 (dropped vs history),
    // doc 11 novel good, docs 12/13 within-batch near-dup pair (min kept)
    val b2 = Seq(
      (10L, "a", good(0) + " tail"),
      (11L, "b", good(20)),
      (12L, "b", good(30)),
      (13L, "b", good(30) + " tail"))
      .toDF("doc_id", "lang", "text")

    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    for ((b, name, age) <- Seq((b1, "f1", 20000L), (b2, "f2", 10000L))) {
      b.coalesce(1).write.parquet(s"$srcDir/$name")
      val part = new java.io.File(s"$srcDir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$srcDir/$name"))
      dst.setLastModified(System.currentTimeMillis() - age)
    }

    val benchmark = Seq((100L, good(10))).toDF("doc_id", "text")
    val bloom = Dedup.benchmarkBloom(benchmark, "text", "doc_id", n = 3,
      expectedShingles = 10000L)
    def fresh(path: String): Unit =
      LshIndex.save(LshIndex.build(b1.limit(0), "text", "doc_id",
        n = 3, bands = 21, rowsPerBand = 3), path)
    def cfg(ix: String, out: String) = CorpusPipeline.Config(
      indexPath = ix, threshold = 0.7, bloom = bloom, n = 3,
      maxOverlap = 0.8, minQuality = 0.75, outDir = out, partitionCol = "lang")

    fresh(s"$root/ixS")
    CorpusPipeline.start(spark, srcDir, b1.schema,
      cfg(s"$root/ixS", s"$root/outS"), s"$root/cp").awaitTermination()
    fresh(s"$root/ixB")
    for (f <- Seq("f1", "f2"))
      CorpusPipeline.step(spark.read.parquet(s"$srcDir/$f.parquet"),
        cfg(s"$root/ixB", s"$root/outB"))

    val streamed = spark.read.parquet(s"$root/outS")
      .select("doc_id", "lang", "text")
    val batched = spark.read.parquet(s"$root/outB")
      .select("doc_id", "lang", "text")
    // hand-checked survivors: 1 (good), 11 (novel), 12 (pair min);
    // 2 decontaminated, 3 quality-dropped, 10 history-dup, 13 pair loser
    assert(streamed.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 11L, 12L))
    // bit-for-bit: both directions empty
    assert(streamed.exceptAll(batched).isEmpty && batched.exceptAll(streamed).isEmpty)
    // quality-dropped and decontaminated docs STILL entered the index
    // (the pipeline order: dedup/index-append happens first)
    val ids = LshIndex.load(spark, s"$root/ixS").sizes
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 11L, 12L), s"index ids $ids")
  }

  test("restart recovery: the full pipeline resumes from its checkpoint " +
    "and the interrupted run equals the uninterrupted one bit for bit") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cpipe_restart").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()

    val b1 = Seq(
      (1L, "a", good(0)),
      (2L, "a", good(10)),
      (3L, "b", ("z" * 30 + " ") * 20))
      .toDF("doc_id", "lang", "text")
    val b2 = Seq(
      (10L, "a", good(0) + " tail"),
      (11L, "b", good(20)),
      (12L, "b", good(30)),
      (13L, "b", good(30) + " tail"))
      .toDF("doc_id", "lang", "text")
    def addFile(b: org.apache.spark.sql.DataFrame, name: String): Unit = {
      b.coalesce(1).write.parquet(s"$srcDir/$name")
      val part = new java.io.File(s"$srcDir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$srcDir/$name"))
    }

    val benchmark = Seq((100L, good(10))).toDF("doc_id", "text")
    val bloom = Dedup.benchmarkBloom(benchmark, "text", "doc_id", n = 3,
      expectedShingles = 10000L)
    def fresh(path: String): Unit =
      LshIndex.save(LshIndex.build(b1.limit(0), "text", "doc_id",
        n = 3, bands = 21, rowsPerBand = 3), path)
    def cfg(ix: String, out: String) = CorpusPipeline.Config(
      indexPath = ix, threshold = 0.7, bloom = bloom, n = 3,
      maxOverlap = 0.8, minQuality = 0.75, outDir = out, partitionCol = "lang")

    // interrupted run: drain file 1, DISCARD the query (the crash),
    // then a fresh query on the same checkpoint drains only file 2
    fresh(s"$root/ixS")
    addFile(b1, "f1")
    CorpusPipeline.start(spark, srcDir, b1.schema,
      cfg(s"$root/ixS", s"$root/outS"), s"$root/cp").awaitTermination()
    addFile(b2, "f2")
    CorpusPipeline.start(spark, srcDir, b1.schema,
      cfg(s"$root/ixS", s"$root/outS"), s"$root/cp").awaitTermination()

    // uninterrupted reference: the same batches folded in order
    fresh(s"$root/ixB")
    for (f <- Seq("f1", "f2"))
      CorpusPipeline.step(spark.read.parquet(s"$srcDir/$f.parquet"),
        cfg(s"$root/ixB", s"$root/outB"))

    val streamed = spark.read.parquet(s"$root/outS")
      .select("doc_id", "lang", "text")
    val batched = spark.read.parquet(s"$root/outB")
      .select("doc_id", "lang", "text")
    assert(streamed.exceptAll(batched).isEmpty &&
      batched.exceptAll(streamed).isEmpty,
      "restarted pipeline must equal the uninterrupted fold bit for bit")
    // exactly-once across the restart: one output row per survivor
    val counts = streamed.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 11L -> 1L, 12L -> 1L),
      s"replayed batch detected: $counts")
  }
}
