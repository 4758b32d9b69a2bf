package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {

  // corpus: 60 docs with rolling shared vocab; batch: near-dups of docs
  // 0..7 (ids +1000), one internal batch dup pair (2000/2001), one novel
  private def corpus = {
    import spark.implicits._
    (0L until 60L).map(i =>
      (i, (0 until 20).map(j => s"w${(i * 5 + j) % 80}").mkString(" ")))
      .toDF("doc_id", "text")
  }
  private def batch = {
    import spark.implicits._
    val near = (0L until 8L).map(i =>
      (i + 1000L, (0 until 20).map(j => s"w${(i * 5 + j) % 80}").mkString(" ") + " x"))
    val internal = Seq(
      (2000L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
      (2001L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11"))
    val novel = Seq((3000L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
    (near ++ internal ++ novel).toDF("doc_id", "text")
  }

  test("incrementalPairs == full LSH on the union, restricted to >=1 new side") {
    val ix = LshIndex.build(corpus, "text", "doc_id", n = 3, bands = 21, rowsPerBand = 3)
    val inc = LshIndex.incrementalPairs(batch, ix, "text", "doc_id", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairs(corpus.unionByName(batch), "text", "doc_id",
        3, 21, 3, 0.7)
      .filter(col("id_a") >= 1000 || col("id_b") >= 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full, s"inc=$inc full=$full")
    // the planted shapes are all present
    (0L until 8L).foreach(i => assert(inc.contains((i, i + 1000L)), s"missing ($i, ${i + 1000})"))
    assert(inc.contains((2000L, 2001L)), "missing internal batch dup")
    assert(!inc.exists { case (a, b) => a < 1000 && b < 1000 },
      "old-old pair leaked into the incremental result")
    assert(!inc.exists { case (a, b) => a == 3000L || b == 3000L },
      "novel doc matched something")
  }

  test("save/load round-trips tables AND band params; append grows the index") {
    val dir = java.nio.file.Files.createTempDirectory("lshix").toString
    val ix = LshIndex.build(corpus, "text", "doc_id", n = 3, bands = 21, rowsPerBand = 3)
    LshIndex.save(ix, dir)
    val loaded = LshIndex.load(spark, dir)
    assert((loaded.n, loaded.bands, loaded.rowsPerBand, loaded.seed) == (3, 21, 3, 42L))
    val inc = LshIndex.incrementalPairs(batch, loaded, "text", "doc_id", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.contains((0L, 1000L)) && inc.contains((2000L, 2001L)))
    // keep the novel doc + one internal-dup survivor, append, re-check:
    // a SECOND batch near-dup of the novel doc must now be caught
    import spark.implicits._
    val kept = batch.filter(col("doc_id").isin(3000L, 2000L))
    LshIndex.save(LshIndex.entriesFor(kept, loaded, "text", "doc_id"), dir, mode = "append")
    val grown = LshIndex.load(spark, dir)
    assert(grown.sizes.count() == ix.sizes.count() + 2)
    val batch2 = Seq((4000L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11")).toDF("doc_id", "text")
    val inc2 = LshIndex.incrementalPairs(batch2, grown, "text", "doc_id", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc2 == Set((3000L, 4000L)), s"got $inc2")
  }

  test("buildAndSave == build+save: same tables on disk, same incremental pairs") {
    val d1 = java.nio.file.Files.createTempDirectory("lshix_bs1").toString
    val d2 = java.nio.file.Files.createTempDirectory("lshix_bs2").toString
    LshIndex.save(LshIndex.build(corpus, "text", "doc_id", 3, 21, 3), d1)
    val built = LshIndex.buildAndSave(corpus, "text", "doc_id", 3, 21, 3, d2)
    assert((built.n, built.bands, built.rowsPerBand, built.seed) == (3, 21, 3, 42L))
    val (a, b) = (LshIndex.load(spark, d1), LshIndex.load(spark, d2))
    for ((l, r, name) <- Seq((a.shingles, b.shingles, "shingles"),
        (a.sizes, b.sizes, "sizes"), (a.bandKeys, b.bandKeys, "bandkeys"))) {
      assert(l.exceptAll(r).isEmpty && r.exceptAll(l).isEmpty,
        s"$name tables differ between save-after-build and buildAndSave")
    }
    val inc1 = LshIndex.incrementalPairs(batch, a, "text", "doc_id", 0.7)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val inc2 = LshIndex.incrementalPairs(batch, b, "text", "doc_id", 0.7)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(inc1 == inc2, s"inc pairs differ: $inc1 vs $inc2")
    intercept[IllegalArgumentException] {
      LshIndex.buildAndSave(corpus, "text", "doc_id", 3, 21, 3, d2,
        mode = "append")
    }
  }

  test("tombstoned docs stop matching; the rest of the index is untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lshix_rm").toString
    LshIndex.save(LshIndex.build(corpus, "text", "doc_id", 3, 21, 3), dir)
    // batch near-dups docs 0 and 1; after removing doc 0, only the
    // (1, 1001) pair remains
    val inc0 = LshIndex.incrementalPairs(batch, LshIndex.load(spark, dir),
      "text", "doc_id", 0.7).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc0.contains((0L, 1000L)) && inc0.contains((1L, 1001L)))
    LshIndex.remove(Seq(0L).toDF("id"), dir)
    val loaded = LshIndex.load(spark, dir)
    assert(loaded.sizes.filter(col("id") === 0L).count() == 0)
    val inc1 = LshIndex.incrementalPairs(batch, loaded, "text", "doc_id", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!inc1.exists { case (a, b) => a == 0L || b == 0L }, s"ghost match: $inc1")
    assert(inc1.contains((1L, 1001L)))
  }

  test("_meta writes: no tmp leftover, identical rewrite skipped, corrupt/missing fail loudly") {
    val dir = tempDir("lshix_meta")
    LshIndex.save(LshIndex.build(corpus, "text", "doc_id", 3, 21, 3), dir)
    val metaFile = new java.io.File(dir, "_meta")
    assert(metaFile.exists())
    assert(!new java.io.File(dir, "_meta.tmp").exists(),
      "tmp file must be renamed away")
    // identical rewrite (what every append does) is a no-op: pin a
    // sentinel mtime and assert the file was not touched
    val kv = LshIndex.readMeta(spark, metaFile.toString).toSeq
    assert(metaFile.setLastModified(1234567000L))
    LshIndex.writeMeta(spark, metaFile.toString, kv)
    assert(metaFile.lastModified() == 1234567000L,
      "identical _meta rewrite must skip the write entirely")
    // changed content DOES rewrite (atomically)
    LshIndex.writeMeta(spark, metaFile.toString, kv :+ ("extra" -> "1"))
    assert(LshIndex.readMeta(spark, metaFile.toString)("extra") == "1")
    // a truncated/garbage meta names the problem instead of
    // StringIndexOutOfBounds
    java.nio.file.Files.write(metaFile.toPath, "not key value".getBytes)
    // drop the local-FS checksum sidecar so the corruption reaches
    // readMeta instead of ChecksumException
    new java.io.File(dir, "._meta.crc").delete()
    val e1 = intercept[IllegalArgumentException](LshIndex.load(spark, dir))
    assert(e1.getMessage.contains("malformed"), e1.getMessage)
    // a missing meta names the pre-_meta layout migration story
    assert(metaFile.delete())
    val e2 = intercept[java.io.FileNotFoundException](LshIndex.load(spark, dir))
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
  }

  test("the index probe never shuffles the index side (broadcast batch keys)") {
    val ix = LshIndex.build(corpus, "text", "doc_id", n = 3, bands = 21, rowsPerBand = 3)
    val plan = LshIndex.incrementalPairs(batch, ix, "text", "doc_id", 0.7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast probe in:\n$plan")
  }
}
