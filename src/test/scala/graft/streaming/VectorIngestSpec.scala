package graft.streaming

import graft.SparkSpec
import graft.ops.AnnIndex
import org.apache.spark.sql.functions._

class VectorIngestSpec extends SparkSpec {

  test("vector stream dedups batch 2 against batch 1's survivors and the seed index") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vingest").toString
    val (srcDir, outDir, ixDir, cpDir) =
      (s"$root/src", s"$root/out", s"$root/ix", s"$root/cp")
    val rnd = new scala.util.Random(5)
    def vec() = Seq.fill(16)(rnd.nextGaussian())

    val base = (0L until 30L).map(i => (i, vec()))
    val corpus = base.toDF("vec_id", "embedding")
    AnnIndex.save(AnnIndex.build(corpus, "embedding", "vec_id", nlist = 4), ixDir)

    val novel1 = vec(); val novel2 = vec()
    // batch 1: dup of indexed vector 3 (dropped), novel 100 (kept),
    // within-batch dup pair 101/102 (min kept)
    Seq((100L, novel1), (101L, novel2), (102L, novel2), (110L, base(3)._2))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$srcDir/f1")
    // batch 2: dup of batch-1 survivor 100 (dropped), novel 202 (kept)
    Seq((200L, novel1), (202L, vec()))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$srcDir/f2")
    val fs = new java.io.File(srcDir)
    for (sub <- Seq("f1", "f2"); f <- new java.io.File(s"$srcDir/$sub").listFiles()
         if f.getName.endsWith(".parquet")) {
      java.nio.file.Files.move(f.toPath, new java.io.File(fs, s"$sub.parquet").toPath)
    }
    Seq("f1", "f2").foreach(sub =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$srcDir/$sub")))

    val q = VectorIngest.start(spark, srcDir, corpus.schema, ixDir, outDir, cpDir,
      "embedding", "vec_id", threshold = 0.999, nprobe = 4)
    q.awaitTermination()

    val kept = spark.read.parquet(outDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 101L, 202L), s"got $kept")
    val ids = AnnIndex.load(spark, ixDir).cells.select("corpus_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 30L).toSet ++ Set(100L, 101L, 202L), s"index ids $ids")
  }
}
