package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for st11_corpus_pipeline (r11 VERDICT #2): the
  * query is FIXTURE-SIZED (doc_id < 200 regardless of SF), yet it
  * boards 12.7-21.6 s — so the wall is fixed overhead, not data. Each
  * stage is timed to its own fence and a listener counts Spark jobs
  * per phase: the product (jobs x per-job scheduling floor) is the
  * attribution a stage table can't fake. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProfileCorpusPipeline"
  */
object ProfileCorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = j.time; jobs += 1
        if (verbose) println(s"[cpipe]   job ${j.jobId}: " +
          j.stageInfos.map(_.name).mkString(" | "))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => jobMs += (j.time - t0))
    })

    def phase[A](name: String)(f: => A): A = {
      val (j0, m0) = (jobs, jobMs)
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat to drain
      Thread.sleep(120)
      println(f"[cpipe] $name%-28s ${dt}%7.2f s  jobs=${jobs - j0}%4d  " +
        f"jobWall=${(jobMs - m0) / 1000.0}%7.2f s")
      a
    }

    val s = spark
    val docs = graft.core.Tables.documents(s, sfDir).select("doc_id", "lang", "text")
    val b1 = docs.filter(col("doc_id") < 100)
    val b2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .unionByName(docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 30000).as("doc_id"), col("lang"),
          concat(col("text"), lit(" extra token")).as("text")))
      .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
        .select((col("doc_id") + 31000).as("doc_id"), col("lang"),
          concat(col("text"), lit(" extra token")).as("text")))
    val root = java.nio.file.Files.createTempDirectory("cpipe_prof").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()

    phase("stage-fixture-files") {
      for ((b, name, age) <- Seq((b1, "f1", 20000L), (b2, "f2", 10000L))) {
        b.coalesce(1).write.parquet(s"$srcDir/$name")
        val part = new java.io.File(s"$srcDir/$name").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(srcDir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(s"$srcDir/$name"))
        dst.setLastModified(System.currentTimeMillis() - age)
      }
    }

    val schema = docs.schema
    val bloom = phase("bloom-build") {
      val benchmark = docs.filter(col("doc_id") >= 50 && col("doc_id") < 60)
      graft.ops.Dedup.benchmarkBloom(benchmark, "text", "doc_id",
        n = 3, expectedShingles = 200000L)
    }
    def freshIndex(path: String): Unit =
      graft.ops.LshIndex.save(graft.ops.LshIndex.build(docs.limit(0),
        "text", "doc_id", n = 3, bands = 21, rowsPerBand = 3), path)
    def cfg(ix: String, out: String) = graft.streaming.CorpusPipeline.Config(
      indexPath = ix, threshold = 0.7, bloom = bloom, n = 3,
      maxOverlap = 0.8, minQuality = 0.75, outDir = out,
      partitionCol = "lang")

    phase("fresh-index-S") { freshIndex(s"$root/ixS") }
    phase("stream-path") {
      graft.streaming.CorpusPipeline.start(s, srcDir, schema,
        cfg(s"$root/ixS", s"$root/outS"), s"$root/cp").awaitTermination()
    }
    phase("fresh-index-B") { freshIndex(s"$root/ixB") }
    phase("batch-path") {
      for (f <- Seq("f1", "f2"))
        graft.streaming.CorpusPipeline.step(
          s.read.parquet(s"$srcDir/$f.parquet"), cfg(s"$root/ixB", s"$root/outB"))
    }
    // per-stage attribution INSIDE one step: re-run batch f1 with each
    // stage fenced (fresh index so the dedup does real work)
    phase("step-decomposed-prep") { freshIndex(s"$root/ixC") }
    val c = cfg(s"$root/ixC", s"$root/outC")
    val f1 = s.read.parquet(s"$srcDir/f1.parquet")
    verbose = true
    val kept = phase("step1-ingest-dedup") {
      graft.streaming.IngestDedup.step(f1, c.indexPath, c.textCol, c.idCol,
        c.threshold)
    }
    verbose = false
    val clean = phase("step2-bloom-decontam") {
      val cl = graft.ops.Dedup.decontaminateWithBloom(kept, bloom.get,
        c.textCol, c.n, c.maxOverlap)
      cl.count(); cl
    }
    val gated = phase("step3-quality-gate") {
      val g = clean.filter(graft.ops.Text.qualityScore(col(c.textCol)) >= c.minQuality)
      g.count(); g
    }
    phase("step4-partitioned-sink") {
      graft.io.CorpusSink.appendPartitioned(gated, c.outDir, c.partitionCol)
    }
    phase("equality-check") {
      val outS = s.read.parquet(s"$root/outS").select("doc_id", "lang", "text")
      val outB = s.read.parquet(s"$root/outB").select("doc_id", "lang", "text")
      val equal = outS.exceptAll(outB).isEmpty && outB.exceptAll(outS).isEmpty
      println(s"[cpipe] stream_equals_batch=$equal")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
