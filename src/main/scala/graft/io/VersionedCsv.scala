package graft.io

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.SchemaProfiler

/** Versioned-CSV source/sink (reference S1-S3/S5-S6: lenient scan with `#`
  * comment skip + NA sentinels; sink prefixes `# META: vN: …` provenance
  * lines and stamps `_vN` in the filename — `utils/meta_tracker.py:132-153`,
  * `load_dataset_ui.py:59-105`).
  *
  * Scale note: the single-file writer streams Spark part-files into one
  * target file on the driver-local FS (no `collect()`); it exists for
  * parity with the reference's one-CSV-per-dataset contract and is bounded
  * by local disk, not heap. At 100 TB you keep `writeParts` (header in a
  * sidecar `_META` file, data as parallel part files).
  */
object VersionedCsv {

  val VersionRe = """^(.*)_v(\d+)\.csv$""".r

  def extractVersion(fileName: String): Option[Int] = fileName match {
    case VersionRe(_, v) => Some(v.toInt)
    case _ => None
  }

  def baseName(fileName: String): String = {
    val noExt = fileName.stripSuffix(".csv")
    noExt.replaceAll("_v\\d+$", "").replaceAll("_(train|test)$", "")
  }

  /** Train/test lineage check (reference `utils/dataset_version_checker.py:29-139`):
    * same base name and same version required. */
  def checkTrainTestVersions(trainFile: String, testFile: String): Either[String, Int] = {
    val (bt, bs) = (baseName(trainFile), baseName(testFile))
    if (bt != bs) Left(s"base-name mismatch: '$bt' vs '$bs'")
    else (extractVersion(trainFile), extractVersion(testFile)) match {
      case (Some(a), Some(b)) if a == b => Right(a)
      case (Some(a), Some(b)) => Left(s"version mismatch: v$a vs v$b")
      case _ => Left("missing _vN version suffix")
    }
  }

  /** Lenient CSV scan: `#`-comment skip, header, whitespace trim, schema
    * inference, then the multi-sentinel NA normalization pass. */
  def read(spark: SparkSession, path: String, allString: Boolean = false): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("comment", "#")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("inferSchema", (!allString).toString)
      .csv(path)
    val trimmed = base.toDF(base.columns.map(_.trim): _*)
    if (allString) trimmed.na.fill("") // reference S2: dtype=str + fillna("")
    else SchemaProfiler.normalizeNa(trimmed)
  }

  /** Scalable sink: META header in a `_META` sidecar, data as part files. */
  def writeParts(df: DataFrame, dir: String, metaLines: Seq[String]): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(dir)
    Files.write(Paths.get(dir, "_META"),
      metaLines.asJava, StandardCharsets.UTF_8)
  }

  /** Single-file sink with inline `# META:` header (reference parity).
    * Streams part files; no driver heap proportional to data. */
  def writeSingle(df: DataFrame, outFile: String, metaLines: Seq[String]): Unit = {
    val tmp = Files.createTempDirectory("graft_csv_").toString
    df.write.mode("overwrite").option("header", "true").csv(tmp)
    val parts = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
    val target = Paths.get(outFile)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val out = new BufferedOutputStream(new FileOutputStream(outFile))
    try {
      val w = new OutputStreamWriter(out, StandardCharsets.UTF_8)
      metaLines.foreach(l => w.write(l + "\n")); w.flush()
      var wroteHeader = false
      parts.foreach { p =>
        val lines = Files.lines(p, StandardCharsets.UTF_8)
        try {
          val it = lines.iterator().asScala
          if (it.hasNext) {
            val header = it.next() // every part repeats the header
            if (!wroteHeader) { w.write(header + "\n"); wroteHeader = true }
            it.foreach(l => w.write(l + "\n"))
          }
        } finally lines.close()
      }
      w.flush()
    } finally out.close()
    deleteRecursive(Paths.get(tmp))
  }

  /** Import-as-v0 (reference S6) / save-next-version (S5): stamps `_vN`. */
  def saveVersioned(df: DataFrame, dir: String, base: String,
                    tracker: MetaTracker, preserveVersion: Boolean = false): String = {
    val lines = tracker.commit(preserveVersion)
    val out = s"$dir/${base}_v${tracker.version}.csv"
    writeSingle(df, out, lines)
    out
  }

  /** B16 — balanced-pair save: write `_train_vN` + `_test_vN` with ONE
    * shared version (reference `data_balancing_list_method_ui.py:288-342`);
    * the train tracker commits the version bump, the test file reuses it. */
  def savePair(train: DataFrame, test: DataFrame, dir: String, base: String,
               tracker: MetaTracker): (String, String) = {
    val lines = tracker.commit(preserveVersion = false)
    val v = tracker.version
    val trainOut = s"$dir/${base}_train_v$v.csv"
    val testOut = s"$dir/${base}_test_v$v.csv"
    writeSingle(train, trainOut, lines)
    writeSingle(test, testOut, lines)
    require(checkTrainTestVersions(s"${base}_train_v$v.csv", s"${base}_test_v$v.csv").isRight)
    (trainOut, testOut)
  }

  /** Read a versioned CSV and its META history together. */
  def readVersioned(spark: SparkSession, path: String): (DataFrame, MetaTracker) = {
    val metaLines = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.getLines().takeWhile(_.startsWith("#")).toList finally src.close()
    }
    (read(spark, path), MetaTracker.parse(metaLines))
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursive)
    Files.deleteIfExists(p)
  }
}
