package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** S12 — resumable hyperparameter-trial store: the JVM stand-in for the
  * reference's Optuna SQLite study (`cross_validation_optuna_logic.py:116-129`).
  * Append-only JSON-lines: each trial is one line; resuming = reading the
  * file back and continuing from the recorded draws (same contract as
  * `load_if_exists=True`).
  */
object TrialLog {

  case class Trial(number: Int, params: Map[String, String], value: Double)

  def append(path: String, t: Trial): Unit = {
    val ps = t.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }.mkString("{", ", ", "}")
    val line = s"""{"number": ${t.number}, "params": $ps, "value": ${t.value}}\n"""
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def read(path: String): Seq[Trial] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(parse)
  }

  def bestTrial(path: String, higherIsBetter: Boolean = true): Option[Trial] = {
    val ts = read(path)
    if (ts.isEmpty) None
    else Some(if (higherIsBetter) ts.maxBy(_.value) else ts.minBy(_.value))
  }

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Minimal parser for the exact shape `append` writes. */
  private def parse(line: String): Trial = {
    val num = """"number":\s*(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    val value = """"value":\s*([-0-9.eE]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val paramsBlock = """"params":\s*\{(.*?)\}""".r.findFirstMatchIn(line).map(_.group(1)).getOrElse("")
    val params = """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(paramsBlock)
      .map(m => m.group(1) -> m.group(2)).toMap
    Trial(num, params, value)
  }
}
