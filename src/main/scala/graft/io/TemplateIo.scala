package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S10/S11 — `key: value` text-file artifacts:
  * questionnaire templates (`inference_models/inference_trained_models.py:147-183,216-228`)
  * and column-description files (`checking_data_formats_ui.py:240-269`).
  * Line format: `name: text`; enumerated choices joined with ` | ` after
  * the prompt, matching the reference's display form.
  */
object TemplateIo {

  /** Write a questionnaire template: per feature one line
    * `feature: prompt` (+ ` [choices: a | b]` when enumerated). */
  def writeQuestionTemplate(path: String,
                            template: Map[String, Seq[String]],
                            prompt: String => String = f => s"Enter value for $f"): Unit = {
    val lines = template.toSeq.sortBy(_._1).map { case (f, choices) =>
      val suffix = if (choices.isEmpty) "" else choices.mkString(" [choices: ", " | ", "]")
      s"$f: ${prompt(f)}$suffix"
    }
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path), lines.asJava, StandardCharsets.UTF_8)
  }

  /** Read back `feature -> (prompt, choices)`. */
  def readQuestionTemplate(path: String): Map[String, (String, Seq[String])] =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
      .filter(_.contains(":")).map { line =>
        val Array(k, rest) = line.split(":", 2)
        val (prompt, choices) = rest.indexOf("[choices:") match {
          case -1 => (rest.trim, Nil)
          case i =>
            val cs = rest.substring(i + "[choices:".length).stripSuffix("]")
              .split("\\|").map(_.trim).toSeq
            (rest.substring(0, i).trim, cs)
        }
        k.trim -> (prompt, choices)
      }.toMap

  /** S11 — column descriptions: `column: free text`. */
  def writeDescriptions(path: String, desc: Map[String, String]): Unit = {
    val lines = desc.toSeq.sortBy(_._1).map { case (c, d) => s"$c: $d" }
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path), lines.asJava, StandardCharsets.UTF_8)
  }

  def readDescriptions(path: String): Map[String, String] =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
      .filter(_.contains(":")).map { line =>
        val Array(k, v) = line.split(":", 2)
        k.trim -> v.trim
      }.toMap
}
