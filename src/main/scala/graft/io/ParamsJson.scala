package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.immutable.ListMap

/** Flat-JSON hyperparameter artifact (reference S9:
  * `selection_parameters_parameter_tuning_window.py:384-457`,
  * `load_params_and_train_final_model.py:114-156`). The schema is a flat
  * object of scalars — a hand-rolled writer/parser keeps the build
  * dependency-free (offline resolver).
  */
object ParamsJson {

  sealed trait JVal
  case class JStr(v: String) extends JVal
  case class JNum(v: Double) extends JVal
  case class JBool(v: Boolean) extends JVal
  case object JNull extends JVal

  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def render(v: JVal): String = v match {
    case JStr(s) => "\"" + esc(s) + "\""
    case JNum(n) => if (n == n.floor && !n.isInfinite && math.abs(n) < 1e15) n.toLong.toString else n.toString
    case JBool(b) => b.toString
    case JNull => "null"
  }

  def write(path: String, params: ListMap[String, JVal]): Unit = {
    val body = params.map { case (k, v) => "  \"" + esc(k) + "\": " + render(v) }
      .mkString("{\n", ",\n", "\n}\n")
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path), body.getBytes(StandardCharsets.UTF_8))
  }

  /** Minimal flat-object JSON parser (strings, numbers, bools, null). */
  def read(path: String): ListMap[String, JVal] = {
    val s = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    parseFlat(s)
  }

  def parseFlat(s: String): ListMap[String, JVal] = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parseString(): String = {
      require(s(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def parseValue(): JVal = {
      skipWs()
      s(i) match {
        case '"' => JStr(parseString())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".contains(s(i))) i += 1
          JNum(s.substring(start, i).toDouble)
      }
    }
    skipWs(); require(s(i) == '{'); i += 1
    var out = ListMap.empty[String, JVal]
    skipWs()
    if (s(i) != '}') {
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); require(s(i) == ':'); i += 1
        out = out + (k -> parseValue())
        skipWs()
        if (s(i) == ',') { i += 1 } else done = true
      }
    }
    out
  }
}
