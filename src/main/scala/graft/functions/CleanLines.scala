package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: C4-style LINE-level cleaning (Raffel et
  * al., 2020 §2.2) — split a document on newlines, keep lines with >=
  * `minWords` whitespace words and (optionally) a terminal-punctuation
  * ending (. ! ? "), rejoin with newlines. The boilerplate killer: nav
  * menus, cookie banners, and list fragments die line-by-line while
  * prose survives. One row-local codegen'd loop — the higher-order
  * equivalent (`filter(split(...), lambda)`) runs the lambda interpreted
  * per LINE per row. Registered as SQL `clean_lines` via
  * [[GraftExtensions]]; both rules are expressible in DuckDB for exact
  * oracles.
  */
case class CleanLines(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_lines requires (string, int, boolean), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override def dataType: DataType = StringType
  override def prettyName: String = "clean_lines"

  protected override def nullSafeEval(t: Any, mw: Any, rt: Any): Any =
    CleanLines.clean(t.asInstanceOf[UTF8String], mw.asInstanceOf[Int],
      rt.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, mw, rt) =>
      s"graft.functions.CleanLines.clean($t, $mw, $rt)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CleanLines =
    copy(first = f, second = s, third = t)
}

object CleanLines {
  private val Terminal = Set('.', '!', '?', '"')

  def clean(text: UTF8String, minWords: Int, requireTerminal: Boolean): UTF8String = {
    val kept = text.toString.split("\n", -1).iterator.filter { line =>
      val t = line.trim
      val words = if (t.isEmpty) 0 else t.split("\\s+").length
      words >= minWords && (!requireTerminal || (t.nonEmpty && Terminal(t.last)))
    }
    UTF8String.fromString(kept.mkString("\n"))
  }
}
