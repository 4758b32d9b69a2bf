package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sum of Unicode code points of a string —
  * the hot kernel of the reference's "embedding hash"
  * (`hashing_methods_ui.py:301-307`).
  *
  * The engine's demonstration of the UDF-promotion path (SURVEY §4.2):
  * same semantics as `aggregate(split(c, ""), 0L, (acc, ch) -> acc +
  * ascii(ch))`, but where the higher-order form materializes a
  * per-character array and runs the lambda interpreted per element, this
  * compiles to one static call in whole-stage codegen — no allocation,
  * no virtual dispatch. Registered as SQL function `unicode_sum` via
  * [[GraftExtensions]].
  */
case class UnicodeSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_sum requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "unicode_sum"

  protected override def nullSafeEval(input: Any): Any =
    UnicodeSum.sumCodePoints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeSum.sumCodePoints($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeSum =
    copy(child = newChild)
}

object UnicodeSum {
  /** Sum of code points — one tight loop, no per-character boxing. */
  def sumCodePoints(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      sum += cp
      j += Character.charCount(cp)
    }
    sum
  }
}
