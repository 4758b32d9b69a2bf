package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling-hash fingerprint —
  * fold(acc * 31 + codepoint) mod 1e9+7 over the string's code points,
  * the [[graft.ops.Text.fingerprint]] kernel. The higher-order form
  * (`aggregate(split(c, ""), ...)`) materializes a per-character array
  * and runs the lambda interpreted per element; this is one codegen'd
  * loop. Registered as SQL `fingerprint64` via [[GraftExtensions]].
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    Fingerprint64.roll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.roll($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  val Mod: Long = 1000000007L

  def roll(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
