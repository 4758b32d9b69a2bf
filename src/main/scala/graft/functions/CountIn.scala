package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: count of elements of the left string
  * array that occur in the right string array (OCCURRENCE count over
  * the left — duplicates count each time, unlike `array_intersect`'s
  * set semantics). The kernel behind stopword ratios and function-word
  * language scores, replacing `size(filter(toks, t => t.isin(...)))`
  * whose lambda runs interpreted per token. Null elements never match.
  * Registered as SQL `count_in` via [[GraftExtensions]].
  */
case class CountIn(left: Expression, right: Expression) extends BinaryExpression {

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_in requires two array<string> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CountIn.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CountIn.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}

object CountIn {
  def count(a: ArrayData, b: ArrayData): Long = {
    val nb = b.numElements()
    val set = new java.util.HashSet[Any](nb * 2)
    var j = 0
    while (j < nb) {
      if (!b.isNullAt(j)) set.add(b.getUTF8String(j))
      j += 1
    }
    var c = 0L
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
