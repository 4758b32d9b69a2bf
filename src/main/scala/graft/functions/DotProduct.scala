package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays — the
  * hot kernel of every embedding operation (cosine scoring in
  * [[graft.ops.Similarity]] / [[graft.ops.Dedup.cosinePairs]]).
  *
  * Why not `aggregate(zip_with(a, b, (x, y) -> x * y), ...)`: array
  * higher-order lambdas run interpreted per element (~100x, the repo's
  * measured number), and the earlier workaround — posexplode + join +
  * sum aggregate — multiplies every candidate-pair row by the embedding
  * dimension on its way through a shuffle-side aggregate. This compiles
  * to one static loop inside whole-stage codegen: no row inflation, no
  * aggregate, no allocation. Registered as SQL `dot_product` via
  * [[GraftExtensions]].
  *
  * Null semantics: null if either array is null; null ELEMENTS
  * contribute 0 (embeddings are dense — a null element is malformed
  * input, not a semantic signal); lengths may differ, the overlap is
  * scored (standard BLAS-style leniency — validate dimensions upstream).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** One tight loop over the unsafe array data — no boxing, no copies. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
