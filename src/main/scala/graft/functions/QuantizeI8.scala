package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: symmetric int8 quantization of an
  * embedding — element i maps to round(127 * x_i / scale) (in
  * [-127, 127] whenever `scale >= max|x|`; a non-positive scale yields
  * zeros). The storage-scale lever for 100 TB embedding corpora: int8
  * cells are 8x smaller than doubles, and cosine over quantized vectors
  * needs no dequantization at all (the per-vector scale cancels).
  * Registered as SQL `quantize_i8(vec, scale)` via [[GraftExtensions]].
  */
case class QuantizeI8(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) if right.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 requires (array<double>, double), got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_i8"

  protected override def nullSafeEval(arr: Any, scale: Any): Any =
    QuantizeI8.quantize(arr.asInstanceOf[ArrayData], scale.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantizeI8.quantize($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantizeI8 =
    copy(left = newLeft, right = newRight)
}

object QuantizeI8 {
  def quantize(arr: ArrayData, scale: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.round(127.0 * arr.getDouble(i) / scale)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
