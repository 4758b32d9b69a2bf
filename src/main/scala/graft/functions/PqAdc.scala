package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: asymmetric-distance (ADC) lookup for
  * product-quantized vectors (Jégou et al. 2011, §IV-A).
  *
  * `pq_adc(codes, lut)` — `codes` is a vector's m sub-quantizer code
  * ids; `lut` is a QUERY's flattened distance table, `lut[s*k + c]` =
  * squared distance from the query's s-th subvector to centroid c of
  * sub-codebook s (k inferred as `lut.length / codes.length`). Returns
  * the ADC approximation of the full squared distance: one table read
  * per subspace, no per-dimension arithmetic — the reason PQ search
  * scans codes (bytes) instead of vectors (floats) at 100 TB.
  *
  * Codegen: a static loop inside whole-stage codegen, same shape as
  * [[DotProduct]] (no lambda interpretation, no row inflation).
  * Null semantics: null if either array is null; a null/out-of-range
  * code contributes 0 (malformed input, validated upstream).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int> codes, array<double> lut), got $l and $r")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  protected override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdc.adc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqAdc.adc($c, $l)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** One table lookup per subspace over the unsafe array data. */
  def adc(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var s = 0
    var d = 0.0
    while (s < m) {
      if (!codes.isNullAt(s)) {
        val c = codes.getInt(s)
        if (c >= 0 && c < k && !lut.isNullAt(s * k + c)) d += lut.getDouble(s * k + c)
      }
      s += 1
    }
    d
  }
}
