package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codec kernels (Jégou et al. 2011):
  *
  *  - `pq_encode(vec, cents, m)` -> array<int>: the vector's nearest
  *    sub-codebook centroid id per subspace — MAP-ONLY encoding, the
  *    100 TB index-build path (no explode, no argmin aggregate, no
  *    shuffle; the flat centroid array rides the plan as a literal).
  *  - `pq_lut(vec, cents, m)` -> array<double>: a QUERY's flattened
  *    distance table, `lut[s*k + c]` = squared distance from the
  *    query's s-th subvector to centroid c of sub-codebook s — the
  *    input [[PqAdc]] reads per corpus code row.
  *
  * `cents` is the flat codebook, layout `cents[(s*k + c)*dsub + j]`
  * with `dsub = dim/m` and `k = cents.length/dim`. Both kernels are one
  * static loop inside whole-stage codegen, same shape as [[DotProduct]].
  * Null vector yields null.
  */
abstract class PqCodecExpression extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>, int), got $a, $b, $c")
    }
}

case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends PqCodecExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  protected override def nullSafeEval(vec: Any, cents: Any, m: Any): Any =
    PqCodec.encode(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c, m) => s"graft.functions.PqCodec.encode($v, $c, $m)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncode = copy(f, s, t)
}

case class PqLut(first: Expression, second: Expression, third: Expression)
    extends PqCodecExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  protected override def nullSafeEval(vec: Any, cents: Any, m: Any): Any =
    PqCodec.lut(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c, m) => s"graft.functions.PqCodec.lut($v, $c, $m)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqLut = copy(f, s, t)
}

object PqCodec {

  /** Squared distance between vec[s*dsub ..) and centroid (s, c). */
  private def subDist2(vec: ArrayData, cents: ArrayData, s: Int, c: Int,
                       k: Int, dsub: Int): Double = {
    val vBase = s * dsub
    val cBase = (s * k + c) * dsub
    var d = 0.0
    var j = 0
    while (j < dsub) {
      val diff = vec.getDouble(vBase + j) - cents.getDouble(cBase + j)
      d += diff * diff
      j += 1
    }
    d
  }

  def encode(vec: ArrayData, cents: ArrayData, m: Int): ArrayData = {
    val dim = vec.numElements()
    val dsub = dim / m
    val k = if (dim == 0) 0 else cents.numElements() / dim
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val d = subDist2(vec, cents, s, c, k, dsub)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  def lut(vec: ArrayData, cents: ArrayData, m: Int): ArrayData = {
    val dim = vec.numElements()
    val dsub = dim / m
    val k = if (dim == 0) 0 else cents.numElements() / dim
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        out(s * k + c) = subDist2(vec, cents, s, c, k, dsub)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
