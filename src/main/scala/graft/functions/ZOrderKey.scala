package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit Morton (Z-order) key from two
  * 32-bit cell coordinates — the multi-dimensional clustering key behind
  * lakehouse OPTIMIZE ZORDER BY: sorting files by the interleaved-bit
  * key keeps rows close in BOTH dimensions close on disk, so min/max
  * row-group stats prune 2-D box predicates that a single-column sort
  * can only prune in one dimension.
  *
  * Pure integer bit interleaving (x bit i -> key bit 2i, y bit i ->
  * key bit 2i+1; inputs masked to their low 32 bits) — engine-exact on
  * any replayer, one tight codegen loop per row. Registered as SQL
  * function `z_order` via [[GraftExtensions]].
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrderKey.interleave($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Bit-interleave the low 32 bits of x (even bit positions) and y
    * (odd positions) into one long. */
  def interleave(x: Long, y: Long): Long = {
    var key = 0L
    var i = 0
    while (i < 32) {
      key |= ((x >>> i) & 1L) << (2 * i)
      key |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    key
  }
}
