package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe: `bloom_might_contain(filter,
  * value)` over a CONSTANT serialized filter (a `lit(bytes)` produced by
  * `bloom_agg`) and a long column.
  *
  * Why not Spark's own `BloomFilterMightContain`: its codegen assumes
  * the filter child is a scalar-subquery reference and fails to compile
  * against a binary literal (`Expression "java.lang.Long" is not an
  * rvalue`), silently falling back to interpreted per-row evaluation —
  * on the [[graft.ops.Dedup.decontaminateBloom]] 100 TB hot path that
  * fallback turns the advertised map-only codegen prune into an
  * interpreter loop. This expression holds the DESERIALIZED filter in a
  * transient lazy field (built once per task, not per row) and emits a
  * plain `bloomFilter.mightContainLong(value)` call inside whole-stage
  * codegen.
  *
  * Null semantics match the built-in: null filter or null value yields
  * null. The filter argument must be foldable — probing a per-row
  * filter is a different (and never wanted) operation.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a constant (foldable) serialized filter " +
          "as its first argument — pass the bloom_agg result as a literal")
    else if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per task (transient lazy — rebuilt after the
    * expression ships to an executor, never per row). */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (bloom == null) null
    else {
      val v = right.eval(input)
      if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      val valueGen = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${valueGen.code}
          boolean ${ev.isNull} = ${valueGen.isNull};
          boolean ${ev.value} = false;
          if (!${ev.isNull}) {
            ${ev.value} = $bf.mightContainLong(${valueGen.value});
          }""")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
