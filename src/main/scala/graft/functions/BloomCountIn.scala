package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom hit counter: `bloom_count_in(filter, values)` — how
  * many elements of a `array<bigint>` column probe positive against a
  * CONSTANT serialized bloom filter (a `bloom_agg` literal). The
  * array-form sibling of [[BloomContains]] (same deserialize-once
  * transient-lazy filter, same codegen shape) — with
  * [[ShingleHashes]] it turns per-doc benchmark-overlap counting into
  * ONE row-local loop: no explode, no groupBy, no shuffle, streaming-
  * safe. Null filter or null array yields null.
  */
case class BloomCountIn(left: Expression, right: Expression) extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_count_in requires a constant (foldable) serialized filter " +
          "as its first argument — pass the bloom_agg result as a literal")
    else if (left.dataType != BinaryType || !isLongArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bloom_count_in requires (binary, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_count_in"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (bloom == null) null
    else {
      val v = right.eval(input)
      if (v == null) null
      else BloomCountIn.count(bloom, v.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      val arrGen = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${arrGen.code}
          boolean ${ev.isNull} = ${arrGen.isNull};
          long ${ev.value} = 0L;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.BloomCountIn.count($bf, ${arrGen.value});
          }""")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomCountIn =
    copy(left = newLeft, right = newRight)
}

object BloomCountIn {
  def count(bloom: BloomFilter, arr: ArrayData): Long = {
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (bloom.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    hits
  }
}
