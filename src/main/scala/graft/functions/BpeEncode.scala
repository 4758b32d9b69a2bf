package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoder: `bpe_encode(text, merges)` -> array<bigint> of
  * token IDS under the vocabulary the merges table implies
  * ([[graft.ops.Bpe.vocab]]'s GPT-2 convention) — the sibling of
  * `bpe_token_count` that emits the actual sequence (what packing by
  * real token ids consumes). Same contract: constant merges table
  * (with the optional `#byte_level` header), rank map and id map built
  * once per task (transient lazy), one row-local codegen loop, no
  * shuffle, no UDF. `size(bpe_encode(t, m))` always equals
  * `bpe_token_count(t, m)` by construction (shared merge kernel).
  * Null text yields null; a symbol outside a char-level vocab encodes
  * as -1 (byte-level never does — 256 base symbols cover any input).
  */
case class BpeEncode(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bpe_encode requires a constant merges table as its second argument")
    else if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergesText: String = {
    val m = right.eval(null)
    if (m == null) "" else m.toString
  }
  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    graft.ops.Bpe.parseRanks(mergesText)
  @transient private lazy val byteLevel: Boolean =
    graft.ops.Bpe.isByteLevel(mergesText)
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] =
    graft.ops.Bpe.vocabMap(graft.ops.Bpe.parseMerges(mergesText), byteLevel)

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.ops.Bpe.encodeTokens(t.asInstanceOf[UTF8String].toString, ranks,
        vocab, byteLevel))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rk = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[_, _]].getName)
    val vm = ctx.addReferenceObj("bpeVocab", vocab, classOf[java.util.HashMap[_, _]].getName)
    val bl = byteLevel.toString
    val textGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
            graft.ops.Bpe.encodeTokens(${textGen.value}.toString(), $rk, $vm, $bl));
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
