package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE decoder: `bpe_decode(ids, merges)` -> string — the
  * inverse of [[BpeEncode]] under the same constant merges table.
  * Token strings concatenate in id order; byte-level tables then map
  * the GPT-2 byte symbols back to UTF-8 bytes. Round trip:
  * `bpe_decode(bpe_encode(t, m), m)` equals the concatenation of t's
  * pre-token pieces (the pre-tokenizer drops inter-piece whitespace,
  * which therefore cannot come back). Out-of-range ids (char-level -1
  * unknowns) decode to nothing. Null ids yield null. Same codegen
  * contract as the encoder: reverse vocab built once per task,
  * row-local loop, no shuffle, no UDF.
  */
case class BpeDecode(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bpe_decode requires a constant merges table as its second argument")
    else (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode requires (array<bigint>, string), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_decode"

  @transient private lazy val mergesText: String = {
    val m = right.eval(null)
    if (m == null) "" else m.toString
  }
  @transient private lazy val toks: Array[String] =
    graft.ops.Bpe.idTokensArray(mergesText)
  @transient private lazy val byteLevel: Boolean =
    graft.ops.Bpe.isByteLevel(mergesText)

  override def eval(input: InternalRow): Any = {
    val ids = left.eval(input)
    if (ids == null) null
    else UTF8String.fromString(graft.ops.Bpe.decodeTokens(
      ids.asInstanceOf[ArrayData].toLongArray(), toks, byteLevel))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tk = ctx.addReferenceObj("bpeToks", toks, "java.lang.String[]")
    val bl = byteLevel.toString
    val idsGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${idsGen.code}
        boolean ${ev.isNull} = ${idsGen.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = UTF8String.fromString(graft.ops.Bpe.decodeTokens(
            ${idsGen.value}.toLongArray(), $tk, $bl));
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeDecode =
    copy(left = newLeft, right = newRight)
}
