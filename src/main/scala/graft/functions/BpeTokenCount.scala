package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token counter: `bpe_token_count(text, merges)` — the
  * TRAINED-tokenizer upgrade of [[graft.ops.Text.bpeTokenCount]]'s
  * regex approximation. `merges` is a CONSTANT merges table in the
  * standard one-merge-per-line "left right" format
  * ([[graft.ops.Bpe]] trains/loads/saves it); the expression parses it
  * ONCE per task into a rank map (transient lazy) and counts tokens
  * per row inside whole-stage codegen — map-only, no shuffle, no UDF.
  *
  * Tokenization: pre-split with the same word/number/punct pattern the
  * regex approximation uses, then classic lowest-rank-first pair
  * merging per word. Char-level by default; a `#byte_level` header in
  * the merges constant switches to GPT-2-style byte-level merging over
  * UTF-8 byte symbols (the header is plan-constant, so codegen picks
  * the method at compile time). With an empty merges table every
  * char/byte is a token. Null text yields null.
  */
case class BpeTokenCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bpe_token_count requires a constant merges table as its second argument")
    else if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val mergesText: String = {
    val m = right.eval(null)
    if (m == null) "" else m.toString
  }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    graft.ops.Bpe.parseRanks(mergesText)

  /** Byte-level mode rides a `#byte_level` header line in the merges
    * constant (see [[graft.ops.Bpe.ByteLevelHeader]]) — plan-constant,
    * so codegen below picks the counting method at COMPILE time. */
  @transient private lazy val byteLevel: Boolean =
    graft.ops.Bpe.isByteLevel(mergesText)

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else if (byteLevel)
      graft.ops.Bpe.countTokensByte(t.asInstanceOf[UTF8String].toString, ranks)
    else graft.ops.Bpe.countTokens(t.asInstanceOf[UTF8String].toString, ranks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rk = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[_, _]].getName)
    val method = if (byteLevel) "countTokensByte" else "countTokens"
    val textGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.ops.Bpe.$method(${textGen.value}.toString(), $rk);
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)
}
