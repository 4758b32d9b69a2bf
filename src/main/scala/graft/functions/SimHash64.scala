package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `bits`-wide SimHash of a token array in
  * ONE per-row loop — bit j is set iff more than half the tokens have
  * bit j set in their 60-bit md5 hash (`Hashing.md5Int` semantics:
  * first 15 hex chars of md5, bit-exact with the SQL oracle's replay).
  *
  * SimHash is inherently ROW-LOCAL; the previous implementation only
  * shuffled because column expressions couldn't loop: it exploded every
  * token to a row and ran packed sum-aggregates through a groupBy
  * (map-side combined, but still an exchange of one row per (partition,
  * doc) and 16-bit packed counters that overflowed at 2^16 tokens).
  * This expression runs at scan speed with int counters — no explode,
  * no shuffle, no packing bound (any document Spark can hold a string
  * array for). Null tokens are skipped. Registered as SQL
  * `simhash64(tokens, bits)` via [[GraftExtensions]].
  */
case class SimHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "simhash64 requires (array<string>, literal int bits)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(arr: Any, bits: Any): Any =
    SimHash64.compute(arr.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SimHash64.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SimHash64 =
    copy(left = newLeft, right = newRight)
}

object SimHash64 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a 60-bit long — bit-exact with
    * `conv(substring(md5(s), 1, 15), 16, 10)` (7 bytes + the high
    * nibble of the 8th, big-endian). */
  def md5Int60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  def compute(arr: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = arr.numElements()
    var valid = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Int60(arr.getUTF8String(i))
        valid += 1
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2L * counts(j) > valid) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
