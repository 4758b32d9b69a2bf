package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): `winnow_fps(text, k, w)` -> array<bigint> of
  * the selected character-k-gram hashes, position order.
  *
  * Every window of `w` consecutive k-gram hashes contributes its
  * minimum (RIGHTMOST on ties — the paper's robust-winnowing rule);
  * consecutive windows re-selecting the same (position, hash) record
  * it once. Guarantee: any substring match of length >= w + k - 1
  * between two documents shares at least one fingerprint — the basis
  * for plagiarism/overlap detection at a storage cost of ~2/(w+1)
  * hashes per character. Texts shorter than k yield an empty array
  * (nothing to gram); fewer than `w` grams winnow as one window.
  *
  * The k-gram hash is the engine-portable 60-bit md5
  * ([[ShingleHashes.md5Int60]]) rather than a rolling Rabin-Karp —
  * hashing cost per character is higher, but the selection replays
  * EXACTLY in any engine with md5 (the driver's DuckDB oracle), and
  * the pass stays row-local either way: one codegen loop, MAP-ONLY,
  * no explode/shuffle at any corpus size. Null text yields null.
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure("winnow_fps requires constant k and w")
    else (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires (string, int, int), got $a, $b, $c")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  @transient private lazy val k: Int = second.eval(null).asInstanceOf[Int]
  @transient private lazy val w: Int = third.eval(null).asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null
    else WinnowFps.fps(t.asInstanceOf[UTF8String].toString, k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val textGen = first.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.WinnowFps.fps(${textGen.value}.toString(), $k, $w);
        }""")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFps = copy(f, s, t)
}

object WinnowFps {

  def fps(s: String, k: Int, w: Int): ArrayData = {
    val nGrams = s.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = ShingleHashes.md5Int60(s.substring(i, i + k))
      i += 1
    }
    val nWindows = math.max(nGrams - w + 1, 1)
    val out = new scala.collection.mutable.ArrayBuffer[Long](nWindows)
    var lastPos = -1
    var j = 0
    while (j < nWindows) {
      val hi = math.min(j + w, nGrams)
      var minPos = j
      var minVal = hashes(j)
      var p = j + 1
      while (p < hi) {
        if (hashes(p) <= minVal) { minVal = hashes(p); minPos = p } // rightmost tie
        p += 1
      }
      if (minPos != lastPos) { out += minVal; lastPos = minPos }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
