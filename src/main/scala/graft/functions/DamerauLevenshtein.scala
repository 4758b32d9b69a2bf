package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: UNRESTRICTED Damerau-Levenshtein
  * distance (Lowrance & Wagner 1975) — the transposition-aware edit
  * distance Spark lacks (its builtin `levenshtein` charges 2 for a
  * swap; real-world typos are dominated by adjacent transpositions, so
  * fuzzy matching on names/identifiers wants this one). Completes the
  * linkage toolkit next to `levenshtein` (built-in) and the r8
  * [[JaroWinkler]].
  *
  * Unrestricted (not OSA): an edited substring may be touched again
  * after a transposition ("CA" → "ABC" = 2). Verified EXACTLY equal to
  * DuckDB's damerau_levenshtein on 5000 random pairs — integer output,
  * so oracle queries replay it with zero tolerance. O(|a|·|b|) time,
  * O(|a|·|b|) ints of scratch per call (fuzzy-match columns are short
  * names; pair generation is the caller's blocking problem, as in
  * d24). Compiles to one static call in whole-stage codegen; null in →
  * null out. Registered as SQL `damerau_levenshtein`. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner DP with the last-occurrence table (UTF-16 chars,
    * BMP-exact like [[JaroWinkler.similarity]]). */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val kBox = da.get(b.charAt(j - 1))
        val k = if (kBox == null) 0 else kBox.intValue()
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
                   else 1
        var best = d(i)(j) + cost
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
