package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Shannon entropy (bits) of a string's
  * code-point distribution — the classic gibberish/encoding-junk signal
  * (random bytes score ~log2(alphabet); natural prose sits near 4.1
  * bits for English; mojibake and base64 blobs stand far outside the
  * prose band). A map-only quality feature: at 100 TB it runs at
  * parquet-scan speed with no shuffle — the explode-per-character
  * formulation it replaces would materialize one row per CHARACTER of
  * the corpus before two aggregations.
  *
  * One pass builds the code-point histogram, a second sums
  * -p·log2(p) in ascending code-point order so the float summation
  * order is canonical (replayers that also sort agree to ~1e-15, well
  * inside any reasonable rounding). Empty and single-symbol strings
  * score exactly 0. Registered as SQL function `char_entropy` via
  * [[GraftExtensions]].
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a string argument, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  protected override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  /** Entropy in bits over code points; 0.0 for empty input. */
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    // sorted histogram: TreeMap gives ascending code-point iteration,
    // making the summation order canonical
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      j += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc -= p * (math.log(p) / Ln2)
    }
    if (acc == 0.0) 0.0 else acc // never emit -0.0
  }
}
