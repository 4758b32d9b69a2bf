package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-document word-n-gram repetition
  * statistics (the Gopher rules) in ONE per-row loop — returns
  * struct(top_ngram_frac, dup_ngram_frac) where top = occurrences of
  * the most frequent n-gram / total n-gram occurrences and dup =
  * 1 - distinct/total. Docs shorter than n tokens count their whole
  * space-joined text as ONE gram (top 1.0, dup 0.0) — the same
  * short-doc contract as the shingle pipeline.
  *
  * Repetition stats are ROW-LOCAL; the previous shape exploded every
  * gram to a row and rolled up through a repartition-by-doc exchange.
  * This loops inside codegen: map-only, no explode, no shuffle.
  * Registered as SQL `ngram_stats(tokens, n)` via [[GraftExtensions]].
  */
case class NgramStats(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType &&
      right.foldable => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "ngram_stats requires (array<string>, literal int n)")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_ngram_frac", DoubleType, nullable = false),
    StructField("dup_ngram_frac", DoubleType, nullable = false)))
  override def prettyName: String = "ngram_stats"

  protected override def nullSafeEval(arr: Any, n: Any): Any =
    NgramStats.compute(arr.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NgramStats.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): NgramStats =
    copy(left = newLeft, right = newRight)
}

object NgramStats {
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val sz = arr.numElements()
    val toks = new Array[String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val counts = mutable.HashMap.empty[String, Int]
    var total = 0
    if (sz < n) {
      counts(toks.mkString(" ")) = 1
      total = 1
    } else {
      val sb = new StringBuilder
      var s = 0
      while (s + n <= sz) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(s + j))
          j += 1
        }
        val g = sb.toString
        counts.update(g, counts.getOrElse(g, 0) + 1)
        total += 1
        s += 1
      }
    }
    var max = 0
    counts.valuesIterator.foreach(c => if (c > max) max = c)
    new GenericInternalRow(Array[Any](
      max.toDouble / total,
      1.0 - counts.size.toDouble / total))
  }
}
