package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable Misra–Gries heavy-hitter sketch AGGREGATE:
  * `misra_gries(col, k)` returns the (sorted, deduplicated) candidate
  * items retained by a k-counter Misra–Gries summary of the column —
  * a GUARANTEED superset of every item with frequency > n/(k+1)
  * (Misra & Gries 1982; the merge keeps the bound per Agarwal et al.
  * 2013, "Mergeable Summaries": summing two summaries then subtracting
  * the (k+1)-th largest count subtracts equal mass from >= k+1 distinct
  * items, exactly like the update-time decrement).
  *
  * This is the sketch half of the two-pass heavy-hitter pattern
  * ([[graft.ops.Lexicon.heavyHitters]]): sketch to find candidates with
  * O(k) state per group (map-side combined — the shuffle moves k terms,
  * never the token stream), then ONE pre-filtered exact pass confirms
  * counts. The exact single-pass alternative — groupBy over every
  * distinct token — shuffles the whole vocabulary at 100 TB; the
  * sketch's candidate set is k rows regardless of scale, and the
  * guarantee makes the confirm pass EXACT rather than approximate,
  * which is why the result is oracle-checkable.
  *
  * Estimated counts are deliberately NOT returned: they carry up to
  * n/(k+1) undercount and partition-order nondeterminism; only the
  * retained SET is deterministic enough to contract (it can vary in
  * its non-heavy extras across merge orders, which is why callers must
  * confirm-count — the heavy items are always present).
  */
case class MisraGries(child: Expression, kExpr: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("misra_gries requires a string column")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else {
      val kv = kExpr.eval(null).asInstanceOf[Int]
      if (kv < 1 || kv > (1 << 20))
        TypeCheckResult.TypeCheckFailure(s"k must be in [1, 2^20], got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // decrement-all: one unit leaves k+1 distinct items (the k
          // resident plus the arriving one) — the classic MG step
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything; >= k+1
      // entries lose that much mass, <= k survive with count > 0
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
