package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native KMV (k-minimum-values / bottom-k theta) sketch aggregate:
  * `kmv_minhashes(col, k)` returns the k SMALLEST distinct 60-bit
  * md5-prefix hashes of a column, ascending — the sketch behind
  * distinct-set algebra (union = merge-and-trim, and theta estimates
  * `n ~ (k-1)/theta_k` for cardinalities of unions/intersections that
  * HLL cannot intersect).
  *
  * Fully DETERMINISTIC and exact-oracle-replayable: "the k smallest of
  * a set" is order-free, so the returned array is bit-identical under
  * any partitioning, and a SQL oracle reproduces it as `row_number()
  * OVER (ORDER BY hash) <= k` over distinct hashes. The estimate
  * arithmetic lives in the CALLER's columns ([[graft.queries]] a18) —
  * the aggregate returns raw integer evidence.
  *
  * Scale: state is <= k longs with map-side partial merges; set algebra
  * across groups then joins k-row arrays, never value streams.
  */
case class KmvMinHashes(child: Expression, kExpr: Expression,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("kmv_minhashes requires a string column")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (kExpr.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_minhashes"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      add(buf, HllDistinct.hash60(v.asInstanceOf[UTF8String].toString))
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinHashes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinHashes =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
