package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable HyperLogLog distinct-count AGGREGATE — the custom
  * ladder's aggregate-function rung (expressions, a physical operator,
  * and a planner strategy exist elsewhere in `graft`; this completes the
  * set): `hll_distinct(col, p)` estimates distinct values with m = 2^p
  * byte registers.
  *
  * Differentiated from Spark's builtin Datasketches `hll_sketch_agg` by
  * its REPLAYABILITY contract: the hash is the engine's standard
  * md5-prefix recipe (first 15 hex chars = 60 bits — `Hashing.md5Int`),
  * bucket = top p bits, rho = leading zeros of the remaining 60-p bits
  * + 1, registers merge by max. Every step is integer and
  * order-independent, so a SQL oracle reproduces the registers exactly
  * and the estimate to float-sum tolerance (the only float is the final
  * 2^-M sum — callers round to 6 decimals, the t13 contract).
  *
  * Scale: the register array is m bytes of aggregation state (512 B at
  * p=9) with map-side partial aggregation and elementwise-max merges —
  * counting a column's distinct cardinality per group costs one scan
  * and shuffles only registers, never values (the exact
  * `count_distinct` expands every value through the shuffle).
  */
case class HllDistinct(child: Expression, pExpr: Expression,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"bad p: $other")
  }
  private def m: Int = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("hll_distinct requires a string column")
    else if (pExpr.dataType != IntegerType || !pExpr.foldable)
      TypeCheckResult.TypeCheckFailure("p must be an integer literal")
    else {
      val pv = pExpr.eval(null).asInstanceOf[Int]
      if (pv < 4 || pv > 16)
        TypeCheckResult.TypeCheckFailure(s"p must be in [4,16], got $pv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"
  override def children: Seq[Expression] = Seq(child, pExpr)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllDistinct.hash60(v.asInstanceOf[UTF8String].toString)
      val bucket = (h >>> (60 - p)).toInt
      val rest = h & ((1L << (60 - p)) - 1)
      val rho = HllDistinct.rho(rest, 60 - p)
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < a.length) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = HllDistinct.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object HllDistinct {
  /** 60-bit hash: first 15 hex chars of md5 — the engine-wide
    * replayable recipe (== `conv(substring(md5(s),1,15),16,10)`). */
  def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = first 7 bytes + the high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Position of the first set bit in a `width`-bit field, 1-based;
    * width+1 when the field is zero. */
  def rho(rest: Long, width: Int): Int =
    if (rest == 0L) width + 1
    else width - (63 - java.lang.Long.numberOfLeadingZeros(rest))

  /** Standard HLL estimator with the linear-counting small-range
    * correction; registers summed in ascending bucket order. */
  def estimate(buf: Array[Byte]): Double = {
    val m = buf.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var s = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      s += math.pow(2.0, -buf(j).toDouble)
      if (buf(j) == 0) zeros += 1
      j += 1
    }
    val raw = alpha * m * m / s
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
