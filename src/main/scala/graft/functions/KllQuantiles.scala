package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer of the mergeable quantile sketch: level l holds
  * items of weight 2^l; level buffers compact (sort, keep every other
  * item) when they reach `k`. `err` accumulates the EXACT worst-case
  * rank-error bound: each compaction of a level-l buffer perturbs any
  * rank estimate by at most 2^l (one input-weight unit), so after any
  * sequence of updates and merges, for every query value q
  * |estRank(q) - trueRank(q)| <= err. `parity` alternates which half
  * of each sorted pair survives, cancelling the one-sided rank bias a
  * fixed choice would accumulate (the deterministic stand-in for KLL's
  * coin flip — the bound does not depend on it).
  */
/** THE wire format (r12 ADVICE): one serializer shared by both
  * aggregates so [[KllQuantiles]] and [[KllQuantilesWeighted]] sketches
  * really do persist interchangeably — an edit here changes both. */
object KllBuffer {
  def write(buf: KllBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeLong(buf.n)
    out.writeLong(buf.err)
    out.writeInt(buf.parity)
    out.writeInt(buf.levels.size)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.size)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bytes.toByteArray
  }

  def read(bytes: Array[Byte], k: Int): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(k)
    buf.n = in.readLong()
    buf.err = in.readLong()
    buf.parity = in.readInt()
    val nl = in.readInt()
    while (buf.levels.size < nl) buf.levels += mutable.ArrayBuffer.empty[Double]
    var l = 0
    while (l < nl) {
      val sz = in.readInt()
      var i = 0
      while (i < sz) { buf.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    buf
  }
}

final class KllBuffer(val k: Int) {
  var n: Long = 0L
  var err: Long = 0L
  var parity: Int = 0
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])

  def insert(v: Double): Unit = {
    levels(0) += v
    n += 1L
    if (levels(0).size >= k) compact(0)
  }

  /** Sort level l, push floor(m/2) survivors (weight doubled) up one
    * level; an odd leftover (possible after merges) keeps the MAX item
    * at level l. Cascades when the next level fills. */
  def compact(l: Int): Unit = {
    val buf = levels(l)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val paired = (arr.length / 2) * 2
    if (paired == 0) return
    if (levels.size == l + 1) levels += mutable.ArrayBuffer.empty[Double]
    val up = levels(l + 1)
    var i = parity
    parity ^= 1
    while (i < paired) { up += arr(i); i += 2 }
    buf.clear()
    if (paired < arr.length) buf += arr(arr.length - 1)
    err += 1L << l
    if (up.size >= k) compact(l + 1)
  }

  /** Weighted insert via the binary decomposition of w: one copy of v
    * into each level l where bit l of w is set. Level-l items carry
    * weight 2^l, so the representation is EXACT — n grows by w, err is
    * untouched (err only grows on compaction), and the result is
    * equivalent to w unit inserts in popcount(w) buffer appends. */
  def insertWeighted(v: Double, w: Long): Unit = {
    require(w > 0, s"weight must be positive, got $w")
    var l = 0
    var rem = w
    while (rem != 0) {
      if ((rem & 1L) == 1L) {
        while (levels.size <= l) levels += mutable.ArrayBuffer.empty[Double]
        levels(l) += v
        if (levels(l).size >= k) compact(l)
      }
      rem >>>= 1
      l += 1
    }
    n += w
  }

  def mergeIn(other: KllBuffer): Unit = {
    while (levels.size < other.levels.size)
      levels += mutable.ArrayBuffer.empty[Double]
    var l = 0
    while (l < other.levels.size) { levels(l) ++= other.levels(l); l += 1 }
    n += other.n
    err += other.err
    l = 0
    while (l < levels.size) { if (levels(l).size >= k) compact(l); l += 1 }
  }

  /** Discrete-quantile selection: the smallest retained value whose
    * cumulative weight reaches rank max(1, ceil(p*n)) — the rank
    * arithmetic is the IDENTICAL IEEE tree the audit queries mirror in
    * SQL (`greatest(1, ceil(p * n))`), so the contract join lines up. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    var m = 0
    levels.foreach(m += _.size)
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var i = 0
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach { v => vals(i) = v; wts(i) = w; i += 1 }
      l += 1
    }
    val order = vals.indices.toArray.sortBy(vals(_))
    probs.map { p =>
      val r = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var j = 0
      var est = vals(order(m - 1))
      var found = false
      while (j < m && !found) {
        cum += wts(order(j))
        if (cum >= r) { est = vals(order(j)); found = true }
        j += 1
      }
      est
    }
  }
}

/** Native mergeable quantile sketch AGGREGATE:
  * `kll_quantiles(col, k, array(p1, p2, ...))` returns
  * `struct(n: long, err: long, est: array<double>)` — the exact row
  * count, the sketch's self-reported WORST-CASE rank-error bound, and
  * one estimate per requested quantile.
  *
  * The structure is the classic deterministic compaction hierarchy
  * (Munro & Paterson 1980; the mergeability and per-compaction error
  * accounting follow Agarwal et al. 2013 "Mergeable Summaries" and the
  * KLL analysis of Karnin, Lang & Liberty 2016 with the coin flip
  * replaced by an alternating parity): level-l items carry weight 2^l,
  * a full level sorts and promotes every other item, and each level-l
  * compaction adds exactly 2^l to the carried bound `err`, so the
  * CONTRACT |estRank(q) - trueRank(q)| <= err holds for every q under
  * ANY update/merge order — that is what the a46/st15 audit queries
  * verify against an exact rank pass, and what makes an oracle gate
  * possible for an order-dependent sketch (the estimates themselves
  * vary with partition order; the bound never does).
  *
  * Space is O(k * log(n/k)) doubles per group; error is
  * O((n/k) * log(n/k)) ranks — k trades space for accuracy. Unlike the
  * exact histogram-rank selection (`Relational.exactValuesAtRanks`),
  * this is ONE map-side-combined aggregate with no second scan and no
  * range sort, and it is legal inside Structured Streaming windowed
  * aggregations (st15) where multi-pass exact selection is impossible.
  */
case class KllQuantiles(child: Expression, kExpr: Expression,
                        probsExpr: Expression,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]
  private lazy val probs: Array[Double] =
    probsExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "kll_quantiles requires a double column (cast first)")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (!probsExpr.foldable ||
      !probsExpr.dataType.isInstanceOf[ArrayType] ||
      probsExpr.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "probs must be a foldable array<double> literal")
    else {
      val kv = kExpr.eval(null).asInstanceOf[Int]
      val ps = probsExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()
      if (kv < 8 || kv > (1 << 16) || kv % 2 != 0)
        TypeCheckResult.TypeCheckFailure(s"k must be even in [8, 2^16], got $kv")
      else if (ps.isEmpty || ps.exists(p => p <= 0.0 || p > 1.0))
        TypeCheckResult.TypeCheckFailure("quantile probs must be in (0, 1]")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("est", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"
  override def children: Seq[Expression] = Seq(child, kExpr, probsExpr)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.n == 0L) null
    else InternalRow(buf.n, buf.err,
      new GenericArrayData(buf.quantiles(probs).map(Double.box(_): Any)))

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.write(buf)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.read(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren(0), kExpr = newChildren(1),
      probsExpr = newChildren(2))
}

/** WEIGHTED form: `kll_quantiles_w(col, weight, k, probs)` — identical
  * contract and output struct to [[KllQuantiles]], with each row
  * entering at integer weight `w` via [[KllBuffer.insertWeighted]]'s
  * exact binary decomposition (popcount(w) buffer appends instead of
  * w exploded unit rows). The rank-error bound is the same compaction
  * accounting — weighted entry itself adds NO error — so the
  * exact-vs-bound audits transfer unchanged. Rows with a null value or
  * null weight are skipped; a non-positive weight fails loudly (a
  * silent skip would misreport n, the quantity every target rank is
  * computed from). */
case class KllQuantilesWeighted(child: Expression, wExpr: Expression,
                                kExpr: Expression, probsExpr: Expression,
                                override val mutableAggBufferOffset: Int = 0,
                                override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]
  private lazy val probs: Array[Double] =
    probsExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "kll_quantiles_w requires a double column (cast first)")
    else if (wExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "kll_quantiles_w requires a long weight column (cast first)")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (!probsExpr.foldable ||
      !probsExpr.dataType.isInstanceOf[ArrayType] ||
      probsExpr.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "probs must be a foldable array<double> literal")
    else {
      val kv = kExpr.eval(null).asInstanceOf[Int]
      val ps = probsExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()
      if (kv < 8 || kv > (1 << 16) || kv % 2 != 0)
        TypeCheckResult.TypeCheckFailure(s"k must be even in [8, 2^16], got $kv")
      else if (ps.isEmpty || ps.exists(p => p <= 0.0 || p > 1.0))
        TypeCheckResult.TypeCheckFailure("quantile probs must be in (0, 1]")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("est", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles_w"
  override def children: Seq[Expression] =
    Seq(child, wExpr, kExpr, probsExpr)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    val w = wExpr.eval(input)
    if (v != null && w != null)
      buf.insertWeighted(v.asInstanceOf[Double], w.asInstanceOf[Long])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.n == 0L) null
    else InternalRow(buf.n, buf.err,
      new GenericArrayData(buf.quantiles(probs).map(Double.box(_): Any)))

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.write(buf)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.read(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesWeighted =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesWeighted =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantilesWeighted =
    copy(child = newChildren(0), wExpr = newChildren(1),
      kExpr = newChildren(2), probsExpr = newChildren(3))
}

