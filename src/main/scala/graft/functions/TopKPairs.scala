package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state k-smallest aggregate: `topk_pairs(dist, id, k)` keeps
  * the k smallest (dist, id) pairs per group under the lexicographic
  * (dist asc, id asc) order and returns them as a SORTED
  * `array<struct<dist double, nbr_id bigint>>`.
  *
  * This is the kNN candidate-reduction primitive: the alternative —
  * `row_number() over (partition by l_id order by dist) <= k` — plans as
  * WindowGroupLimit + a FULL EXTERNAL SORT of every candidate pair,
  * which at sf1 put the SMOTE family's 10^8-row candidate streams
  * through spilling sorts (b7_adasyn 476s, b10_smote_enn 392s measured).
  * As an aggregate the state is k pairs (O(k) memory per group), partial
  * aggregation truncates to k on the MAP side before the shuffle, and
  * merges are k-way list merges — no sort of the candidate stream ever
  * happens, and shuffled bytes drop from all-candidates to k-per-group.
  *
  * Determinism: insertion uses the total (dist, id) order, identical to
  * the window's ORDER BY dist ASC, id ASC tie-break, so results are
  * bit-identical to the sort-based plan under any partitioning.
  *
  * Buffer layout: a scala ArrayBuffer kept sorted ascending (k is an
  * explainer/neighbor count — tens, so linear insertion beats heap
  * constant factors); serialized as (n, then n * (double, long)).
  */
case class TopKPairs(dist: Expression, id: Expression, kExpr: Expression,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buffer] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"bad k: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (dist.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("topk_pairs needs a double dist")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("topk_pairs needs a long id")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (kExpr.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("nbr_id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
  override def children: Seq[Expression] = Seq(dist, id, kExpr)

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      buf.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairs.Buffer, b: TopKPairs.Buffer): TopKPairs.Buffer = {
    var j = 0
    while (j < b.n) { a.insert(b.ds(j), b.ids(j)); j += 1 }
    a
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = new GenericInternalRow(Array[Any](buf.ds(j), buf.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.ds(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairs.Buffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(dist = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKPairs {
  /** Sorted-ascending bounded buffer of (dist, id[, tag]); insertion
    * keeps the k smallest under (dist, id) lexicographic order. The tag
    * is a PAYLOAD rider (never part of the order) so aggregates can
    * carry one extra column — e.g. the IVF cell a candidate came from —
    * through the truncation without a recovery join. */
  final class Buffer(k: Int) {
    var n: Int = 0
    val ds = new Array[Double](k)
    val ids = new Array[Long](k)
    val tags = new Array[Long](k)

    def insert(d: Double, i: Long): Unit = insert(d, i, 0L)

    def insert(d: Double, i: Long, t: Long): Unit = {
      if (n == k && !lt(d, i, ds(n - 1), ids(n - 1))) return
      // find insertion point (linear from the tail — k is small)
      var p = math.min(n, k - 1)
      while (p > 0 && lt(d, i, ds(p - 1), ids(p - 1))) p -= 1
      if (p >= k) return
      // shift right, dropping the overflow
      val last = math.min(n, k - 1)
      var q = last
      while (q > p) {
        ds(q) = ds(q - 1); ids(q) = ids(q - 1); tags(q) = tags(q - 1); q -= 1
      }
      ds(p) = d; ids(p) = i; tags(p) = t
      if (n < k) n += 1
    }

    // NaN-consistent total order matching Spark's sort semantics (NaN
    // sorts after every real and equal to itself), so output stays
    // bit-identical to an ORDER BY dist ASC, id ASC window even when
    // distances contain NaN. Plain `<` would treat NaN as incomparable
    // (both lt directions false), corrupting the sorted-buffer invariant.
    private def lt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(d1, d2)
      c < 0 || (c == 0 && i1 < i2)
    }
  }
}

/** [[TopKPairs]] with a payload column: `topk_pairs_tag(dist, id, tag,
  * k)` keeps the k smallest (dist, id) pairs per group — same (dist asc,
  * id asc) total order, same O(k) bounded state and map-side truncation
  * — while carrying `tag` (any integral column) alongside each winner,
  * returned as `array<struct<dist double, nbr_id bigint, tag bigint>>`.
  *
  * This exists for top-k reductions whose consumers need one more
  * column than (dist, id): the ANN scoring paths rank (query, corpus)
  * candidates but must keep the IVF cell each winner came from
  * ([[graft.ops.AnnIndex]]'s two-phase probing feeds winners' cells
  * back into expansion). Without the rider the alternatives are a
  * window over the full candidate stream (external sort of data-sized
  * input) or a recovery join against the candidate stream (re-shuffles
  * what the truncation just avoided shuffling). The tag takes no part
  * in ordering or tie-breaks, so ranking is bit-identical to
  * `topk_pairs`.
  */
case class TopKPairsTag(dist: Expression, id: Expression, tag: Expression,
                        kExpr: Expression,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buffer] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (dist.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("topk_pairs_tag needs a double dist")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("topk_pairs_tag needs a long id")
    else if (tag.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("topk_pairs_tag needs a long tag")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (kExpr.eval(null).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("nbr_id", LongType, nullable = false),
    StructField("tag", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs_tag"
  override def children: Seq[Expression] = Seq(dist, id, tag, kExpr)

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    val t = tag.eval(input)
    if (d != null && i != null && t != null)
      buf.insert(d.asInstanceOf[Double], i.asInstanceOf[Long],
        t.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairs.Buffer, b: TopKPairs.Buffer): TopKPairs.Buffer = {
    var j = 0
    while (j < b.n) { a.insert(b.ds(j), b.ids(j), b.tags(j)); j += 1 }
    a
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = new GenericInternalRow(
        Array[Any](buf.ds(j), buf.ids(j), buf.tags(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 24)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) {
      bb.putDouble(buf.ds(j)); bb.putLong(buf.ids(j)); bb.putLong(buf.tags(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairs.Buffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsTag =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsTag =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsTag =
    copy(dist = newChildren(0), id = newChildren(1), tag = newChildren(2),
      kExpr = newChildren(3))
}
