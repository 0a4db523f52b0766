package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Quantile-sketch state: the k (hash, value) pairs with the smallest
  * hashes seen so far, lexicographically ordered and deduplicated — a
  * deterministic bottom-k uniform row sample keyed by a portable hash. */
final class QsketchBuffer(val k: Int) {
  val set = new java.util.TreeSet[(Long, Double)](
    new java.util.Comparator[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    })
  def add(h: Long, v: Double): Unit = {
    set.add((h, v))
    if (set.size > k) set.pollLast()
  }
}

/** Native quantile sketch aggregate — `qsketch_bottomk(hash, value, k)`:
  * the k rows with the smallest portable hash values form a DETERMINISTIC
  * uniform sample of the group, and the sample's order statistics estimate
  * any quantile. Emits the sampled values as a value-sorted `array<double>`
  * so the caller applies the same longhand `percentile_disc` index rule
  * used for exact percentiles ([[graft.operators.Sketches.medianDisc]]).
  *
  * Why bottom-k-by-hash instead of KLL/GK: compaction-based quantile
  * sketches (KLL, GK, t-digest) have ORDER-DEPENDENT state — two partition
  * orders of the same rows yield different summaries, so a re-run (or an
  * independent engine) cannot reproduce them bit-for-bit, which breaks both
  * Spark's deterministic-retry contract and the DuckDB oracle gate. The
  * bottom-k-by-hash sample is a pure FUNCTION OF THE ROW SET: no RNG, no
  * order sensitivity, and merge = set-union-then-truncate is associative
  * and commutative. Error is the uniform-sampling bound (ε ≈ √(ln(1/δ)/2k)
  * rank error, ~5% at k=256) vs KLL's ~1/k — the price of determinism,
  * and the gate query reports the realized error next to the estimate.
  *
  * State is k (hash, value) pairs per group regardless of group size;
  * `update` is O(log k); the plan is a standard partial/final
  * ObjectHashAggregate with map-side combine (PlanSpec-asserted) — only
  * k·16-byte sketches shuffle, never the group's rows. Exact duplicate
  * (hash, value) pairs collapse in the TreeSet; with a 63-bit hash of a
  * unique row key that is a ~n²/2⁶³ event, and the oracle mirrors it with
  * a DISTINCT so both engines apply the identical rule. */
case class QsketchBottomKAgg(hashChild: Expression, valueChild: Expression,
    k: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QsketchBuffer] {

  require(k >= 2 && k <= 65536, s"qsketch_bottomk: k must be in [2, 65536], got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"qsketch_bottomk requires (BIGINT hash, DOUBLE value), got (${h.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): QsketchBuffer = new QsketchBuffer(k)

  override def update(buffer: QsketchBuffer, input: InternalRow): QsketchBuffer = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buffer.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QsketchBuffer, other: QsketchBuffer): QsketchBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) { val p = it.next(); buffer.add(p._1, p._2) }
    buffer
  }

  override def eval(buffer: QsketchBuffer): Any =
    if (buffer.set.isEmpty) null
    else {
      val vs = new Array[Double](buffer.set.size)
      val it = buffer.set.iterator()
      var i = 0
      while (it.hasNext) { vs(i) = it.next()._2; i += 1 }
      java.util.Arrays.sort(vs)
      ArrayData.toArrayData(vs)
    }

  override def serialize(buffer: QsketchBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putDouble(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QsketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QsketchBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QsketchBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QsketchBottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QsketchBottomKAgg =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
  override def prettyName: String = "qsketch_bottomk"
}

/** [[QsketchBottomKAgg]]'s MERGEABLE output form —
  * `qsketch_bottomk_pairs(hash, value, k)` emits the sample as an
  * `array<struct<h, v>>` in (hash, value) order, i.e. the sketch STATE
  * itself rather than just its value projection. That is what a rollup
  * needs: re-taking bottom-k over unions of emitted sketches requires the
  * hashes, and with them the merge is exact (any of the k smallest hashes
  * overall is among its own slice's k smallest — the same algebra as the
  * KMV set form `kmv_bottomk_set`). Same buffer, same partial/final
  * ObjectHashAggregate shape, k·16 bytes per group. */
case class QsketchBottomKPairsAgg(hashChild: Expression, valueChild: Expression,
    k: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QsketchBuffer] {

  require(k >= 2 && k <= 65536, s"qsketch_bottomk_pairs: k must be in [2, 65536], got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"qsketch_bottomk_pairs requires (BIGINT hash, DOUBLE value), got (${h.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): QsketchBuffer = new QsketchBuffer(k)

  override def update(buffer: QsketchBuffer, input: InternalRow): QsketchBuffer = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buffer.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QsketchBuffer, other: QsketchBuffer): QsketchBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) { val p = it.next(); buffer.add(p._1, p._2) }
    buffer
  }

  override def eval(buffer: QsketchBuffer): Any =
    if (buffer.set.isEmpty) null
    else {
      val rows = new Array[Any](buffer.set.size)
      val it = buffer.set.iterator()
      var i = 0
      while (it.hasNext) {
        val p = it.next()
        rows(i) = InternalRow(p._1, p._2)
        i += 1
      }
      ArrayData.toArrayData(rows)
    }

  override def serialize(buffer: QsketchBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putDouble(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QsketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QsketchBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QsketchBottomKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QsketchBottomKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QsketchBottomKPairsAgg =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
  override def prettyName: String = "qsketch_bottomk_pairs"
}

object QsketchAggregate {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: `qsketchBottomK(hashCol, valueCol, k)` → value-sorted
    * array<double> sample. */
  def qsketchBottomK(hash: Column, value: Column, k: Int): Column =
    column(QsketchBottomKAgg(expression(hash), expression(value), k)
      .toAggregateExpression())

  /** Column API: `qsketchBottomKPairs(hashCol, valueCol, k)` → the sketch
    * state as an (h, v)-ordered `array<struct<h, v>>` (mergeable form). */
  def qsketchBottomKPairs(hash: Column, value: Column, k: Int): Column =
    column(QsketchBottomKPairsAgg(expression(hash), expression(value), k)
      .toAggregateExpression())
}
