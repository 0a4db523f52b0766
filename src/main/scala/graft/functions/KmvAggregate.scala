package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bottom-k (KMV) sketch state: the k smallest DISTINCT hash values seen.
  * A `TreeSet` keeps them sorted and deduplicated; k is sketch-sized
  * (tens), so the boxed set costs nothing against the rows it summarizes. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    set.add(h)
    if (set.size > k) set.pollLast()
  }
}

/** Shared plumbing for the two KMV aggregates: identical buffer lifecycle,
  * update, merge, and serde — the subclasses differ only in what they EMIT
  * from the final sketch (the order statistic vs the full set). Keeping
  * one copy means a future change to the sketch rule or wire format
  * cannot silently apply to one aggregate and not the other. */
abstract class KmvBottomKBase extends TypedImperativeAggregate[KmvBuffer] {
  def child: Expression
  def k: Int

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true

  // k is validated here (analysis time), NOT in the constructor body: a
  // base-class-body require would also run during Java deserialization on
  // executors, where subclass fields are not yet populated (k reads 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be in [2, 65536], got $k")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${other.sql}")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

/** Native KMV (bottom-k) sketch aggregate — the engine's custom-UDAF
  * surface, sibling of the scalar [[VectorDotExpr]] / [[AttrsToJsonExpr]]
  * expressions and registered in SQL as `kmv_bottomk(hash, k)` via
  * [[graft.GraftExtensions]].
  *
  * Semantics: over a group's 63-bit hash column, keep the k smallest
  * distinct values; emit `struct(kth_hash, k_n)` where `kth_hash` is the
  * largest kept value (the KMV order statistic) and `k_n` how many were
  * kept (< k means the group's full distinct set fits in the sketch — the
  * caller reports the exact count). Distinct cardinality ≈ (k−1)·2⁶³/hₖ.
  *
  * Why an imperative aggregate and not a window: state is k longs per
  * group, `update` is O(log k) against rows, and `merge` is a k-way set
  * union — so the plan is a standard partial/final hash aggregate with
  * map-side combine. The window formulation (row_number over hash order)
  * sorts every group's full distinct key set; this one never materializes
  * it. That is the difference between a sketch and a sort at 100 TB, and
  * it is why this aggregate exists natively rather than as a composed
  * query. (The [[graft.operators.Sketches]] gate query uses it; the DuckDB
  * oracle recomputes the same order statistic by window, which is the
  * correct oracle trade — DuckDB sees 10⁴ rows, the engine sees 10¹².)
  */
case class KmvBottomKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvBottomKBase {

  override def dataType: DataType = StructType(Seq(
    StructField("kth_hash", LongType, nullable = false),
    StructField("k_n", LongType, nullable = false)))

  override def eval(buffer: KmvBuffer): Any =
    if (buffer.set.isEmpty) null
    else InternalRow(buffer.set.last().longValue(), buffer.set.size.toLong)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomKAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_bottomk"
}

/** Bottom-k sketch that emits the FULL sorted hash set (`array<bigint>`)
  * instead of just the order statistic — the form sketch ALGEBRA needs:
  * two groups' sets support union (merge + re-truncate) and intersection
  * estimates downstream, which `(kth_hash, k_n)` alone cannot. Same
  * buffer, update, and merge as [[KmvBottomKAgg]] (shared via
  * [[KmvBottomKBase]]); state is still k longs per group, and the output
  * array is sketch-sized, never data-sized. Registered in SQL as
  * `kmv_bottomk_set(hash, k)`. */
case class KmvBottomKSetAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvBottomKBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def eval(buffer: KmvBuffer): Any =
    if (buffer.set.isEmpty) null
    else {
      val vs = new Array[Long](buffer.set.size)
      val it = buffer.set.iterator()
      var i = 0
      while (it.hasNext) { vs(i) = it.next().longValue(); i += 1 }
      // TreeSet iterates ascending — already sorted
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vs)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomKSetAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_bottomk_set"
}

object KmvAggregate {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: `kmvBottomK(hashCol, k)` → struct(kth_hash, k_n). */
  def kmvBottomK(hash: Column, k: Int): Column =
    column(KmvBottomKAgg(expression(hash), k).toAggregateExpression())

  /** Column API: `kmvBottomKSet(hashCol, k)` → sorted array<bigint>. */
  def kmvBottomKSet(hash: Column, k: Int): Column =
    column(KmvBottomKSetAgg(expression(hash), k).toAggregateExpression())
}
