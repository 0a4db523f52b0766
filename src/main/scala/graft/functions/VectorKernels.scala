package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Serializable per-row kernels for the embedding family's inner loops.
  *
  * The k-means assign, PQ encode/ADC, LSH signature, and quantization
  * steps were Scala UDFs: every row paid a catalyst→boxed-`Seq[Double]`
  * conversion (64 boxed doubles + a wrapper per vector per iteration) and
  * broke whole-stage codegen around the map stage. At 100 TB embedding
  * scale that deserialize-per-row tax dominates `cluster_kmeans`,
  * `dedup_semantic`, `sim_ann_ivf_kmeans`, `sim_ann_pq`.
  *
  * A kernel reads the Tungsten `ArrayData` directly (primitive
  * `getDouble`, zero boxing of elements) and carries its tiny broadcast
  * state (k×dim centroids, m×k codebooks, per-query LUTs) as plain
  * `Array[Double]` fields serialized with the expression tree — the same
  * shipping path a broadcast variable would take, minus the driver
  * round-trip. [[VecKernelExpr]]/[[IdVecKernelExpr]] splice a kernel into
  * whole-stage codegen via `ctx.addReferenceObj`, so the surrounding
  * project/filter stays one generated function (no `ScalaUDF` node, no
  * codegen fence).
  *
  * Numeric contract: each kernel transcribes its predecessor UDF's loop
  * verbatim — same accumulation order (index-ascending, left-to-right),
  * same `round6` placement, same NaN/tie rules — so every oracle hash is
  * unchanged. See the cross-engine notes on
  * [[graft.operators.Clustering]].
  */
abstract class VecKernel extends Serializable {
  /** Result Catalyst type (struct/array/long/double). */
  def out: DataType
  /** Display name for plan output. */
  def name: String
  /** The per-row kernel; `v` is the non-null input array. */
  def apply(v: ArrayData): Any
}

/** Binary-kernel variant: `(id, payload)` rows — the per-query LUT and
  * exact re-rank shapes, where `id` selects broadcast state. */
abstract class IdVecKernel extends Serializable {
  def out: DataType
  def name: String
  def apply(id: Long, v: ArrayData): Any
}

object VectorKernels {

  /** Pure-IEEE round-to-6, the cross-engine contract
    * ([[graft.operators.Tables.portableRound6]]); NaN/Inf propagate. */
  @inline private[functions] def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** struct<_1:int,_2:double> — the (cluster, score) assignment shape the
    * UDFs returned as a Scala tuple. */
  private[functions] val assignStruct: StructType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", DoubleType, nullable = false)))

  /** `round6(a·a − 2·a·b + b·b)` with `a` a primitive array and `b` read
    * from ArrayData at `off` — the fixed three-dot association of
    * [[graft.operators.Clustering.sqDist6]] (loop bound = `a.length`,
    * combination left-to-right), so both engines round the identical
    * IEEE value. Argument ORDER matters: `aa − 2ab + bb` associates as
    * `((aa − 2ab) + bb)`, which is not IEEE-symmetric under swap. */
  @inline private[functions] def sqDist6(a: Array[Double], b: ArrayData,
      off: Int): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i); val y = b.getDouble(off + i)
      aa += x * x; ab += x * y; bb += y * y; i += 1
    }
    round6(aa - 2.0 * ab + bb)
  }

  /** [[sqDist6]] with the ArrayData side FIRST (`a` = the row vector,
    * `b` = a centroid) — preserves the UDF's `sqDist6(v, cent)` order. */
  @inline private[functions] def sqDist6Rev(a: ArrayData, off: Int, n: Int,
      b: Array[Double]): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(off + i); val y = b(i)
      aa += x * x; ab += x * y; bb += y * y; i += 1
    }
    round6(aa - 2.0 * ab + bb)
  }
}

/** Spherical-k-means assignment: (argmax cluster, round6 cos) over a
  * broadcast centroid codebook, with the oracle's ordering semantics —
  * strict-greater keeps the smaller cluster id on ties, NaN ranks
  * LARGEST (DuckDB `ORDER BY cos DESC` places NaN first). Transcribes
  * the former `Clustering.assignUdf` loop. */
final class CosAssignKernel(cents: Array[Array[Double]]) extends VecKernel {
  import VectorKernels._
  private val cNrm: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))
  override def out: DataType = VectorKernels.assignStruct
  override def name: String = "assign_cos"
  override def apply(v: ArrayData): Any = {
    val n = v.numElements()
    var sq = 0.0
    var j = 0
    while (j < n) { val x = v.getDouble(j); sq += x * x; j += 1 }
    val nrm = math.sqrt(sq)
    def better(cand: Double, best: Double): Boolean =
      if (cand.isNaN) !best.isNaN
      else !best.isNaN && cand > best
    var best = 0
    var bestCos = Double.NaN
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * cent(i); i += 1 }
      val cos = round6(acc / (nrm * cNrm(c)))
      if (c == 0 || better(cos, bestCos)) { bestCos = cos; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestCos))
  }
}

/** L2 assignment: (argmin cluster, round6 sq-distance), ties to the
  * smaller cluster id; NaN distances rank LAST (the ASC mirror of
  * [[CosAssignKernel]]'s NaN rule). Transcribes the former
  * `Clustering.argminL2`/`assignL2Udf`. */
final class L2AssignKernel(cents: Array[Array[Double]]) extends VecKernel {
  import VectorKernels._
  override def out: DataType = VectorKernels.assignStruct
  override def name: String = "assign_l2"
  override def apply(v: ArrayData): Any = {
    val n = v.numElements()
    def better(cand: Double, best: Double): Boolean =
      if (cand.isNaN) false else best.isNaN || cand < best
    var best = 0
    var bestDist = Double.NaN
    var c = 0
    while (c < cents.length) {
      val d = sqDist6Rev(v, 0, n, cents(c))
      if (c == 0 || better(d, bestDist)) { bestDist = d; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestDist))
  }
}

/** Product-quantization encoder: per subspace `s`, the L2-argmin code
  * into that subspace's codebook — `array<int>` of length
  * `books.length`. The subspace view is a zero-copy offset read
  * (`getDouble(s·subDim + i)`), where the UDF copied each slice. */
final class PqEncodeKernel(books: Array[Array[Array[Double]]], subDim: Int)
    extends VecKernel {
  import VectorKernels._
  override def out: DataType = ArrayType(IntegerType, containsNull = false)
  override def name: String = "pq_encode"
  override def apply(v: ArrayData): Any = {
    val codes = new Array[Int](books.length)
    var s = 0
    while (s < books.length) {
      val book = books(s)
      var best = 0
      var bestDist = Double.NaN
      var c = 0
      while (c < book.length) {
        val d = sqDist6Rev(v, s * subDim, subDim, book(c))
        val takes =
          if (c == 0) true
          else if (d.isNaN) false
          else bestDist.isNaN || d < bestDist
        if (takes) { bestDist = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** Random-hyperplane LSH signature: one sign bit per plane packed into a
  * long (plane index = bit index). Transcribes the former
  * `Similarity.lshSignature` UDF. */
final class PlaneSigKernel(planes: Array[Array[Double]]) extends VecKernel {
  override def out: DataType = LongType
  override def name: String = "plane_sig"
  override def apply(v: ArrayData): Any = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < plane.length) { acc += v.getDouble(i) * plane(i); i += 1 }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Int8 scalar-quantization statistics: per-vector (order-weighted code
  * checksum, min code, max code, round6 max |reconstruction error|)
  * against broadcast per-dimension (min, max) ranges. Transcribes the
  * former `Similarity.quantize` UDF — same `floor((x−mn)/(mx−mn)·255 +
  * 0.5)` + clamp, same left-to-right max/err/checksum accumulation. */
final class QuantizeKernel(mns: Array[Double], mxs: Array[Double])
    extends VecKernel {
  import VectorKernels._
  override def out: DataType = StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", LongType, nullable = false),
    StructField("_4", DoubleType, nullable = false)))
  override def name: String = "quantize_stats"
  override def apply(v: ArrayData): Any = {
    val n = v.numElements()
    var checksum = 0L
    var qMin = 255L
    var qMax = 0L
    var maxErr = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i); val mn = mns(i); val mx = mxs(i)
      val qi =
        if (mx == mn) 0L
        else {
          val f = math.floor((x - mn) / (mx - mn) * 255.0 + 0.5)
          math.max(0L, math.min(255L, f.toLong))
        }
      val xhat = if (mx == mn) mn else mn + qi * (mx - mn) / 255.0
      val err = math.abs(x - xhat)
      if (err > maxErr) maxErr = err
      checksum += qi * (131L * i + 1L)
      if (qi < qMin) qMin = qi
      if (qi > qMax) qMax = qi
      i += 1
    }
    new GenericInternalRow(Array[Any](checksum, qMin, qMax, round6(maxErr)))
  }
}

/** Asymmetric Distance Computation: `round6(Σ_s lut[qid][s][codes[s]])`,
  * subspaces left-to-right — the PQ scan loop, m table lookups per
  * candidate, zero vector arithmetic. `luts` is the per-query
  * nQueries·m·k double table (bounded-collect class, built driver-side
  * from the same `sqDist6`). */
final class AdcKernel(luts: Map[Long, Array[Array[Double]]])
    extends IdVecKernel {
  import VectorKernels._
  override def out: DataType = DoubleType
  override def name: String = "pq_adc"
  override def apply(id: Long, codes: ArrayData): Any = {
    val t = luts(id)
    var acc = 0.0
    var s = 0
    while (s < t.length) { acc += t(s)(codes.getInt(s)); s += 1 }
    round6(acc)
  }
}

/** Exact re-rank distance: `sqDist6(queryVec, v)` against the captured
  * full query vectors (query side FIRST — the association order the
  * oracle's three-`list_dot_product` expression evaluates). */
final class QueryL2Kernel(qVecs: Map[Long, Array[Double]])
    extends IdVecKernel {
  import VectorKernels._
  override def out: DataType = DoubleType
  override def name: String = "query_l2"
  override def apply(id: Long, v: ArrayData): Any =
    sqDist6(qVecs(id), v, 0)
}

/** IVF-PQ residual: `round6(v[i] − cents[cluster][i])` per component —
  * the vector each residual-PQ codebook is fitted on and encoded from.
  * Components are round6'd at CREATION so the decimal-exact fit means
  * downstream see at-most-6-decimal values (no double→DECIMAL rounding
  * ambiguity between engines). `id` is the coarse cluster. */
final class ResidualKernel(cents: Array[Array[Double]])
    extends IdVecKernel {
  import VectorKernels._
  override def out: DataType = ArrayType(DoubleType, containsNull = false)
  override def name: String = "ivf_residual"
  override def apply(id: Long, v: ArrayData): Any = {
    val cent = cents(id.toInt)
    val out = new Array[Double](cent.length)
    var i = 0
    while (i < cent.length) {
      out(i) = round6(v.getDouble(i) - cent(i)); i += 1
    }
    new GenericArrayData(out)
  }
}
