package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions for the similarity operators.
  *
  * The embedding join paths (LSH-bucketed pairs, ANN top-k, IVF probes)
  * evaluate a dot product per candidate pair. A Scala UDF pays
  * catalyst→boxed-`Seq[Double]` conversion per call and blocks
  * whole-stage codegen; Spark's `aggregate`/`zip_with` HOFs evaluate
  * interpreted with boxed lambdas per element (see the perf notes in
  * [[graft.operators.Similarity]]). This expression generates a primitive
  * `ArrayData.getDouble` loop inside whole-stage codegen — no boxing, no
  * conversion, fused with the surrounding operators.
  *
  * Accumulation is left-to-right (index ascending), the same order as the
  * interpreted `nullSafeEval`, the UDF it replaces, and DuckDB's
  * `list_dot_product` — identical IEEE doubles on every path, which the
  * oracle gate depends on. If either input's element type is nullable, a
  * null element makes the whole result NULL (checked per element — the
  * silent-zero a bare `getDouble` would return is numeric corruption);
  * when both inputs are provably non-null (`containsNull = false`, the
  * embedding pipelines) the generated loop carries no per-element check.
  */
case class VectorDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires array<double> inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; $acc = 0.0; break; }"""
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDotExpr =
    copy(left = newLeft, right = newRight)
}

/** A [[VecKernel]] spliced into whole-stage codegen: the generated code
  * is one virtual call on the referenced kernel object per row — the
  * kernel loop itself is plain JIT-compiled JVM code over primitive
  * `ArrayData` reads. No `ScalaUDF` node, no catalyst→Scala conversion,
  * no codegen fence: the surrounding project/filter stage stays fused.
  * Null child → null result (standard null-intolerant unary). */
case class VecKernelExpr(child: Expression, kernel: VecKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${kernel.name} requires array<double> input, got ${t.sql}")
  }
  override def dataType: DataType = kernel.out
  override def prettyName: String = kernel.name
  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("vecKernel", kernel,
        classOf[VecKernel].getName)
      dataType match {
        case _: StructType =>
          s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.apply($v);"
        case _: ArrayType =>
          s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.apply($v);"
        case LongType =>
          s"${ev.value} = ((java.lang.Long) $ref.apply($v)).longValue();"
        case DoubleType =>
          s"${ev.value} = ((java.lang.Double) $ref.apply($v)).doubleValue();"
        case t => throw new IllegalStateException(s"unsupported kernel type $t")
      }
    })
  override protected def withNewChildInternal(newChild: Expression): VecKernelExpr =
    copy(child = newChild)
}

/** [[IdVecKernel]] as a binary expression: `(id: bigint, payload:
  * array<double|int>)` → kernel result. Same codegen contract as
  * [[VecKernelExpr]]. */
case class IdVecKernelExpr(left: Expression, right: Expression,
    kernel: IdVecKernel) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType | IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${kernel.name} requires (bigint, array) inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = kernel.out
  override def prettyName: String = kernel.name
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[Long], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, v) => {
      val ref = ctx.addReferenceObj("idVecKernel", kernel,
        classOf[IdVecKernel].getName)
      dataType match {
        case DoubleType =>
          s"${ev.value} = ((java.lang.Double) $ref.apply($q, $v)).doubleValue();"
        case LongType =>
          s"${ev.value} = ((java.lang.Long) $ref.apply($q, $v)).longValue();"
        case _: ArrayType =>
          s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.apply($q, $v);"
        case t => throw new IllegalStateException(s"unsupported kernel type $t")
      }
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IdVecKernelExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd dot product of two `array<double>` columns. */
  def vectorDot(a: Column, b: Column): Column =
    column(VectorDotExpr(expression(a), expression(b)))

  /** Spherical-k-means assignment over a broadcast codebook:
    * struct<_1: argmax cluster, _2: round6 cos>. */
  def assignCos(v: Column, cents: Array[Array[Double]]): Column =
    column(VecKernelExpr(expression(v), new CosAssignKernel(cents)))

  /** L2 assignment: struct<_1: argmin cluster, _2: round6 sq-dist>. */
  def assignL2(v: Column, cents: Array[Array[Double]]): Column =
    column(VecKernelExpr(expression(v), new L2AssignKernel(cents)))

  /** PQ codes (array<int>, one per subspace) for a vector. */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]],
      subDim: Int): Column =
    column(VecKernelExpr(expression(v), new PqEncodeKernel(books, subDim)))

  /** Random-hyperplane LSH signature packed into a long. */
  def planeSig(v: Column, planes: Array[Array[Double]]): Column =
    column(VecKernelExpr(expression(v), new PlaneSigKernel(planes)))

  /** Int8 scalar-quantization stats:
    * struct<_1 checksum, _2 qmin, _3 qmax, _4 round6 max-abs-err>. */
  def quantizeStats(v: Column, mns: Array[Double],
      mxs: Array[Double]): Column =
    column(VecKernelExpr(expression(v), new QuantizeKernel(mns, mxs)))

  /** PQ Asymmetric Distance: round6 sum of per-subspace LUT entries. */
  def adcDist(qid: Column, codes: Column,
      luts: Map[Long, Array[Array[Double]]]): Column =
    column(IdVecKernelExpr(expression(qid), expression(codes),
      new AdcKernel(luts)))

  /** Exact re-rank distance against captured query vectors. */
  def queryL2(qid: Column, v: Column,
      qVecs: Map[Long, Array[Double]]): Column =
    column(IdVecKernelExpr(expression(qid), expression(v),
      new QueryL2Kernel(qVecs)))

  /** IVF-PQ residual: round6(v − cents[cluster]) per component. */
  def residual(cluster: Column, v: Column,
      cents: Array[Array[Double]]): Column =
    column(IdVecKernelExpr(expression(cluster), expression(v),
      new ResidualKernel(cents)))
}
