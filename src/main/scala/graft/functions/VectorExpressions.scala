package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd dot product of two `array<double>` columns. */
  def vectorDot(a: Column, b: Column): Column =
    column(VectorDotExpr(expression(a), expression(b)))
}
