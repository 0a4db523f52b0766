package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `(long, long)` → Hilbert d-index on the 65536×65536 grid as a NATIVE
  * expression — the round-12 UDF audit's "one mechanical candidate"
  * (SCALE.md: `Bucketing.hilbertUdf`, ≤0.27 s udf-only at sf1), closed in
  * round 13: the interpreted path and the generated code both make one
  * static call per row into the shared integer kernel
  * [[graft.operators.Bucketing.hilbertIndex]] (the same function the
  * spec's independent inverse round-trips), so the key derivation stays
  * inside whole-stage codegen with no ScalaUDF SerDe on the layout-write
  * path. */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.operators.Bucketing.hilbertIndex(
      x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.operators.Bucketing.hilbertIndex($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd Hilbert index of two grid-coordinate columns. */
  def hilbertIndex(x: Column, y: Column): Column =
    column(HilbertIndexExpr(expression(x), expression(y)))
}
