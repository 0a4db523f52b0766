package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String front for [[OtlpCodecs]]' id decode — the per-row kernel the
  * generated code calls (static forwarders make `IdCodec.bytes(...)`
  * callable from Janino-compiled Java). Null/empty handling follows the
  * OTLP contract: an ABSENT id decodes to all-zero bytes (reference
  * `src/otlp/ids.rs`), except the or-null form used for root spans'
  * ParentSpanId, which stays SQL NULL. Invalid ids (neither 2n-char hex
  * nor n-byte base64) throw — the ingest fail-fast contract. */
object IdCodec {
  def bytes(s: UTF8String, n: Int): Array[Byte] =
    OtlpCodecs.decodeId(if (s == null) null else s.toString, n)
  def hex(s: UTF8String, n: Int): UTF8String =
    UTF8String.fromString(OtlpCodecs.toHex(bytes(s, n)))
  def hexOrNull(s: UTF8String, n: Int): UTF8String =
    if (s == null || s.numBytes == 0) null else hex(s, n)
}

/** Codegen-native OTLP id decode — replaces the last interpreted stretch
  * on the flatten path (the headline ingest throughput number).
  *
  * The UDF versions paid the ScalaUDF eval fence per id per row AND could
  * not be used inside higher-order-function lambdas (Spark forbids UDF
  * calls in lambda bodies), which forced the link-id arrays through a
  * whole-row `Seq[Row]` UDF. A native expression has neither restriction:
  * `transform(links, l => idHex(l("traceId")))` now runs the scalar
  * kernel per element inside the generated loop.
  *
  * NULL CONTRACT IS NOT the default null-intolerant one: a null/empty
  * input produces the ZERO id (not NULL) for `bytes`/`hex` modes, so this
  * expression overrides `eval`/`doGenCode` rather than using
  * `nullSafeEval` — the child's null flag is folded into the kernel
  * argument instead of short-circuiting. */
case class IdDecodeExpr(child: Expression, nbytes: Int, mode: String)
    extends UnaryExpression {

  require(mode == "bytes" || mode == "hex" || mode == "hex_or_null",
    s"unknown id-decode mode $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"id_$mode requires a string input, got ${t.sql}")
  }
  override def dataType: DataType =
    if (mode == "bytes") BinaryType else StringType
  override def nullable: Boolean = mode == "hex_or_null"
  override def prettyName: String = s"id_$mode"

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    mode match {
      case "bytes" => IdCodec.bytes(s, nbytes)
      case "hex" => IdCodec.hex(s, nbytes)
      case _ => IdCodec.hexOrNull(s, nbytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arg = s"(${c.isNull} ? null : ${c.value})"
    val jt = CodeGenerator.javaType(dataType)
    if (mode == "hex_or_null") {
      ev.copy(code =
        code"""
          ${c.code}
          $jt ${ev.value} = graft.functions.IdCodec.hexOrNull($arg, $nbytes);
          boolean ${ev.isNull} = ${ev.value} == null;""")
    } else {
      val fn = if (mode == "bytes") "bytes" else "hex"
      ev.copy(code =
        code"""
          ${c.code}
          $jt ${ev.value} = graft.functions.IdCodec.$fn($arg, $nbytes);""",
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IdDecodeExpr =
    copy(child = newChild)
}
