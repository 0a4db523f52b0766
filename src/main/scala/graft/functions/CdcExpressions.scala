package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined-chunking kernel shared by the native expression and
  * spec recomputes: boundary positions where the trailing `window`-token
  * md5Lower63 hits `0 mod modulus`, then per-chunk token count + 63-bit
  * md5 chunk identity. ONE pass over the token array, digest bytes
  * straight to long ([[PortableHash.md5Lower63]]) — the first cut of
  * `text_cdc_chunks` composed this from builtin md5/substr/conv columns,
  * paying a hex-string round-trip per window (8.3 s of the sf0.1 bench,
  * the slowest gate on the surface). Semantics are IDENTICAL by
  * construction (same hash function, same congruence), so the gate's
  * oracle hashes are unchanged. */
object CdcChunker {

  /** `toks` → array of (n_toks, chunk_hash) structs. `window`/`modulus`
    * as in `TextAnalysis.{CdcWindow, CdcModulus}`. Boundary rule (1-based
    * position i): `window <= i < n`, hash of toks[i-window+1..i] ≡ 0
    * (mod modulus) → chunk break after token i. */
  def compute(toks: ArrayData, window: Int, modulus: Long): ArrayData = {
    val n = toks.numElements()
    val strs = new Array[String](n)
    var i = 0
    while (i < n) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
    val bounds = new java.util.ArrayList[Integer]()
    val sb = new java.lang.StringBuilder
    var p = window // 1-based boundary candidate position
    while (p < n) {
      sb.setLength(0)
      var j = p - window
      while (j < p) {
        if (j > p - window) sb.append(' ')
        sb.append(strs(j)); j += 1
      }
      if (PortableHash.md5Lower63(sb.toString) % modulus == 0L)
        bounds.add(Integer.valueOf(p))
      p += 1
    }
    val out = new Array[Any](bounds.size() + 1)
    var start = 0 // 0-based inclusive chunk start
    var c = 0
    while (c <= bounds.size()) {
      val end = if (c < bounds.size()) bounds.get(c).intValue() else n
      sb.setLength(0)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(strs(j)); j += 1
      }
      out(c) = new GenericInternalRow(Array[Any](
        (end - start).toLong, PortableHash.md5Lower63(sb.toString)))
      start = end
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` tokens → `array<struct<n_toks, h>>` CDC chunks as a
  * native expression (the [[MinhashSigExpr]] pattern: interpreted path
  * reads ArrayData in place, codegen path is one static call inside
  * whole-stage codegen). */
case class CdcChunksExpr(child: Expression, window: Int, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires array<string> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n_toks", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunker.compute(input.asInstanceOf[ArrayData], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunker.compute($c, $window, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd CDC chunk derivation over an `array<string>` token column. */
  def cdcChunks(c: Column, window: Int, modulus: Long): Column =
    column(CdcChunksExpr(expression(c), window, modulus))
}
