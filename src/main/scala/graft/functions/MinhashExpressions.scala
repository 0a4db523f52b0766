package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The 64-permutation MinHash signature kernel, shared by the Scala paths
  * and the native Catalyst expression — ONE definition of the permutation
  * coefficients (fixed seed 42, identical on every executor and inlined
  * into the DuckDB oracle SQL by [[graft.operators.Dedup]]).
  *
  * The standalone object gets Java static forwarders, so generated
  * whole-stage code calls `graft.functions.MinhashSig.compute(arr)`
  * directly — no boxing, no Catalyst↔Scala collection conversion. */
object MinhashSig {

  val NumPerms = 64
  val MersennePrime = 2147483647L // 2^31 − 1

  /** Affine permutation coefficients from a fixed seed — deterministic
    * across runs and executors. */
  lazy val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumPerms)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** Signature over 63-bit shingle hashes read straight from Catalyst
    * ArrayData (the 31-bit perm input is the low bits — same md5,
    * computed once): min over (a·h+b) mod p per permutation. a·h < 2⁶² —
    * no overflow. Elements are produced non-null by the shingle pipeline;
    * no per-element null check (matches the UDF this replaces, which
    * would have thrown on null). */
  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    val pa = permA
    val pb = permB
    var k = 0
    while (k < n) {
      val h = hs.getLong(k) & MersennePrime
      var i = 0
      while (i < NumPerms) {
        val v = (pa(i) * h + pb(i)) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  /** Plain-array variant for driver-side spec recomputes. */
  def computeArray(hs: Array[Long]): Array[Long] = {
    val out = compute(new GenericArrayData(hs))
    out.toLongArray()
  }
}

/** `array<long>` shingle hashes → `array<long>` 64-perm MinHash signature
  * as a NATIVE expression: the interpreted path reads ArrayData directly
  * and the codegen path is one static call per row inside whole-stage
  * codegen — replacing a Scala UDF that paid an ArrayData→boxed-Seq[Long]
  * conversion and a codegen fence per row on the hottest dedup path
  * (every LSH/minhash gate signs the whole corpus). */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd MinHash signature of an `array<long>` hash column. */
  def minhashSig(c: Column): Column = column(MinhashSigExpr(expression(c)))
}
