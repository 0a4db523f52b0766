package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 3-gram shingle→MD5-63 kernel, shared by the Scala spec paths and the
  * native Catalyst expression — one definition of the tokenization
  * (single-space split, trailing empties kept, exactly Spark's
  * `split(text, ' ')`), the shingle join (`t0 + " " + t1 + " " + t2`), the
  * first-occurrence distinct order, and the byte-capped executor-local
  * digest memo. Replaces the Scala UDF on `Dedup.docShingleHashes` — the
  * map pass EVERY set-similarity gate (Jaccard, containment, MinHash/LSH,
  * SimHash, novelty, cross-corpus, decontaminate) funnels the corpus
  * through — eliminating the per-row ArrayData→boxed-Seq[String]
  * conversion and the codegen fence.
  *
  * The object gets Java static forwarders, so whole-stage generated code
  * calls `graft.functions.ShingleHash.compute(s)` directly. */
object ShingleHash {

  /** Approximate-bytes budget for the executor-local digest memo (64 MB,
    * the same bound as Dedup's token cache): past it, hashes are
    * recomputed — correctness unaffected, memory bounded. */
  private val CacheMaxBytes = 64L << 20

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Memoized [[PortableHash.md5Lower63]] — corpora share an n-gram
    * vocabulary, the digest dominates the map pass, and caching a pure
    * function cannot change results. */
  def hash(s: String): Long = {
    val hit = cache.get(s)
    if (hit ne null) hit.longValue()
    else {
      val h = PortableHash.md5Lower63(s)
      // reserve-then-insert (not check-then-act): the reservation makes the
      // budget a true bound under concurrent executor threads — a lost
      // putIfAbsent race or a reservation past the budget rolls back
      val sz = 80L + 2L * s.length
      if (cacheBytes.addAndGet(sz) <= CacheMaxBytes) {
        if (cache.putIfAbsent(s, java.lang.Long.valueOf(h)) != null)
          cacheBytes.addAndGet(-sz)
      } else cacheBytes.addAndGet(-sz)
      h
    }
  }

  /** Distinct 63-bit shingle hashes of `text` in first-occurrence order —
    * bit-identical to the former `split + UDF` pipeline (same split
    * semantics, same joins, same digest). */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) new GenericArrayData(Array.emptyLongArray)
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i + 2 < toks.length) {
        seen.add(java.lang.Long.valueOf(
          hash(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** Plain-array variant for driver-side spec recomputes. */
  def computeArray(text: String): Array[Long] =
    compute(UTF8String.fromString(text)).toLongArray()
}

/** `string` → `array<long>` distinct 3-gram shingle MD5-63 hashes as a
  * NATIVE expression: interpreted path reads the UTF8String directly,
  * codegen path is one static call per row inside whole-stage codegen. */
case class ShingleHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd distinct shingle hashes of a string column. */
  def shingleHashes(c: Column): Column = column(ShingleHashExpr(expression(c)))
}
