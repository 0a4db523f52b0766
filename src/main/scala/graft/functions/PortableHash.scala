package graft.functions

/** Engine-portable 64-bit string hashing.
  *
  * The hash-based operators (MinHash, SimHash, fingerprinting) need a hash
  * function that an independent engine can recompute so their outputs are
  * oracle-checkable, not just rows-only. MD5 is the portable choice: every
  * SQL engine ships it, and DuckDB exposes the halves directly as integers
  * (`md5_number_lower`). Scala-side Murmur3 / `hash()` / ad-hoc rolling
  * hashes are JVM- or engine-specific and were replaced by this.
  *
  * [[md5Lower]] reproduces DuckDB's `md5_number_lower(s)` bit-for-bit:
  * the little-endian u64 of md5 bytes 8..15 (verified:
  * md5_number_lower('abc') = 0x727fe1287d3f96d6 = LE(d6 96 3f 7d 28 e1 7f 72)).
  * The value is returned in a signed Long with the same 64-bit pattern.
  */
object PortableHash {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** DuckDB `md5_number_lower(s)`: LE u64 of md5(utf8(s)) bytes 8..15. */
  def md5Lower(s: String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h
  }

  /** Non-negative 63-bit variant — fits DuckDB BIGINT without an (overflow-
    * checked) UBIGINT→BIGINT cast: `md5_number_lower(s) & 9223372036854775807`. */
  def md5Lower63(s: String): Long = md5Lower(s) & Long.MaxValue

  /** 31-bit variant for modular MinHash permutations:
    * `md5_number_lower(s) & 2147483647`. */
  def md5Lower31(s: String): Long = md5Lower(s) & 2147483647L

  /** [[md5Lower63]] over a Tungsten `UTF8String` — the codegen entry point
    * of [[Md5Lower63Expr]] (`UTF8String.getBytes` IS the UTF-8 encoding,
    * so this matches `md5Lower63(javaString)` byte-for-byte; property-
    * tested in PortableHashSpec). */
  def md5Lower63Utf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (bytes(i) & 0xffL); i -= 1 }
    h & Long.MaxValue
  }

  /** [[md5Lower63]] as a COLUMN — a native codegen expression
    * ([[Md5Lower63Expr]]) that assembles the little-endian u64 straight
    * from digest bytes 8..15. Replaces the round-9 builtin composition
    * (md5 → 32-char hex string → 8 substrings → 2 base-16 `conv` parses),
    * which paid ~10 short-lived UTF8String allocations per row on every
    * hash-heavy gate (bootstrap fan-out, sampling, bucketing, text
    * fingerprints). Values are bit-identical (PortableHashSpec pins
    * column == Scala form on fuzzed inputs), so every oracle hash is
    * unchanged. */
  def md5Lower63Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(Md5Lower63Expr(expression(c.cast("string"))))
  }
}

/** `string → bigint`: DuckDB-portable `md5_number_lower(s) &
  * Long.MaxValue`, spliced into whole-stage codegen as one static call on
  * [[PortableHash.md5Lower63Utf8]] (thread-local digest, zero per-row
  * allocation beyond the digest's own buffer). Null in → null out. */
case class Md5Lower63Expr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_lower63 requires string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower63"
  override protected def nullSafeEval(s: Any): Any =
    PortableHash.md5Lower63Utf8(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PortableHash.md5Lower63Utf8($v);")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Md5Lower63Expr =
    copy(child = newChild)
}
