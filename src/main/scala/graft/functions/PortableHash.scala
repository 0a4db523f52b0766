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

  /** [[md5Lower63]] as a COLUMN over Spark builtins — whole-stage-codegen
    * friendly (md5/substring/conv/shift all codegen), replacing the
    * per-row Scala UDF wrappers on gate paths. Bytes 8..15 of the digest
    * are hex chars 17..32; the little-endian u64 is assembled as two
    * 32-bit big-endian-of-reversed-bytes halves (each fits a signed long,
    * so no ANSI overflow on the conv cast), and bit 63 — the top bit of
    * byte 15, i.e. of the high half — is cleared by the `& 0x7FFFFFFF`
    * before the shift, reproducing the `& Long.MaxValue`. Equality with
    * the Scala form is property-tested (PortableHashSpec). */
  def md5Lower63Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val hex = md5(c.cast("string"))
    def byte(i: Int) = substring(hex, 17 + 2 * i, 2) // digest byte 8+i
    val hi = conv(concat(byte(7), byte(6), byte(5), byte(4)), 16, 10).cast("long")
    val lo = conv(concat(byte(3), byte(2), byte(1), byte(0)), 16, 10).cast("long")
    shiftleft(hi.bitwiseAND(lit(0x7FFFFFFFL)), 32).bitwiseOR(lo)
  }
}
