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
}
