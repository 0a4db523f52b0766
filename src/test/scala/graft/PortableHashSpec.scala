package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash

/** Pins [[PortableHash]] to DuckDB's `md5_number_lower` bit-for-bit. The
  * expected values below were computed with DuckDB 1.0.0:
  * `SELECT CAST(md5_number_lower(s) & mask AS BIGINT)`. Every hash-based
  * operator's oracle (MinHash, SimHash, fingerprint) rests on this identity.
  */
class PortableHashSpec extends AnyFunSuite {

  private val duckdb63: Seq[(String, Long)] = Seq(
    "abc" -> 8250560606382298838L,
    "" -> 9098107892288553193L,
    "the quick brown fox" -> 2648554643959888472L,
    "héllo 中文" -> 7293863268623764998L, // non-ASCII: UTF-8 bytes hashed
    "a b c d e f g" -> 5903535949516368524L
  )

  private val duckdb31: Seq[(String, Long)] = Seq(
    "abc" -> 2101319382L,
    "" -> 403276009L,
    "the quick brown fox" -> 24164952L,
    "héllo 中文" -> 244764166L,
    "a b c d e f g" -> 1974200972L
  )

  test("md5Lower63 matches DuckDB md5_number_lower & (2^63-1)") {
    duckdb63.foreach { case (s, want) =>
      assert(PortableHash.md5Lower63(s) == want, s"md5Lower63($s)")
    }
  }

  test("md5Lower31 matches DuckDB md5_number_lower & (2^31-1)") {
    duckdb31.foreach { case (s, want) =>
      assert(PortableHash.md5Lower31(s) == want, s"md5Lower31($s)")
    }
  }

  test("md5Lower full value matches the 'abc' LE-u64 identity") {
    assert(PortableHash.md5Lower("abc") == 0x727fe1287d3f96d6L)
  }

  test("thread safety: concurrent hashing is stable") {
    val inputs = (0 until 1000).map(i => s"doc-$i token stream $i")
    val expected = inputs.map(PortableHash.md5Lower63)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = inputs.map { s =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = PortableHash.md5Lower63(s)
        })
      }
      assert(futures.map(_.get()) == expected)
    } finally pool.shutdown()
  }
}
