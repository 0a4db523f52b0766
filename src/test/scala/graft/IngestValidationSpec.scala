package graft

import org.scalatest.funsuite.AnyFunSuite

/** Startup-validation parity (/root/reference/src/config/validation.rs):
  * a bad output location fails fast with a clear message, before any Spark
  * work begins. */
class IngestValidationSpec extends AnyFunSuite {

  test("uncreatable output root fails fast with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Ingest.main(Array("logs", "jsonl",
        "/root/reference/testdata/logs.jsonl", "/dev/null/nope"))
    }
    assert(e.getMessage.contains("output root"), e.getMessage)
  }

  test("bad usage fails before any work") {
    intercept[IllegalArgumentException] {
      Ingest.main(Array("logs"))
    }
  }
}
