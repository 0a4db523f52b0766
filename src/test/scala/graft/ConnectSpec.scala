package graft

import org.scalatest.funsuite.AnyFunSuite

/** The connect config generator mirrors the reference's subcommand surface
  * (otel-collector / claude-code / codex). */
class ConnectSpec extends AnyFunSuite {

  test("otel-collector config routes all three signals to the landing dir") {
    val cfg = Connect.otelCollectorConfig("/tmp/landing")
    for (sig <- Seq("logs", "traces", "metrics")) {
      assert(cfg.contains(s"/tmp/landing/$sig/otlp-$sig.jsonl"), sig)
      assert(cfg.contains(s"file/$sig"), sig)
    }
    assert(cfg.contains("0.0.0.0:4318"))
  }

  test("client configs point at the collector url") {
    assert(Connect.claudeCodeConfig("http://c:1234")
      .contains("OTEL_EXPORTER_OTLP_ENDPOINT=http://c:1234"))
    assert(Connect.codexConfig("http://c:1234").contains("http://c:1234/v1/logs"))
  }
}
