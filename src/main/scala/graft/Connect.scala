package graft

/** Client-configuration generator — the analog of the reference's
  * `otlp2parquet connect {otel-collector,claude-code,codex}` subcommand
  * (/root/reference/src/connect/mod.rs:11-28, /root/reference/src/main.rs:32-41).
  *
  * The reference points clients at its HTTP endpoint; this engine's intake
  * is a landing directory consumed by [[graft.Ingest]] (batch) or
  * [[graft.streaming.OtlpStream]] (streaming), so the collector config uses
  * the OTel Collector's `file` exporter writing OTLP/JSON lines into that
  * directory — the JSONL format [[graft.io.OtlpRead.jsonl]] decodes.
  *
  * Usage: Connect <otel-collector|claude-code|codex> [landingDir]
  */
object Connect {

  def otelCollectorConfig(landingDir: String): String =
    s"""# OpenTelemetry Collector → otlp2parquetspark landing directory
       |# (file exporter emits one OTLP/JSON envelope per line — the JSONL
       |#  format graft.io.OtlpRead.jsonl / graft.streaming.OtlpStream consume)
       |receivers:
       |  otlp:
       |    protocols:
       |      http:
       |        endpoint: 0.0.0.0:4318
       |exporters:
       |  file/logs:
       |    path: $landingDir/logs/otlp-logs.jsonl
       |  file/traces:
       |    path: $landingDir/traces/otlp-traces.jsonl
       |  file/metrics:
       |    path: $landingDir/metrics/otlp-metrics.jsonl
       |service:
       |  pipelines:
       |    logs:
       |      receivers: [otlp]
       |      exporters: [file/logs]
       |    traces:
       |      receivers: [otlp]
       |      exporters: [file/traces]
       |    metrics:
       |      receivers: [otlp]
       |      exporters: [file/metrics]
       |""".stripMargin

  def claudeCodeConfig(collectorUrl: String): String =
    s"""# Claude Code telemetry → collector → landing dir (shell exports)
       |export CLAUDE_CODE_ENABLE_TELEMETRY=1
       |export OTEL_METRICS_EXPORTER=otlp
       |export OTEL_LOGS_EXPORTER=otlp
       |export OTEL_EXPORTER_OTLP_PROTOCOL=http/json
       |export OTEL_EXPORTER_OTLP_ENDPOINT=$collectorUrl
       |""".stripMargin

  def codexConfig(collectorUrl: String): String =
    s"""# OpenAI Codex CLI telemetry (config.toml fragment)
       |[otel]
       |environment = "dev"
       |exporter = { otlp-http = { endpoint = "$collectorUrl/v1/logs", protocol = "json" } }
       |""".stripMargin

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Connect <otel-collector|claude-code|codex> [landingDir|url]")
    val out = args(0) match {
      case "otel-collector" =>
        otelCollectorConfig(args.lift(1).getOrElse("/data/otlp-landing"))
      case "claude-code" =>
        claudeCodeConfig(args.lift(1).getOrElse("http://localhost:4318"))
      case "codex" =>
        codexConfig(args.lift(1).getOrElse("http://localhost:4318"))
      case other => throw new IllegalArgumentException(s"unknown target: $other")
    }
    println(out)
  }
}
