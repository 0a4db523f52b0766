package graft

import java.nio.file.Files

/** Runtime telemetry parity: the reference's named counter set
  * (/root/reference/src/handlers.rs:81,102-103,146,189,600-603,682-687)
  * carried as Spark accumulators, asserted EXACTLY after ingesting the
  * golden fixtures — including the rejected counter on an oversized
  * payload (413 path). */
class TelemetrySpec extends SparkTestBase {

  private val ref = "/root/reference/testdata"
  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("logs ingest: requests/bytes/records/flushes counted exactly") {
    val tel = new Telemetry(spark.sparkContext)
    val out = tmp("graft-tel-logs")
    val counted = Ingest.run(spark, Config.GraftConfig(), "logs", "jsonl",
      Seq(s"$ref/logs.jsonl"), out, tel)
    assert(counted.map(_._2).sum == 81) // golden logs.parquet row count
    val s = tel.snapshot
    assert(s(Telemetry.IngestRequests) == 1L) // one landing file = one request
    assert(s(Telemetry.IngestBytes) ==
      Files.size(java.nio.file.Paths.get(s"$ref/logs.jsonl")))
    assert(s(Telemetry.IngestRecords) == 81L)
    assert(s(Telemetry.IngestRejected) == 0L)
    assert(s(Telemetry.BatchFlushes) == 1L)
    assert(s(Telemetry.TracesFlushes) == 0L)
    assert(s(Telemetry.MetricsFlushes) == 0L)
    assert(s(Telemetry.IngestLatencyMs) >= 0L)
  }

  test("traces ingest counts to the traces flush counter") {
    val tel = new Telemetry(spark.sparkContext)
    val out = tmp("graft-tel-traces")
    Ingest.run(spark, Config.GraftConfig(), "traces", "jsonl",
      Seq(s"$ref/traces.jsonl"), out, tel)
    val s = tel.snapshot
    assert(s(Telemetry.IngestRequests) == 1L)
    assert(s(Telemetry.IngestRecords) == 19L) // golden traces.parquet spans
    assert(s(Telemetry.TracesFlushes) == 1L)
    assert(s(Telemetry.BatchFlushes) == 0L)
  }

  test("metrics ingest: records counts ALL decoded data points incl. skipped") {
    val tel = new Telemetry(spark.sparkContext)
    val out = tmp("graft-tel-metrics")
    val counted = Ingest.run(spark, Config.GraftConfig(), "metrics", "json",
      Seq(s"$ref/metrics_summary.json"), out, tel)
    val persisted = counted.map(_._2).sum
    // independent recount of skipped points straight from the transform
    val skipped = graft.transform.Otlp
      .metrics(graft.io.OtlpRead.json(spark, graft.io.OtlpRead.Metrics,
        s"$ref/metrics_summary.json"))
      .skipped.collect().map(_.getLong(1)).sum
    assert(skipped > 0L) // the summary fixture's points are all skipped
    val s = tel.snapshot
    assert(s(Telemetry.IngestRecords) == persisted + skipped)
    // one flush per non-empty kind table this run
    assert(s(Telemetry.MetricsFlushes) == counted.count(_._2 > 0).toLong)
  }

  test("oversized payload increments rejected and fails fast (413 parity)") {
    val tel = new Telemetry(spark.sparkContext)
    val out = tmp("graft-tel-rej")
    val cfg = Config.GraftConfig(request = Config.RequestConfig(maxPayloadBytes = 64L))
    // json = one envelope per file = one request body (the 413 unit);
    // jsonl is exempt from the file-size guard — see the next test
    val e = intercept[IllegalArgumentException] {
      Ingest.run(spark, cfg, "logs", "json", Seq(s"$ref/log.json"), out, tel)
    }
    assert(e.getMessage.contains("exceeds max"))
    val s = tel.snapshot
    assert(s(Telemetry.IngestRejected) == 1L)
    assert(s(Telemetry.IngestRequests) == 1L) // counted before the reject
    assert(s(Telemetry.BatchFlushes) == 0L) // nothing written
    assert(!new java.io.File(out, "otel_logs").exists())
  }

  test("bulk jsonl landing files are NOT size-guarded (line = request)") {
    val tel = new Telemetry(spark.sparkContext)
    val out = tmp("graft-tel-bulk")
    // a limit far below the golden file size: jsonl must still ingest —
    // its request analog is the line, not the file
    val cfg = Config.GraftConfig(request = Config.RequestConfig(maxPayloadBytes = 64L))
    val counted = Ingest.run(spark, cfg, "logs", "jsonl",
      Seq(s"$ref/logs.jsonl"), out, tel)
    assert(counted.map(_._2).sum == 81)
    assert(tel.snapshot(Telemetry.IngestRejected) == 0L)
  }

  test("summaryJson is one stable sorted-key JSON object") {
    val tel = new Telemetry(spark.sparkContext)
    tel.ingestRequests.add(2L)
    val json = tel.summaryJson
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains(""""otlp.ingest.requests":2"""))
    // keys sorted → batch.flushes precedes ingest.bytes precedes traces
    val keys = """"([a-z._]+)":""".r.findAllMatchIn(json).map(_.group(1)).toSeq
    assert(keys == keys.sorted)
  }
}
