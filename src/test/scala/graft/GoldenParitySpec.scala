package graft

import org.apache.spark.SparkException

import graft.io.OtlpRead
import graft.transform.Otlp

/** Cell-by-cell parity against the reference's golden Parquet files:
  * transform the OTLP JSONL fixtures and compare with
  * /root/reference/testdata/parquet (the output contract, SURVEY §1.2).
  */
class GoldenParitySpec extends SparkTestBase {

  private val ref = "/root/reference/testdata"

  test("logs jsonl matches golden logs.parquet") {
    val out = Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs, s"$ref/logs.jsonl"))
    val golden = spark.read.parquet(s"$ref/parquet/logs.parquet")
    assertFrameEqual(out, golden, Seq("Timestamp", "ServiceName", "Body"))
  }

  test("traces jsonl matches golden traces.parquet") {
    val out = Otlp.traces(OtlpRead.jsonl(spark, OtlpRead.Traces, s"$ref/traces.jsonl"))
    val golden = spark.read.parquet(s"$ref/parquet/traces.parquet")
    assertFrameEqual(out, golden, Seq("SpanId"))
  }

  test("metrics json fixtures match golden metrics parquet (all five kinds)") {
    def pmOf(fixture: String) =
      Otlp.metrics(OtlpRead.json(spark, OtlpRead.Metrics, s"$ref/$fixture"))
    def golden(kind: String) =
      spark.read.parquet(s"$ref/parquet/metrics_$kind.parquet")
    val key = Seq("Timestamp", "MetricName", "Attributes")
    assertFrameEqual(pmOf("metrics_gauge.json").gauge, golden("gauge"), key)
    assertFrameEqual(pmOf("metrics_sum.json").sum, golden("sum"), key)
    assertFrameEqual(pmOf("metrics_histogram.json").histogram, golden("histogram"), key)
    assertFrameEqual(pmOf("metrics_exponential_histogram.json").expHistogram,
      golden("exponential_histogram"), key)
    assertFrameEqual(pmOf("metrics_summary.json").summary, golden("summary"), key)
  }

  test("logs.pb (protobuf wire format) matches golden logs.parquet") {
    val out = Otlp.logs(OtlpRead.protobuf(spark, OtlpRead.Logs, s"$ref/logs.pb"))
    val golden = spark.read.parquet(s"$ref/parquet/logs.parquet")
    assertFrameEqual(out, golden, Seq("Timestamp", "ServiceName", "Body"))
  }

  test("traces.pb matches golden traces.parquet") {
    val out = Otlp.traces(OtlpRead.protobuf(spark, OtlpRead.Traces, s"$ref/traces.pb"))
    val golden = spark.read.parquet(s"$ref/parquet/traces.parquet")
    assertFrameEqual(out, golden, Seq("SpanId"))
  }

  test("metrics .pb fixtures match golden metrics parquet (all five kinds)") {
    def pmOf(fixture: String) =
      Otlp.metrics(OtlpRead.protobuf(spark, OtlpRead.Metrics, s"$ref/$fixture"))
    def golden(kind: String) =
      spark.read.parquet(s"$ref/parquet/metrics_$kind.parquet")
    val key = Seq("Timestamp", "MetricName", "Attributes")
    assertFrameEqual(pmOf("metrics_gauge.pb").gauge, golden("gauge"), key)
    assertFrameEqual(pmOf("metrics_sum.pb").sum, golden("sum"), key)
    assertFrameEqual(pmOf("metrics_histogram.pb").histogram, golden("histogram"), key)
    assertFrameEqual(pmOf("metrics_exponential_histogram.pb").expHistogram,
      golden("exponential_histogram"), key)
    assertFrameEqual(pmOf("metrics_summary.pb").summary, golden("summary"), key)
  }

  test("protobuf and jsonl decode to identical flat tables") {
    val pb = Otlp.logs(OtlpRead.protobuf(spark, OtlpRead.Logs, s"$ref/logs.pb"))
    val js = Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs, s"$ref/logs.jsonl"))
    assertFrameEqual(pb, js, Seq("Timestamp", "ServiceName", "Body"))
  }

  test("gzip inputs decode transparently (jsonl via Hadoop codec, pb via magic bytes)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-gz")
    def gz(src: String, dst: String): Unit = {
      val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(src))
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(tmp.resolve(dst)))
      out.write(in); out.close()
    }
    gz(s"$ref/logs.jsonl", "logs.jsonl.gz")
    gz(s"$ref/logs.pb", "logs.pb.gz")
    val viaJson = Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs,
      tmp.resolve("logs.jsonl.gz").toString))
    assert(viaJson.count() == 81)
    val viaPb = Otlp.logs(OtlpRead.protobuf(spark, OtlpRead.Logs,
      tmp.resolve("logs.pb.gz").toString))
    assert(viaPb.count() == 81)
  }

  test("oversized protobuf payload is a hard error (reference 413)") {
    intercept[SparkException] {
      Otlp.logs(OtlpRead.protobufLimited(spark, OtlpRead.Logs, 100L,
        s"$ref/logs.pb")).collect()
    }
  }

  test("metrics_mixed envelope routes data points to the right kind tables") {
    val pm = Otlp.metrics(OtlpRead.json(spark, OtlpRead.Metrics, s"$ref/metrics_mixed.json"))
    assert(pm.gauge.count() > 0)
    assert(pm.sum.count() > 0)
    assert(pm.histogram.count() > 0)
  }

  test("single-envelope log.json flattens (multiline json source)") {
    val out = Otlp.logs(OtlpRead.json(spark, OtlpRead.Logs, s"$ref/log.json"))
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("ServiceName") == "frontend-proxy")
    // resource attrs keep non-service keys, sorted
    val ra = r.getAs[String]("ResourceAttributes")
    assert(ra.startsWith("{\"cluster_name\":\"\""), ra)
    assert(!ra.contains("service.name"))
  }

  test("jsonl + json unioned pipelines concat (batch-merge analogue)") {
    val a = Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs, s"$ref/logs.jsonl"))
    val b = Otlp.logs(OtlpRead.json(spark, OtlpRead.Logs, s"$ref/log.json"))
    assert(a.unionAll(b).count() == 82)
  }

  test("malformed json is a hard error (reference 400)") {
    intercept[Exception] {
      Otlp.logs(OtlpRead.json(spark, OtlpRead.Logs, s"$ref/invalid/malformed.json"))
        .collect()
    }
  }

  test("invalid base64 trace id is a hard error (e2e.rs:254-265)") {
    val ex = intercept[SparkException] {
      Otlp.traces(OtlpRead.json(spark, OtlpRead.Traces,
        s"$ref/invalid/trace_invalid_base64.json")).collect()
    }
    assert(ex.getMessage.contains("invalid") || ex.getCause != null)
  }

  test("mixed/garbage id encoding is a hard error (e2e.rs:307-318)") {
    intercept[SparkException] {
      Otlp.traces(OtlpRead.json(spark, OtlpRead.Traces,
        s"$ref/invalid/trace_mixed_encoding.json")).collect()
    }
  }

  test("invalid severity enum is graceful (e2e.rs:238-252)") {
    val out = Otlp.logs(OtlpRead.json(spark, OtlpRead.Logs,
      s"$ref/invalid/log_invalid_severity.json")).collect()
    assert(out.nonEmpty) // graceful: record kept, severity falls back to 0
  }

  test("summary metrics are produced by transform but counted as skipped") {
    val pm = Otlp.metrics(OtlpRead.json(spark, OtlpRead.Metrics,
      s"$ref/metrics_summary.json"))
    val skipped = pm.skipped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skipped.getOrElse("summaries", 0L) > 0L)
  }
}
