package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{OtelWrite, OtlpRead}
import graft.operators.OtelQueries
import graft.transform.Otlp

/** The documented query surface over the engine's own otel_logs/otel_traces
  * output (docs/querying.md), including the binary-vs-hex TraceId join. */
class OtelQueriesSpec extends SparkTestBase {

  private val ref = "/root/reference/testdata"

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-otel-tables").toString
    OtelWrite.write(Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs, s"$ref/logs.jsonl")),
      dir, "otel_logs")
    OtelWrite.write(Otlp.traces(OtlpRead.jsonl(spark, OtlpRead.Traces, s"$ref/traces.jsonl")),
      dir, "otel_traces")
    dir
  }

  test("recent errors + volume by service run over written tables") {
    val vol = OtelQueries.logVolumeByService(spark, root).collect()
    assert(vol.map(_.getAs[Long]("n")).sum == 81)
    val errs = OtelQueries.recentErrors(spark, root).collect()
    assert(errs.forall(r => Seq("ERROR", "FATAL").contains(r.getAs[String]("SeverityText"))))
  }

  test("slowest traces are root spans ordered by duration") {
    val rows = OtelQueries.slowestTraces(spark, root, k = 5).collect()
    assert(rows.nonEmpty)
    val durs = rows.map(_.getAs[Double]("duration_s"))
    assert(durs.sameElements(durs.sortBy(-_)))
  }

  test("logs join traces on hex(TraceId), zero ids excluded") {
    // golden corpus has STATUS_CODE_UNSET only → join against UNSET to get rows
    val joined = OtelQueries.logsForErroredTraces(spark, root,
      statusCodes = Seq("STATUS_CODE_UNSET")).collect()
    assert(joined.nonEmpty, "logs with trace context must join their spans")
    // every joined log's trace_hex is a real span id, 32 lowercase hex chars
    assert(joined.forall(_.getAs[String]("trace_hex").matches("[0-9a-f]{32}")))
    // and no all-zero ids survived
    assert(!joined.exists(_.getAs[String]("trace_hex") == "0" * 32))
    // count parity with a direct computation over the flat tables
    val l = spark.read.parquet(s"$root/otel_logs")
      .filter(hex(col("TraceId")) =!= lit("0" * 32))
      .select(lower(hex(col("TraceId"))).as("h"))
    val t = spark.read.parquet(s"$root/otel_traces")
      .filter(col("StatusCode") === "STATUS_CODE_UNSET")
      .select(col("TraceId").as("h")).distinct()
    assert(joined.length == l.join(t, "h").count())
  }

  test("spans per hour aggregates with exact average") {
    val rows = OtelQueries.spansPerHour(spark, root).collect()
    assert(rows.map(_.getAs[Long]("n_spans")).sum == 19)
  }
}
