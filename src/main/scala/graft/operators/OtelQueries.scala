package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's documented query set over the produced OTLP flat tables
  * (/root/reference/docs/querying.md — the canonical promises, SURVEY §2.4),
  * expressed against `otel_logs` / `otel_traces` directories written by
  * [[graft.io.OtelWrite]].
  *
  * These run on the engine's own output (not the driver's sf tables), so
  * they are verified by OtelQueriesSpec over ingested golden fixtures rather
  * than the DuckDB sf-gate. The TraceId join resolves the reference's
  * glossed type mismatch (SURVEY §7.4#3): logs carry 16-byte binary ids,
  * traces carry 32-char lowercase hex — the join key is `hex(logs.TraceId)`
  * lower-cased, and all-zero ids (no trace context) are excluded.
  */
object OtelQueries {

  def logs(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/otel_logs")

  def traces(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/otel_traces")

  /** Recent error/fatal logs (docs/querying.md:52-58): IN-list + time order,
    * partition pruning via the service/year/…/hour layout when filtered. */
  def recentErrors(spark: SparkSession, root: String, limit: Int = 100): DataFrame =
    logs(spark, root)
      .filter(col("SeverityText").isin("ERROR", "FATAL"))
      .select(col("Timestamp"), col("ServiceName"), col("SeverityText"), col("Body"))
      .orderBy(col("Timestamp").desc)
      .limit(limit)

  /** Log volume per service (docs/querying.md:43-48). */
  def logVolumeByService(spark: SparkSession, root: String): DataFrame =
    logs(spark, root)
      .groupBy(col("ServiceName"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ServiceName"))

  /** Slowest traces (docs/querying.md:63-82): top-k by Duration (ns),
    * seconds projected out. */
  def slowestTraces(spark: SparkSession, root: String, k: Int = 10): DataFrame =
    traces(spark, root)
      .filter(col("ParentSpanId").isNull) // root spans = whole traces
      .select(col("TraceId"), col("ServiceName"), col("SpanName"),
        (col("Duration") / lit(1e9)).as("duration_s"))
      .orderBy(col("Duration").desc, col("TraceId"))
      .limit(k)

  /** Logs for errored traces (docs/querying.md:110-124): the documented
    * logs ⋈ traces equi-join on TraceId. Binary→hex normalization on the
    * logs side; zero ids (no trace context) dropped pre-join so they can't
    * fan out. The traces side (filtered to errors) is broadcast — at fleet
    * scale errored root spans are a small fraction of log volume. */
  def logsForErroredTraces(spark: SparkSession, root: String,
      statusCodes: Seq[String] = Seq("STATUS_CODE_ERROR")): DataFrame = {
    val l = logs(spark, root)
      .filter(hex(col("TraceId")) =!= lit("0" * 32))
      .withColumn("trace_hex", lower(hex(col("TraceId"))))
    val t = traces(spark, root)
      .filter(col("StatusCode").isin(statusCodes: _*))
      .select(col("TraceId").as("trace_hex"), col("SpanName"), col("StatusCode"))
      .distinct()
    l.join(broadcast(t), "trace_hex")
      .select(col("trace_hex"), col("Timestamp"), col("ServiceName"),
        col("SeverityText"), col("Body"), col("SpanName"), col("StatusCode"))
      .orderBy(col("Timestamp"), col("trace_hex"))
  }

  /** Span throughput per hour (docs/querying.md:87-95 shape over traces). */
  def spansPerHour(spark: SparkSession, root: String): DataFrame =
    traces(spark, root)
      .groupBy(date_trunc("hour", col("Timestamp")).as("hour"),
        col("ServiceName"))
      .agg(count(lit(1)).as("n_spans"),
        Tables.exactAvg(col("Duration").cast("double")).as("avg_duration_ns"))
      .orderBy(col("hour"), col("ServiceName"))

  // ---- gate-verified variants over the reference's golden parquet ----------
  // The sfDir argument is ignored: these read the reference's own golden
  // tables (read-only), so the documented telemetry query surface is
  // DuckDB-hash-verified on REAL otel data, not only spec-checked on
  // engine output.

  // Overridable so the gate queries run on any machine with a checkout of
  // the golden fixtures — the oracle SQL strings below are generated with
  // the same resolved path, so Spark and DuckDB always read the same files.
  private val GoldenDir =
    sys.env.getOrElse("GRAFT_GOLDEN_DIR", "/root/reference/testdata/parquet")

  /** Per-(service, severity) log counts over golden logs
    * (docs/querying.md:43-58 shape). */
  def goldenSevCounts(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/logs.parquet")
      .groupBy(col("ServiceName"), col("SeverityText"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ServiceName"), col("SeverityText"))

  /** Slowest root spans over golden traces (docs/querying.md:63-82). */
  def goldenSlowSpans(spark: SparkSession, sfDirIgnored: String,
      k: Int = 10): DataFrame =
    spark.read.parquet(s"$GoldenDir/traces.parquet")
      .filter(col("ParentSpanId").isNull)
      .select(col("TraceId"), col("SpanName"), col("Duration"),
        (col("Duration") / lit(1e9)).as("duration_s"))
      .orderBy(col("Duration").desc, col("TraceId"))
      .limit(k)

  /** logs ⋈ traces correlation on TraceId over the goldens
    * (docs/querying.md:110-124): binary→lower-hex normalization on the logs
    * side, zero ids excluded, per-trace log/span counts. */
  def goldenTraceLogJoin(spark: SparkSession, sfDirIgnored: String): DataFrame = {
    val l = spark.read.parquet(s"$GoldenDir/logs.parquet")
      .filter(hex(col("TraceId")) =!= lit("0" * 32))
      .groupBy(lower(hex(col("TraceId"))).as("trace_hex"))
      .agg(count(lit(1)).as("n_logs"))
    val t = spark.read.parquet(s"$GoldenDir/traces.parquet")
      .groupBy(col("TraceId").as("trace_hex"))
      .agg(countDistinct(col("SpanId")).as("n_spans"))
    l.join(t, "trace_hex").orderBy(col("trace_hex"))
  }

  /** DuckDB twins over the same golden files. */
  def goldenSevCountsOracleSql: String =
    s"""SELECT ServiceName, SeverityText, count(*) AS n
       |FROM read_parquet('$GoldenDir/logs.parquet')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def goldenSlowSpansOracleSql: String =
    s"""SELECT TraceId, SpanName, Duration, Duration / 1e9 AS duration_s
       |FROM read_parquet('$GoldenDir/traces.parquet')
       |WHERE ParentSpanId IS NULL
       |ORDER BY Duration DESC, TraceId LIMIT 10""".stripMargin

  def goldenTraceLogJoinOracleSql: String =
    s"""WITH l AS (
       |  SELECT lower(hex(TraceId)) AS trace_hex, count(*) AS n_logs
       |  FROM read_parquet('$GoldenDir/logs.parquet')
       |  WHERE hex(TraceId) <> repeat('0', 32)
       |  GROUP BY 1
       |), t AS (
       |  SELECT TraceId AS trace_hex, count(DISTINCT SpanId) AS n_spans
       |  FROM read_parquet('$GoldenDir/traces.parquet')
       |  GROUP BY 1
       |)
       |SELECT l.trace_hex, l.n_logs, t.n_spans
       |FROM l JOIN t USING (trace_hex)
       |ORDER BY trace_hex""".stripMargin
}
