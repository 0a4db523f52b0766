package graft.schema

import org.apache.spark.sql.types._

/** Input (OTLP/JSON envelope) and output (flat table) schemas.
  *
  * Output schemas are the ground truth extracted from the reference's golden
  * files (/root/reference/testdata/parquet goldens, schema docs
  * /root/reference/docs/reference.md:41-175). Input schemas mirror the
  * OTLP/JSON protobuf-JSON mapping used by the fixtures
  * (/root/reference/testdata JSON fixtures).
  *
  * OTLP `AnyValue` is recursive (arrayValue / kvlistValue); Spark StructTypes
  * cannot be recursive, so nesting is bounded at [[MaxAnyValueDepth]] levels —
  * deeper values parse as null. The reference fixtures use depth 1.
  */
object OtlpSchemas {

  val MaxAnyValueDepth = 4

  val LogsSchemaVersion = "1.1.0"
  val TracesSchemaVersion = "1.0.0"
  val MetricsSchemaVersion = "1.0.0"

  // ---- input: OTLP/JSON --------------------------------------------------
  // u64 nanos / int64s arrive as JSON strings per the proto3 JSON mapping,
  // but may also be bare numbers; StringType accepts both under Spark's
  // JacksonParser, so every numeric-flexible field is StringType + cast.

  def anyValueType(depth: Int): StructType = {
    val scalar = Seq(
      StructField("stringValue", StringType),
      StructField("boolValue", BooleanType),
      StructField("intValue", StringType),
      StructField("doubleValue", DoubleType),
      StructField("bytesValue", StringType)
    )
    val nested =
      if (depth <= 0) Nil
      else
        Seq(
          StructField(
            "arrayValue",
            StructType(Seq(StructField("values", ArrayType(anyValueType(depth - 1)))))),
          StructField(
            "kvlistValue",
            StructType(Seq(StructField("values", ArrayType(keyValueType(depth - 1))))))
        )
    StructType(scalar ++ nested)
  }

  def keyValueType(depth: Int): StructType =
    StructType(
      Seq(StructField("key", StringType), StructField("value", anyValueType(depth))))

  /** `repeated KeyValue` — attribute lists everywhere in OTLP. */
  val attributesType: ArrayType = ArrayType(keyValueType(MaxAnyValueDepth))

  val resourceType: StructType = StructType(
    Seq(
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType)))

  val scopeType: StructType = StructType(
    Seq(
      StructField("name", StringType),
      StructField("version", StringType),
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType)))

  // -- logs (ExportLogsServiceRequest) --

  val logRecordType: StructType = StructType(
    Seq(
      StructField("timeUnixNano", StringType),
      StructField("observedTimeUnixNano", StringType),
      StructField("severityNumber", StringType),
      StructField("severityText", StringType),
      StructField("body", anyValueType(MaxAnyValueDepth)),
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType),
      StructField("flags", StringType),
      StructField("traceId", StringType),
      StructField("spanId", StringType)
    ))

  val logsRequestType: StructType = StructType(
    Seq(
      StructField(
        "resourceLogs",
        ArrayType(StructType(Seq(
          StructField("resource", resourceType),
          StructField(
            "scopeLogs",
            ArrayType(StructType(Seq(
              StructField("scope", scopeType),
              StructField("logRecords", ArrayType(logRecordType)),
              StructField("schemaUrl", StringType))))),
          StructField("schemaUrl", StringType)
        ))))))

  // -- traces (ExportTraceServiceRequest) --

  val spanEventType: StructType = StructType(
    Seq(
      StructField("timeUnixNano", StringType),
      StructField("name", StringType),
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType)))

  val spanLinkType: StructType = StructType(
    Seq(
      StructField("traceId", StringType),
      StructField("spanId", StringType),
      StructField("traceState", StringType),
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType)))

  val spanType: StructType = StructType(
    Seq(
      StructField("traceId", StringType),
      StructField("spanId", StringType),
      StructField("traceState", StringType),
      StructField("parentSpanId", StringType),
      StructField("name", StringType),
      StructField("kind", StringType),
      StructField("startTimeUnixNano", StringType),
      StructField("endTimeUnixNano", StringType),
      StructField("attributes", attributesType),
      StructField("droppedAttributesCount", StringType),
      StructField("events", ArrayType(spanEventType)),
      StructField("links", ArrayType(spanLinkType)),
      StructField(
        "status",
        StructType(
          Seq(StructField("message", StringType), StructField("code", StringType))))
    ))

  val tracesRequestType: StructType = StructType(
    Seq(
      StructField(
        "resourceSpans",
        ArrayType(StructType(Seq(
          StructField("resource", resourceType),
          StructField(
            "scopeSpans",
            ArrayType(StructType(Seq(
              StructField("scope", scopeType),
              StructField("spans", ArrayType(spanType)),
              StructField("schemaUrl", StringType))))),
          StructField("schemaUrl", StringType)
        ))))))

  // -- metrics (ExportMetricsServiceRequest) --

  val numberDataPointType: StructType = StructType(
    Seq(
      StructField("attributes", attributesType),
      StructField("startTimeUnixNano", StringType),
      StructField("timeUnixNano", StringType),
      StructField("asDouble", DoubleType),
      StructField("asInt", StringType),
      StructField("flags", StringType)
    ))

  val histogramDataPointType: StructType = StructType(
    Seq(
      StructField("attributes", attributesType),
      StructField("startTimeUnixNano", StringType),
      StructField("timeUnixNano", StringType),
      StructField("count", StringType),
      StructField("sum", DoubleType),
      StructField("bucketCounts", ArrayType(StringType)),
      StructField("explicitBounds", ArrayType(DoubleType)),
      StructField("min", DoubleType),
      StructField("max", DoubleType),
      StructField("flags", StringType)
    ))

  val expHistogramBucketsType: StructType = StructType(
    Seq(
      StructField("offset", StringType),
      StructField("bucketCounts", ArrayType(StringType))))

  val expHistogramDataPointType: StructType = StructType(
    Seq(
      StructField("attributes", attributesType),
      StructField("startTimeUnixNano", StringType),
      StructField("timeUnixNano", StringType),
      StructField("count", StringType),
      StructField("sum", DoubleType),
      StructField("scale", StringType),
      StructField("zeroCount", StringType),
      StructField("positive", expHistogramBucketsType),
      StructField("negative", expHistogramBucketsType),
      StructField("min", DoubleType),
      StructField("max", DoubleType),
      StructField("flags", StringType)
    ))

  val summaryDataPointType: StructType = StructType(
    Seq(
      StructField("attributes", attributesType),
      StructField("startTimeUnixNano", StringType),
      StructField("timeUnixNano", StringType),
      StructField("count", StringType),
      StructField("sum", DoubleType),
      StructField(
        "quantileValues",
        ArrayType(StructType(Seq(
          StructField("quantile", DoubleType),
          StructField("value", DoubleType))))),
      StructField("flags", StringType)
    ))

  val metricType: StructType = StructType(
    Seq(
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("unit", StringType),
      StructField(
        "gauge",
        StructType(Seq(StructField("dataPoints", ArrayType(numberDataPointType))))),
      StructField(
        "sum",
        StructType(Seq(
          StructField("dataPoints", ArrayType(numberDataPointType)),
          StructField("aggregationTemporality", StringType),
          StructField("isMonotonic", BooleanType)))),
      StructField(
        "histogram",
        StructType(Seq(
          StructField("dataPoints", ArrayType(histogramDataPointType)),
          StructField("aggregationTemporality", StringType)))),
      StructField(
        "exponentialHistogram",
        StructType(Seq(
          StructField("dataPoints", ArrayType(expHistogramDataPointType)),
          StructField("aggregationTemporality", StringType)))),
      StructField(
        "summary",
        StructType(Seq(StructField("dataPoints", ArrayType(summaryDataPointType)))))
    ))

  val metricsRequestType: StructType = StructType(
    Seq(
      StructField(
        "resourceMetrics",
        ArrayType(StructType(Seq(
          StructField("resource", resourceType),
          StructField(
            "scopeMetrics",
            ArrayType(StructType(Seq(
              StructField("scope", scopeType),
              StructField("metrics", ArrayType(metricType)),
              StructField("schemaUrl", StringType))))),
          StructField("schemaUrl", StringType)
        ))))))

  // ---- output: flat tables (golden contract) -----------------------------

  /** otel_logs, 19 cols (testdata/parquet/logs.parquet, v1.1.0). */
  val otelLogs: StructType = StructType(
    Seq(
      StructField("Timestamp", TimestampType, nullable = false),
      StructField("TraceId", BinaryType, nullable = false),
      StructField("SpanId", BinaryType, nullable = false),
      StructField("ServiceName", StringType, nullable = false),
      StructField("ServiceNamespace", StringType),
      StructField("ServiceInstanceId", StringType),
      StructField("ResourceAttributes", StringType, nullable = false),
      StructField("ResourceSchemaUrl", StringType),
      StructField("ScopeName", StringType, nullable = false),
      StructField("ScopeVersion", StringType),
      StructField("ScopeAttributes", StringType, nullable = false),
      StructField("ScopeSchemaUrl", StringType),
      StructField("TimestampTime", TimestampType, nullable = false),
      StructField("ObservedTimestamp", TimestampType, nullable = false),
      StructField("TraceFlags", IntegerType, nullable = false),
      StructField("SeverityText", StringType, nullable = false),
      StructField("SeverityNumber", IntegerType, nullable = false),
      StructField("Body", StringType),
      StructField("LogAttributes", StringType, nullable = false)
    ))

  /** otel_traces, 22 cols (testdata/parquet/traces.parquet, v1.0.0). */
  val otelTraces: StructType = StructType(
    Seq(
      StructField("Timestamp", TimestampType, nullable = false),
      StructField("TraceId", StringType, nullable = false),
      StructField("SpanId", StringType, nullable = false),
      StructField("ServiceName", StringType),
      StructField("ResourceAttributes", StringType, nullable = false),
      StructField("ScopeName", StringType),
      StructField("ScopeVersion", StringType),
      StructField("ParentSpanId", StringType),
      StructField("TraceState", StringType),
      StructField("SpanName", StringType, nullable = false),
      StructField("SpanKind", StringType, nullable = false),
      StructField("SpanAttributes", StringType, nullable = false),
      StructField("Duration", LongType, nullable = false),
      StructField("StatusCode", StringType),
      StructField("StatusMessage", StringType),
      StructField("EventsTimestamp", ArrayType(TimestampType, containsNull = false), nullable = false),
      StructField("EventsName", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("EventsAttributes", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("LinksTraceId", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("LinksSpanId", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("LinksTraceState", ArrayType(StringType, containsNull = true), nullable = false),
      StructField("LinksAttributes", ArrayType(StringType, containsNull = false), nullable = false)
    ))

  private val metricsShared = Seq(
    StructField("Timestamp", TimestampType, nullable = false),
    StructField("ServiceName", StringType, nullable = false),
    StructField("ResourceAttributes", StringType, nullable = false),
    StructField("ScopeName", StringType),
    StructField("ScopeVersion", StringType),
    StructField("MetricName", StringType, nullable = false),
    StructField("MetricDescription", StringType),
    StructField("MetricUnit", StringType),
    StructField("Attributes", StringType, nullable = false)
  )

  val otelMetricsGauge: StructType = StructType(
    metricsShared :+ StructField("Value", DoubleType, nullable = false))

  val otelMetricsSum: StructType = StructType(
    metricsShared ++ Seq(
      StructField("Value", DoubleType, nullable = false),
      StructField("AggregationTemporality", IntegerType, nullable = false),
      StructField("IsMonotonic", BooleanType, nullable = false)))

  val otelMetricsHistogram: StructType = StructType(
    metricsShared ++ Seq(
      StructField("Count", LongType, nullable = false),
      StructField("Sum", DoubleType, nullable = false),
      StructField("BucketCounts", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("ExplicitBounds", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("Min", DoubleType),
      StructField("Max", DoubleType)))

  val otelMetricsExpHistogram: StructType = StructType(
    metricsShared ++ Seq(
      StructField("Count", LongType, nullable = false),
      StructField("Sum", DoubleType, nullable = false),
      StructField("Scale", IntegerType, nullable = false),
      StructField("ZeroCount", LongType, nullable = false),
      StructField("PositiveOffset", IntegerType, nullable = false),
      StructField("PositiveBucketCounts", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("NegativeOffset", IntegerType, nullable = false),
      StructField("NegativeBucketCounts", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("Min", DoubleType),
      StructField("Max", DoubleType)))

  val otelMetricsSummary: StructType = StructType(
    metricsShared ++ Seq(
      StructField("Count", LongType, nullable = false),
      StructField("Sum", DoubleType, nullable = false),
      StructField("QuantileValues", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("QuantileQuantiles", ArrayType(DoubleType, containsNull = false), nullable = false)))
}
