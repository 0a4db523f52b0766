package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.OtlpCodecs._
import graft.transform.OtlpUdfs._

/** OTLP → flat-table flatten transforms (pure `DataFrame => DataFrame`).
  *
  * Input: a DataFrame of parsed OTLP envelopes (one row per
  * Export*ServiceRequest) with the nested schemas of
  * [[graft.schema.OtlpSchemas]]. Output: the reference's flat tables,
  * column-for-column (golden contract
  * /root/reference/testdata/parquet goldens; SURVEY §1.2-1.3).
  *
  * Scale notes: the whole flatten is a narrow map (explode + projections) —
  * no shuffle is introduced; parallelism follows the input file splits. The
  * only black-box expressions are the JSON-canonicalization / id UDFs in
  * [[OtlpUdfs]]; all structural work (explode, transform, filter) stays in
  * whole-stage codegen.
  */
object Otlp {

  /** otel_logs: resourceLogs[] → scopeLogs[] → logRecords[] → 19 columns.
    * Ref: otlp2records transform_logs via /root/reference/src/codec.rs:34-40. */
  def logs(raw: DataFrame): DataFrame = {
    val exploded = raw
      .select(explode(col("resourceLogs")).as("rl"))
      .select(col("rl.resource").as("resource"),
        col("rl.schemaUrl").as("resourceSchemaUrl"),
        explode(col("rl.scopeLogs")).as("sl"))
      .select(col("resource"), col("resourceSchemaUrl"),
        col("sl.scope").as("scope"), col("sl.schemaUrl").as("scopeSchemaUrl"),
        explode(col("sl.logRecords")).as("lr"))

    val rattrs = col("resource.attributes")
    val ts = nanosToTimestamp(col("lr.timeUnixNano"))
    exploded.select(
      ts.as("Timestamp"),
      idBytes16(col("lr.traceId")).as("TraceId"),
      idBytes8(col("lr.spanId")).as("SpanId"),
      coalesce(attrValue(rattrs, "service.name"), lit("")).as("ServiceName"),
      attrValue(rattrs, "service.namespace").as("ServiceNamespace"),
      attrValue(rattrs, "service.instance.id").as("ServiceInstanceId"),
      attrsJsonNoService(rattrs).as("ResourceAttributes"),
      col("resourceSchemaUrl").as("ResourceSchemaUrl"),
      coalesce(col("scope.name"), lit("")).as("ScopeName"),
      col("scope.version").as("ScopeVersion"),
      attrsJson(col("scope.attributes")).as("ScopeAttributes"),
      col("scopeSchemaUrl").as("ScopeSchemaUrl"),
      ts.as("TimestampTime"),
      nanosToTimestamp(col("lr.observedTimeUnixNano")).as("ObservedTimestamp"),
      coalesce(col("lr.flags").cast("int"), lit(0)).as("TraceFlags"),
      coalesce(col("lr.severityText"), lit("")).as("SeverityText"),
      severityToInt(col("lr.severityNumber")).as("SeverityNumber"),
      anyValueJson(col("lr.body")).as("Body"),
      attrsJson(col("lr.attributes")).as("LogAttributes")
    )
  }

  /** otel_traces: resourceSpans[] → scopeSpans[] → spans[] → 22 columns;
    * events/links stay as parallel arrays in-row (SURVEY §1.2). */
  def traces(raw: DataFrame): DataFrame = {
    val exploded = raw
      .select(explode(col("resourceSpans")).as("rs"))
      .select(col("rs.resource").as("resource"),
        explode(col("rs.scopeSpans")).as("ss"))
      .select(col("resource"), col("ss.scope").as("scope"),
        explode(col("ss.spans")).as("span"))

    val rattrs = col("resource.attributes")
    import org.apache.spark.sql.types.ArrayType
    import graft.schema.OtlpSchemas
    val events = coalesce(col("span.events"),
      array().cast(ArrayType(OtlpSchemas.spanEventType)))
    val links = coalesce(col("span.links"),
      array().cast(ArrayType(OtlpSchemas.spanLinkType)))

    exploded.select(
      nanosToTimestamp(col("span.startTimeUnixNano")).as("Timestamp"),
      idHex16(col("span.traceId")).as("TraceId"),
      idHex8(col("span.spanId")).as("SpanId"),
      attrValue(rattrs, "service.name").as("ServiceName"),
      attrsJsonNoService(rattrs).as("ResourceAttributes"),
      col("scope.name").as("ScopeName"),
      col("scope.version").as("ScopeVersion"),
      idHex8OrNull(col("span.parentSpanId")).as("ParentSpanId"),
      col("span.traceState").as("TraceState"),
      coalesce(col("span.name"), lit("")).as("SpanName"),
      spanKindToName(col("span.kind")).as("SpanKind"),
      attrsJson(col("span.attributes")).as("SpanAttributes"),
      (col("span.endTimeUnixNano").cast("decimal(24,0)") -
        col("span.startTimeUnixNano").cast("decimal(24,0)"))
        .cast("long").as("Duration"),
      statusCodeToName(col("span.status.code")).as("StatusCode"),
      when(col("span.status.message") === "", lit(null))
        .otherwise(col("span.status.message")).as("StatusMessage"),
      transform(events, e => nanosToTimestamp(e("timeUnixNano"))).as("EventsTimestamp"),
      transform(events, e => coalesce(e("name"), lit(""))).as("EventsName"),
      nestedAttrsJson(events).as("EventsAttributes"),
      linkIdsHex(links, 16).as("LinksTraceId"),
      linkIdsHex(links, 8).as("LinksSpanId"),
      transform(links, l => l("traceState")).as("LinksTraceState"),
      nestedAttrsJson(links).as("LinksAttributes")
    )
  }

  /** One DataFrame per metric kind + skipped-value counts (SURVEY §1.2-1.3(6)).
    * `summary` is produced but the writer drops it, matching
    * /root/reference/src/handlers.rs:629-642. */
  final case class PartitionedMetrics(
      gauge: DataFrame,
      sum: DataFrame,
      histogram: DataFrame,
      expHistogram: DataFrame,
      summary: DataFrame,
      /** columns: category (summaries|nan_values|infinity_values|missing_values), n */
      skipped: DataFrame)

  /** Flatten to (resource, scope, metric) level once; kinds branch from it. */
  private def metricLevel(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("resourceMetrics")).as("rm"))
      .select(col("rm.resource").as("resource"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("resource"), col("sm.scope").as("scope"),
        explode(col("sm.metrics")).as("m"))

  /** The 9 shared columns; metrics keep service.name inside
    * ResourceAttributes (asymmetry vs logs/traces — SURVEY §1.3(2)). */
  private def sharedCols(dpTime: org.apache.spark.sql.Column) = Seq(
    nanosToTimestamp(dpTime).as("Timestamp"),
    coalesce(attrValue(col("resource.attributes"), "service.name"), lit(""))
      .as("ServiceName"),
    attrsJson(col("resource.attributes")).as("ResourceAttributes"),
    col("scope.name").as("ScopeName"),
    col("scope.version").as("ScopeVersion"),
    coalesce(col("m.name"), lit("")).as("MetricName"),
    col("m.description").as("MetricDescription"),
    col("m.unit").as("MetricUnit"),
    attrsJson(col("dp.attributes")).as("Attributes")
  )

  private def longArray(c: org.apache.spark.sql.Column) =
    coalesce(transform(c, x => x.cast("long")), array().cast("array<bigint>"))
  private def doubleArray(c: org.apache.spark.sql.Column) =
    coalesce(c, array().cast("array<double>"))

  def metrics(raw: DataFrame): PartitionedMetrics = {
    val ml = metricLevel(raw).cache()

    // number points (gauge/sum) with value-validity classification
    def numberPoints(kind: String): DataFrame =
      ml.filter(col(s"m.$kind").isNotNull)
        .select(col("resource"), col("scope"), col("m"),
          explode(col(s"m.$kind.dataPoints")).as("dp"))
        .withColumn("_value", coalesce(col("dp.asDouble"), col("dp.asInt").cast("double")))

    def valid(df: DataFrame): DataFrame =
      df.filter(col("_value").isNotNull && !isnan(col("_value")) &&
        col("_value") =!= Double.PositiveInfinity &&
        col("_value") =!= Double.NegativeInfinity)

    val gaugePoints = numberPoints("gauge")
    val sumPoints = numberPoints("sum")

    val gauge = valid(gaugePoints).select(
      sharedCols(col("dp.timeUnixNano")) :+ col("_value").as("Value"): _*)

    val sum = valid(sumPoints).select(
      sharedCols(col("dp.timeUnixNano")) ++ Seq(
        col("_value").as("Value"),
        temporalityToInt(col("m.sum.aggregationTemporality"))
          .as("AggregationTemporality"),
        coalesce(col("m.sum.isMonotonic"), lit(false)).as("IsMonotonic")): _*)

    val histogram = ml
      .filter(col("m.histogram").isNotNull)
      .select(col("resource"), col("scope"), col("m"),
        explode(col("m.histogram.dataPoints")).as("dp"))
      .select(sharedCols(col("dp.timeUnixNano")) ++ Seq(
        coalesce(col("dp.count").cast("long"), lit(0L)).as("Count"),
        coalesce(col("dp.sum"), lit(0.0)).as("Sum"),
        longArray(col("dp.bucketCounts")).as("BucketCounts"),
        doubleArray(col("dp.explicitBounds")).as("ExplicitBounds"),
        col("dp.min").as("Min"),
        col("dp.max").as("Max")): _*)

    val expHistogram = ml
      .filter(col("m.exponentialHistogram").isNotNull)
      .select(col("resource"), col("scope"), col("m"),
        explode(col("m.exponentialHistogram.dataPoints")).as("dp"))
      .select(sharedCols(col("dp.timeUnixNano")) ++ Seq(
        coalesce(col("dp.count").cast("long"), lit(0L)).as("Count"),
        coalesce(col("dp.sum"), lit(0.0)).as("Sum"),
        coalesce(col("dp.scale").cast("int"), lit(0)).as("Scale"),
        coalesce(col("dp.zeroCount").cast("long"), lit(0L)).as("ZeroCount"),
        coalesce(col("dp.positive.offset").cast("int"), lit(0)).as("PositiveOffset"),
        longArray(col("dp.positive.bucketCounts")).as("PositiveBucketCounts"),
        coalesce(col("dp.negative.offset").cast("int"), lit(0)).as("NegativeOffset"),
        longArray(col("dp.negative.bucketCounts")).as("NegativeBucketCounts"),
        col("dp.min").as("Min"),
        col("dp.max").as("Max")): _*)

    val summary = ml
      .filter(col("m.summary").isNotNull)
      .select(col("resource"), col("scope"), col("m"),
        explode(col("m.summary.dataPoints")).as("dp"))
      .select(sharedCols(col("dp.timeUnixNano")) ++ Seq(
        coalesce(col("dp.count").cast("long"), lit(0L)).as("Count"),
        coalesce(col("dp.sum"), lit(0.0)).as("Sum"),
        // proto3 JSON omits zero values → absent quantile/value means 0.0
        coalesce(transform(col("dp.quantileValues"), q => coalesce(q("value"), lit(0.0))),
          array().cast("array<double>")).as("QuantileValues"),
        coalesce(transform(col("dp.quantileValues"), q => coalesce(q("quantile"), lit(0.0))),
          array().cast("array<double>")).as("QuantileQuantiles")): _*)

    // skipped-value accounting (src/codec.rs:15-26): summaries + invalid numbers
    val numberAll = gaugePoints.select(col("_value"))
      .unionAll(sumPoints.select(col("_value")))
    val skipped = numberAll
      .select(
        when(col("_value").isNull, "missing_values")
          .when(isnan(col("_value")), "nan_values")
          .when(col("_value") === Double.PositiveInfinity ||
            col("_value") === Double.NegativeInfinity, "infinity_values")
          .as("category"))
      .filter(col("category").isNotNull)
      .unionAll(summary.select(lit("summaries").as("category")))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))

    PartitionedMetrics(gauge, sum, histogram, expHistogram, summary, skipped)
  }
}
