package graft

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Runtime telemetry counters, named after the reference's metric set
  * (/root/reference/src/handlers.rs:81,102-103,146,189,600-603,682-687).
  *
  * Spark `LongAccumulator`s are the engine-native distributed counter:
  * executors increment from any task, the driver reads the merged value,
  * and named accumulators surface in the Spark UI per stage — the same
  * operational role the reference's `metrics` crate counters play. The
  * reference's two histograms (`otlp.ingest.bytes`, `otlp.ingest.latency_ms`)
  * are carried as totals here; pair with `otlp.ingest.requests` for means.
  * Cardinality is fixed (8 counters), so this costs nothing at 100 TB —
  * accumulator merges ride the existing task-completion heartbeats.
  *
  * One instance per pipeline run. Accumulator updates from failed tasks are
  * dropped by Spark, so reject accounting on the fail-fast batch path happens
  * driver-side (see [[Ingest.run]]); the streaming path increments from
  * successful tasks (skip-and-count semantics).
  */
final class Telemetry(sc: SparkContext) {
  import Telemetry._

  val ingestRequests: LongAccumulator = sc.longAccumulator(IngestRequests)
  val ingestRecords: LongAccumulator = sc.longAccumulator(IngestRecords)
  val ingestRejected: LongAccumulator = sc.longAccumulator(IngestRejected)
  val ingestBytes: LongAccumulator = sc.longAccumulator(IngestBytes)
  val ingestLatencyMs: LongAccumulator = sc.longAccumulator(IngestLatencyMs)
  val batchFlushes: LongAccumulator = sc.longAccumulator(BatchFlushes)
  val tracesFlushes: LongAccumulator = sc.longAccumulator(TracesFlushes)
  val metricsFlushes: LongAccumulator = sc.longAccumulator(MetricsFlushes)

  /** Driver-side read of all counters, keyed by the reference's names. */
  def snapshot: Map[String, Long] = Map(
    IngestRequests -> ingestRequests.value,
    IngestRecords -> ingestRecords.value,
    IngestRejected -> ingestRejected.value,
    IngestBytes -> ingestBytes.value,
    IngestLatencyMs -> ingestLatencyMs.value,
    BatchFlushes -> batchFlushes.value,
    TracesFlushes -> tracesFlushes.value,
    MetricsFlushes -> metricsFlushes.value)

  /** One-line JSON for the ingest summary (sorted keys, stable output). */
  def summaryJson: String = snapshot.toSeq.sortBy(_._1)
    .map { case (k, v) => s""""$k":$v""" }
    .mkString("{", ",", "}")
}

object Telemetry {
  // Names match the reference's counter/histogram identifiers exactly.
  val IngestRequests = "otlp.ingest.requests"
  val IngestRecords = "otlp.ingest.records"
  val IngestRejected = "otlp.ingest.rejected"
  val IngestBytes = "otlp.ingest.bytes"
  val IngestLatencyMs = "otlp.ingest.latency_ms"
  val BatchFlushes = "otlp.batch.flushes"
  val TracesFlushes = "otlp.traces.flushes"
  val MetricsFlushes = "otlp.metrics.flushes"
}
