package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.io.{OtelWrite, OtlpRead}
import graft.transform.Otlp

/** Streaming ingest: the Spark-native form of the reference's hand-rolled
  * micro-batcher (SURVEY §2.3).
  *
  * The reference buffers rows keyed by (service, event-minute) and flushes on
  * `rows ≥ 200k ∨ bytes ≥ 128 MiB ∨ age ≥ 10 s`
  * (/root/reference/src/batch/mod.rs:24-44,
  * /root/reference/src/batch/buffered_batch.rs:55-59, defaults
  * /root/reference/src/config/mod.rs:53-62). In Structured Streaming those
  * map to engine features instead of custom state:
  *
  *   - age threshold   → `Trigger.ProcessingTime(10s)` micro-batches
  *   - row threshold   → `maxRecordsPerFile` on the parquet sink
  *   - per-service dir → `partitionBy` (dynamic partition write)
  *   - backpressure    → `maxFilesPerTrigger` source rate limit
  *     (the reference rejects ingest at 8 × max_bytes pending;
  *     a pull-based source throttles instead of rejecting)
  *   - graceful drain  → `query.stop()` finishes the in-flight batch
  *
  * Note the deliberate parity quirk: the reference keys buffers by
  * *event-time* minute but expires them by *processing-time* age — no
  * watermark semantics. The direct sink pipeline reproduces exactly that
  * (processing-time micro-batches, no watermark); [[ServiceBatcher]] shows
  * the same predicate as explicit `flatMapGroupsWithState` state for
  * consumers that need flush *events*.
  */
object OtlpStream {

  /** Landing-dir JSONL stream → flat table → partitioned parquet sink.
    * One lazy plan per micro-batch; no shuffle (flatten is narrow, the sink
    * partitions by column values within each task). */
  def logsToParquet(spark: SparkSession, inputDir: String, outputRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxRecordsPerFile: Long = 200000L,
      maxFilesPerTrigger: Int = 1000,
      footerStamp: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(OtlpSchemas.logs)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("mode", "FAILFAST") // corrupt JSONL must fail the batch (reference 400s), not become silent all-null rows
      .json(inputDir)
    val flat = Otlp.logs(raw)
    if (footerStamp)
      stampedSink(flat, checkpointDir, trigger, outputRoot, "otel_logs",
        maxRecordsPerFile)
    else OtelWrite.withPartitionColumns(flat).writeStream
      .format("parquet")
      .option("path", s"$outputRoot/otel_logs")
      .option("checkpointLocation", checkpointDir)
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("service", "year", "month", "day", "hour")
      .trigger(trigger)
      .start()
  }

  /** The stamped streaming sink: `foreachBatch` write + footer stamp of the
    * partition dirs this micro-batch touched, so the streaming path honors
    * `writer.footer_stamp` exactly like batch [[graft.Ingest]] does — the
    * reference has ONE write contract for both paths
    * (/root/reference/src/writer/write.rs:93-130). Delivery is EXACTLY-ONCE
    * across restarts, like the default file sink's metadata log: each
    * micro-batch goes through [[graft.io.BatchPublish]]'s batchId-keyed
    * stage → deterministic-rename → commit-marker protocol, so a replayed
    * batch either skips (marker present) or overwrites its own files.
    * Stamp work is bounded per batch: only the batch's own partition dirs
    * are touched, and files already stamped by earlier batches are skipped
    * after a footer-only read ([[graft.io.FooterStamp.stampFile]]). */
  private def stampedSink(flat: DataFrame, checkpointDir: String,
      trigger: Trigger, outputRoot: String, tableDir: String,
      maxRecordsPerFile: Long): StreamingQuery =
    flat.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.io.BatchPublish.publish(batch, outputRoot, tableDir, batchId,
          maxRecordsPerFile, stamp = true)
        ()
      }
      .trigger(trigger)
      .start()

  /** Config-driven overloads: every stream knob (trigger interval,
    * maxRecordsPerFile, pull-throttle, payload limit) comes from the
    * resolved [[graft.Config]] chain (env > file > defaults) — the
    * reference's RuntimeConfig role: operators tune a deployment without
    * code changes. */
  def logsToParquet(spark: SparkSession, inputDir: String, outputRoot: String,
      checkpointDir: String, cfg: graft.Config.GraftConfig): StreamingQuery =
    logsToParquet(spark, inputDir, outputRoot, checkpointDir,
      Trigger.ProcessingTime(s"${cfg.writer.triggerIntervalSecs} seconds"),
      cfg.writer.maxRecordsPerFile, cfg.writer.maxFilesPerTrigger,
      cfg.writer.footerStamp)

  def logsProtobufToParquet(spark: SparkSession, inputDir: String,
      outputRoot: String, checkpointDir: String,
      cfg: graft.Config.GraftConfig): StreamingQuery =
    logsProtobufToParquet(spark, inputDir, outputRoot, checkpointDir,
      Trigger.ProcessingTime(s"${cfg.writer.triggerIntervalSecs} seconds"),
      cfg.writer.maxRecordsPerFile, cfg.request.maxPayloadBytes,
      cfg.writer.maxFilesPerTrigger, footerStamp = cfg.writer.footerStamp)

  /** Landing-dir JSONL trace stream → flat span table → partitioned parquet.
    * Same pipeline shape as [[logsToParquet]] (narrow flatten, dynamic
    * partition sink). */
  def tracesToParquet(spark: SparkSession, inputDir: String, outputRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxRecordsPerFile: Long = 200000L,
      maxFilesPerTrigger: Int = 1000,
      footerStamp: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(OtlpSchemas.traces)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("mode", "FAILFAST")
      .json(inputDir)
    val flat = Otlp.traces(raw)
    if (footerStamp)
      stampedSink(flat, checkpointDir, trigger, outputRoot, "otel_traces",
        maxRecordsPerFile)
    else OtelWrite.withPartitionColumns(flat).writeStream
      .format("parquet")
      .option("path", s"$outputRoot/otel_traces")
      .option("checkpointLocation", checkpointDir)
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("service", "year", "month", "day", "hour")
      .trigger(trigger)
      .start()
  }

  /** Landing-dir JSONL metric stream → four persisted kind tables (summary
    * dropped — reference parity). The per-kind fan-out needs `foreachBatch`:
    * one parquet sink can write one table, but the reference runs four
    * independent batchers (/root/reference/src/lib.rs:197-202), so each
    * micro-batch routes its datapoints to all four partitioned tables.
    * Delivery is EXACTLY-ONCE across restarts, per table: each kind's
    * batch goes through [[graft.io.BatchPublish]]'s batchId-keyed marker
    * protocol, so a replayed batch skips the kinds a crashed attempt had
    * fully committed and deterministically overwrites the rest. */
  def metricsToParquet(spark: SparkSession, inputDir: String, outputRoot: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxFilesPerTrigger: Int = 1000,
      footerStamp: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(OtlpSchemas.metrics)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("mode", "FAILFAST")
      .json(inputDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the four kind writes each derive from this micro-batch;
        // without the cache every write job would re-read and re-flatten
        // the batch's files (4× the scan on the streaming hot path)
        batch.persist()
        try {
          val pm = Otlp.metrics(batch)
          Seq("otel_metrics_gauge" -> pm.gauge,
            "otel_metrics_sum" -> pm.sum,
            "otel_metrics_histogram" -> pm.histogram,
            "otel_metrics_exponential_histogram" -> pm.expHistogram)
            .foreach { case (table, df) =>
              graft.io.BatchPublish.publish(df, outputRoot, table, batchId,
                stamp = footerStamp)
            }
          // summary intentionally not persisted (reference drops it)
        } finally batch.unpersist()
      }
      .trigger(trigger)
      .start()
  }

  /** Landing-dir protobuf stream (one OTLP request payload per file, the
    * shape an HTTP front writes) → flat log table → partitioned parquet.
    * The binaryFile source streams new files; each micro-batch decodes with
    * the same wire decoder as the batch path.
    *
    * Oversized AND malformed payloads are SKIPPED rather than failing the
    * query: the reference 413s/400s the single request and keeps serving —
    * in a checkpointed stream any throw would replay the same poison file
    * forever. (The batch path keeps fail-fast 413/400 parity.) Skips are
    * counted in the `otlp.ingest.rejected` accumulator (the reference's
    * rejected counter, visible on the driver / Spark UI) and logged
    * executor-side. */
  def logsProtobufToParquet(spark: SparkSession, inputDir: String,
      outputRoot: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxRecordsPerFile: Long = 200000L,
      maxPayloadBytes: Long = 8L * 1024 * 1024,
      maxFilesPerTrigger: Int = 1000,
      telemetry: Option[graft.Telemetry] = None,
      footerStamp: Boolean = false): StreamingQuery = {
    import org.apache.spark.sql.{Encoders, Row}
    // the external-Row decode form: this path needs per-payload skip/count
    // semantics (a flatMap with accumulators), which keeps it on the
    // encoder route — the batch reader uses the InternalRow-native
    // PbDecodeExpr instead
    val parse: Array[Byte] => Row = graft.io.OtlpProtobuf.parseLogsRequestRow
    val limit = maxPayloadBytes
    // capture bare accumulators, not the Telemetry instance — it holds the
    // (non-serializable) SparkContext and this closure ships to executors.
    // NOTE: transformation-side accumulator updates are AT-LEAST-ONCE —
    // stage retries / speculative tasks / checkpoint-recovery replay can
    // re-count a payload (the Spark accumulator contract). Operationally
    // equivalent to the reference's counters under client retries; the
    // batch path (Ingest.run) does its accounting driver-side and stays
    // exactly-once.
    val tel = telemetry.getOrElse(new graft.Telemetry(spark.sparkContext))
    val rejected = tel.ingestRejected
    val requests = tel.ingestRequests
    val bytesTotal = tel.ingestBytes
    val guarded: Array[Byte] => IterableOnce[Row] = { bytes =>
      requests.add(1L)
      bytesTotal.add(bytes.length.toLong)
      if (bytes.length > limit) {
        rejected.add(1L)
        System.err.println(
          s"[otlp-stream] skipping payload of ${bytes.length} bytes > max $limit (reference 413)")
        None
      } else {
        try Some(parse(bytes))
        catch {
          case e: Exception =>
            rejected.add(1L)
            System.err.println(s"[otlp-stream] skipping malformed payload (reference 400): $e")
            None
        }
      }
    }
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(inputDir)
      .select("content")
      .as(Encoders.BINARY)
      .flatMap(guarded)(Encoders.row(graft.schema.OtlpSchemas.logsRequestType))
    val flat = Otlp.logs(raw.toDF())
    if (footerStamp)
      stampedSink(flat, checkpointDir, trigger, outputRoot, "otel_logs",
        maxRecordsPerFile)
    else OtelWrite.withPartitionColumns(flat).writeStream
      .format("parquet")
      .option("path", s"$outputRoot/otel_logs")
      .option("checkpointLocation", checkpointDir)
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("service", "year", "month", "day", "hour")
      .trigger(trigger)
      .start()
  }

  private object OtlpSchemas {
    val logs = graft.schema.OtlpSchemas.logsRequestType
    val traces = graft.schema.OtlpSchemas.tracesRequestType
    val metrics = graft.schema.OtlpSchemas.metricsRequestType
  }

  // ---- explicit keyed batcher (flush-event semantics) ----------------------

  /** A buffered record for the explicit batcher. */
  final case class Record(service: String, minuteBucket: Long, payloadBytes: Long)

  /** Flush event, mirroring the reference's CompletedBatch metadata
    * (rows, bytes, min bucket, flush reason). */
  final case class Flush(service: String, rows: Long, bytes: Long,
      minMinuteBucket: Long, reason: String)

  /** Buffer accumulator (public: the state encoder's generated code must be
    * able to construct it). `deadlineMs` is the processing-time instant at
    * which the buffer expires — fixed at buffer creation, like the
    * reference's age-since-batch-creation expiry
    * (/root/reference/src/batch/buffered_batch.rs:55-59).
    *
    * NOTE: adding `deadlineMs` changed the flatMapGroupsWithState state
    * schema — a checkpoint written by the earlier 3-field BufState cannot be
    * restored (Spark fails the schema-compatibility check); drain the old
    * query before upgrading. */
  final case class BufState(rows: Long, bytes: Long, minBucket: Long, deadlineMs: Long)

  /** Keyed micro-batching with the reference's exact flush predicate:
    * rows ≥ maxRows ∨ bytes ≥ maxBytes ∨ processing-time age ≥ maxAgeMs.
    * State lives per service key (the shuffle key); the timeout is
    * processing-time, not event-time — parity with the reference's
    * background flusher (/root/reference/src/lib.rs:362-403).
    *
    * Reject-style backpressure (/root/reference/src/batch/mod.rs:181-194):
    * a record whose arrival would push buffered bytes past
    * `max(8×maxBytes, maxBytes)` (or the explicit `maxPendingBytes`) is
    * DROPPED and counted in `rejected` instead of buffered — the buffer
    * stays bounded even if downstream writes stall. The reference bounds a
    * process-global total behind one mutex; here the bound is per service
    * key, because keyed state IS the distributed unit — a global counter
    * would serialize every executor through one lock, which is exactly what
    * cannot scale to a 1000-executor cluster. Per-key 8×maxBytes gives the
    * same bounded-pending guarantee per shuffle partition, and total state
    * is bounded by (#active services × limit) regardless of input rate.
    * The reference bails the whole request; a checkpointed stream must not
    * throw (the poison record would replay forever), so skip+count is the
    * stream-side parity, same as the oversized-payload guard above.
    *
    * Reachability note: this batcher flushes SYNCHRONOUSLY inside the
    * state function, so under the default 8×maxBytes derivation the guard
    * only fires for a single record larger than ~7×maxBytes — buffered
    * bytes reset at each flush and cannot creep toward the limit the way
    * the reference's async-writer pending total can. The guard earns its
    * keep when `maxPendingBytes` is configured below maxBytes (an
    * operational cap on per-key state) and as the contract for any future
    * async sink; the reject accounting and semantics are identical either
    * way. */
  def serviceBatcher(records: Dataset[Record], maxRows: Long = 200000L,
      maxBytes: Long = 128L * 1024 * 1024,
      maxAgeMs: Long = 10000L,
      maxPendingBytes: Long = 0L,
      rejected: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Flush] = {
    import records.sparkSession.implicits._
    // reference derivation: max_bytes.saturating_mul(8).max(max_bytes)
    val pendingLimit =
      if (maxPendingBytes > 0L) maxPendingBytes
      else if (maxBytes > Long.MaxValue / 8L) Long.MaxValue
      else math.max(maxBytes * 8L, maxBytes)
    records
      .groupByKey(_.service)
      .flatMapGroupsWithState[BufState, Flush](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout) {
        (service: String, it: Iterator[Record], state: GroupState[BufState]) =>
          if (state.hasTimedOut) {
            // batch-expire: background flush of an aged buffer
            val s = state.get
            state.remove()
            Iterator.single(Flush(service, s.rows, s.bytes, s.minBucket, "age"))
          } else {
            val now = state.getCurrentProcessingTimeMs()
            var s = state.getOption.getOrElse(BufState(0L, 0L, Long.MaxValue, now + maxAgeMs))
            val flushes = scala.collection.mutable.ListBuffer.empty[Flush]
            it.foreach { r =>
              // prospective-total check BEFORE buffering, like the reference
              if (s.bytes + r.payloadBytes > pendingLimit) {
                rejected.foreach(_.add(1L))
                System.err.println(s"[otlp-stream] backpressure: buffered " +
                  s"${s.bytes} + ${r.payloadBytes} bytes for '$service' exceeds " +
                  s"limit $pendingLimit — record dropped (reference reject)")
              } else {
              s = BufState(s.rows + 1, s.bytes + r.payloadBytes,
                math.min(s.minBucket, r.minuteBucket), s.deadlineMs)
              if (s.rows >= maxRows || s.bytes >= maxBytes) {
                val reason = if (s.rows >= maxRows) "rows" else "bytes"
                flushes += Flush(service, s.rows, s.bytes, s.minBucket, reason)
                s = BufState(0L, 0L, Long.MaxValue, now + maxAgeMs) // fresh buffer, fresh age clock
              }
              }
            }
            if (s.rows > 0) {
              state.update(s)
              // age is measured from buffer CREATION: re-register the timeout
              // as the remaining time to the stored deadline, not a fresh
              // maxAgeMs — a key trickling records must still expire.
              state.setTimeoutDuration(math.max(1L, s.deadlineMs - now))
            } else state.remove()
            flushes.iterator
          }
      }
  }

  /** EXTENSION beyond the reference (flagged per SURVEY §7.4#4): the
    * reference has no event-time semantics — it keys by event-minute but
    * expires by processing-time. This operator adds proper event-time
    * tumbling-window aggregation with a watermark for late data: per
    * (service, severity, 1-min window) log counts, emitted once the
    * watermark passes the window end. State is bounded by the watermark —
    * the requirement for unbounded-stream aggregation at fleet scale. */
  def logCountsByWindow(flatLogs: DataFrame,
      windowLength: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    flatLogs
      .withWatermark("Timestamp", watermarkDelay)
      .groupBy(window(col("Timestamp"), windowLength),
        col("ServiceName"), col("SeverityText"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("ServiceName"), col("SeverityText"), col("n"))

  /** EXTENSION (like [[logCountsByWindow]]): event-time streaming
    * deduplication — emit each distinct key once, with state bounded by the
    * watermark. `dropDuplicatesWithinWatermark` keeps a key's state only
    * until the watermark passes `eventTime + delay`, so a key re-arriving
    * within the window is suppressed (at-least-once transport → effectively
    * exactly-once rows) while state stays O(keys-per-window) instead of
    * O(all keys ever) — the property that lets this run forever on an
    * unbounded stream. The caller projects the key columns afterward;
    * non-key columns of the retained row are whichever arrival won the
    * state race, so only the key projection is deterministic.
    *
    * `eventTimeCol` must already be a TimestampType column of `df`. */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String,
      watermarkDelay: String, keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** A session-stream input event. */
  final case class SessionEvent(user_id: Long, event_id: Long, tsUs: Long)

  /** A closed session (emitted once the gap timeout passes). */
  final case class Session(user_id: Long, n_events: Long,
      startUs: Long, endUs: Long)

  /** Session accumulator (public: the state encoder's generated code must be
    * able to construct it). */
  final case class SessState(n: Long, startUs: Long, endUs: Long)

  /** EXTENSION (like [[logCountsByWindow]], flagged per SURVEY §7.4#4):
    * event-time sessionization as managed streaming state — the streaming
    * twin of the batch `q_sessionize` query. Sessions close after `gap` of
    * event-time silence, enforced with an event-time timeout against the
    * watermark; state per user is O(1) (count + bounds), so the operator
    * survives unbounded streams — the requirement batch sessionize's global
    * window cannot meet. */
  def sessionizeStream(events: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes",
      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.n, s.startUs, s.endUs))
          } else {
            val sorted = it.map(_._3).toArray.sorted
            var s = state.getOption.getOrElse(SessState(0L, Long.MaxValue, Long.MinValue))
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            sorted.foreach { ts =>
              if (s.n > 0 && ts - s.endUs > gapUs) {
                closed += Session(user, s.n, s.startUs, s.endUs)
                s = SessState(0L, Long.MaxValue, Long.MinValue)
              }
              s = SessState(s.n + 1, math.min(s.startUs, ts), math.max(s.endUs, ts))
            }
            if (s.n > 0) {
              state.update(s)
              // close when the watermark passes session end + gap (clamped
              // ahead of the current watermark — Spark rejects stale timeouts)
              state.setTimeoutTimestamp(math.max((s.endUs + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            } else state.remove()
            closed.iterator
          }
      }
  }

  /** Input row for [[rollingAnomalyStream]]. */
  final case class AnomEvent(event_id: Long, tsUs: Long, user_id: Long,
      value: Double)

  /** Per-user rolling buffer: the last ≤window (tsUs, event_id, v_fp)
    * triples, time-ordered (public: state-encoder codegen constructs it). */
  final case class AnomState(ts: Seq[Long], ids: Seq[Long], vfp: Seq[Long])

  /** Flagged anomaly (matches the batch `q_anomaly` row shape). */
  final case class AnomFlag(event_id: Long, ts_us: Long, user_id: Long,
      value: Double, n_prev: Long)

  /** Streaming twin of the batch rolling z-score operator
    * ([[graft.operators.QuerySurface.anomalyZscore]]): per-user custom
    * state (`flatMapGroupsWithState`) carries the last ≤`window` fixed-
    * point values, each arriving event is tested with the identical
    * squared-out integer z-test — `(n·v−S)² > z²(n·Q−S²)` over BigInt, no
    * sqrt/division — and flagged rows are emitted in append mode. State
    * per user is O(window) regardless of stream length — the property the
    * batch window cannot give an unbounded stream.
    *
    * Ordering contract: events are sorted by (tsUs, event_id) WITHIN each
    * group-batch before processing, so a replay that lands in one
    * micro-batch (the gate's AvailableNow contract) reproduces the batch
    * operator exactly — same oracle. Incremental runs stay exact while
    * batches arrive time-ordered per user (the landing-dir model);
    * out-of-order arrival within a watermark would need an event-time
    * reorder buffer in front (the [[sessionizeStream]] timeout pattern) —
    * documented, not implemented. */
  def rollingAnomalyStream(events: Dataset[AnomEvent], window: Int = 20,
      minPrev: Int = 8, z: Int = 3): Dataset[AnomFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomState, AnomFlag](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[AnomEvent], state: GroupState[AnomState]) =>
          val s = state.getOption.getOrElse(AnomState(Nil, Nil, Nil))
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          s.ts.indices.foreach(i => buf += ((s.ts(i), s.ids(i), s.vfp(i))))
          val flags = scala.collection.mutable.ListBuffer.empty[AnomFlag]
          it.toArray.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            val vFp = math.floor(e.value * 1000000).toLong
            val n = BigInt(buf.length)
            if (buf.length >= minPrev) {
              val sSum = buf.iterator.map(t => BigInt(t._3)).sum
              val qSum = buf.iterator.map(t => BigInt(t._3) * t._3).sum
              val dev = n * vFp - sSum
              if (dev * dev > BigInt(z) * z * (n * qSum - sSum * sSum))
                flags += AnomFlag(e.event_id, e.tsUs, user, e.value, buf.length.toLong)
            }
            buf += ((e.tsUs, e.event_id, vFp))
            if (buf.length > window) buf.remove(0)
          }
          state.update(AnomState(buf.map(_._1).toSeq, buf.map(_._2).toSeq,
            buf.map(_._3).toSeq))
          flags.iterator
      }
  }

  /** Batch-mode compaction of an hour of landed small files into
    * maxRecordsPerFile-sized parquet — the "optimal file sizes" goal of the
    * reference's batcher applied after the fact. One shuffle keyed by the
    * partition tuple. */
  def compact(spark: SparkSession, tableDir: String, outDir: String,
      maxRecordsPerFile: Long = 200000L): Unit = {
    val df = spark.read.parquet(tableDir)
    df.repartition(col("service"), col("year"), col("month"), col("day"),
        col("hour"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("service", "year", "month", "day", "hour")
      .parquet(outDir)
  }
}
