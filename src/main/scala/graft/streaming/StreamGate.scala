package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Gate-verifiable (and bench-timed) runs of the event-time streaming
  * operators: the `events` table is REPLAYED as a bounded file stream
  * (`Trigger.AvailableNow`), pushed through [[OtlpStream.logCountsByWindow]]
  * / [[OtlpStream.sessionizeStream]], and drained to a memory sink whose
  * contents are returned as a plain DataFrame — so the streaming path gets a
  * DuckDB hash check and a perf number like every batch operator.
  *
  * Determinism (what makes a *streaming* run oracle-checkable): with
  * AvailableNow the data arrives in one batch (one input file), then Spark
  * runs a no-data micro-batch that advances the watermark to
  * `floor(max_event_time_ms) - delay` and flushes exactly the
  * windows/timeouts the watermark has passed. The emitted subset is
  * therefore a pure function of the data:
  *   - windowed counts: windows with `window_end <= watermark`;
  *   - sessions: every session closed by a later event in-batch, plus
  *     final-per-user sessions whose `end + gap` the watermark passed.
  * The DuckDB twins compute the same subsets in SQL over the same parquet.
  *
  * The memory sink is driver-local by design — these are gate probes over
  * the driver's sf tables. A production drain goes to the parquet sink
  * ([[OtlpStream.logsToParquet]] et al.); the operators under test are
  * identical.
  */
object StreamGate {

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  val WindowDelay = "2 minutes"
  val WindowDelayMs = 120000L
  val SessionDelay = "10 minutes"
  val SessionDelayMs = 600000L
  val SessionGapMinutes = 30
  private val SessionGapUs = SessionGapMinutes * 60L * 1000000L

  /** Per-corpus schema memo: every replay gate needs the events schema to
    * declare its file-stream source, and a footer read per gate is pure
    * replay-machinery overhead (the schema of a corpus never changes
    * within a JVM — the driver regenerates testdata only between
    * processes). Measured by StreamCostProbe as part of the ~0.76 s
    * stateless-drain floor each gate pays. */
  /** Memoized `max(ts)` of the STATIC events table (ms) — the elide path's
    * final-watermark anchor. One batch job per (JVM, sfDir) instead of one
    * per elided gate replay; safe because the replay corpus is immutable
    * test data (same invariant [[eventsSchemaCache]] already leans on). */
  private val eventsMaxTsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def eventsMaxTsMs(spark: SparkSession, sfDir: String): Long =
    eventsMaxTsCache.computeIfAbsent(sfDir, _ =>
      graft.operators.Tables.events(spark, sfDir)
        .agg(max(expr("unix_micros(ts) div 1000"))).head.getLong(0))

  private val eventsSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** `events` replayed as a bounded file stream, `ts` normalized to µs
    * TimestampType exactly like [[graft.operators.Tables.events]]. */
  private[graft] def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = eventsSchemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    // the file-stream source requires a directory or glob (a literal file
    // path fails basePath inference) — the [s] glob matches exactly this file.
    // maxFilesPerTrigger is pinned to MaxValue: every oracle twin's
    // determinism argument (notably [[dedupKeysOracleSql]]'s "state never
    // expires mid-replay") assumes the WHOLE replay lands in ONE micro-batch;
    // if events.parquet ever becomes a multi-part directory, an inherited
    // smaller setting would split the replay across batches, let watermark
    // expiry drop dedup state between them, and make the gate flaky.
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", Int.MaxValue)
      .parquet(s"$sfDir/event[s].parquet")
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs NTZ testdata generation: value-preserving under the pinned
        // UTC session zone (see Tables.normalizeTs)
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** RAM-backed checkpoint root for the replay gates, when the host has a
    * tmpfs. A streaming checkpoint is offset/commit logs plus state-store
    * delta files — ephemeral BY DESIGN here (each gate replay starts a
    * fresh checkpoint and discards it), while production checkpoints go to
    * durable storage. Measured (StreamProbe, sf0.1, interleaved): tmpfs vs
    * the disk-backed /tmp default is a WASH on this host — the page cache
    * absorbs the small delta writes — so the explicit root is kept for
    * deterministic cleanup (each gate deletes its checkpoint on exit
    * rather than relying on Spark's best-effort temp deletion), not for
    * speed. Read at invocation (no module state, same pattern as
    * [[statePartitionsConfigured]]): `writer.stream_checkpoint_root` /
    * `GRAFT_STREAM_CHECKPOINT_ROOT` overrides, `/dev/shm` is the
    * default-if-present. */
  private[graft] def checkpointRoot: Option[String] = {
    // same-JVM probe override (StreamProbe A/Bs tmpfs vs the Spark temp
    // default): "none" forces the temp default, a path forces that root
    val sysProp = sys.props.get("graft.stream.ckpt.root").map(_.trim)
    if (sysProp.contains("none")) return None
    val configured = sysProp.filter(_.nonEmpty).getOrElse(
      try graft.Config.load().writer.streamCheckpointRoot
      catch { case scala.util.control.NonFatal(_) => "" })
    if (configured.nonEmpty) {
      val root = new java.io.File(configured)
      root.mkdirs()
      Some(root.toString)
    } else {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val root = new java.io.File(shm, "graft-stream-ckpt")
        root.mkdirs()
        Some(root.toString)
      } else None
    }
  }

  /** State partitions for every replay gate. Stateful operators pay one
    * state store per shuffle partition per micro-batch (load + commit +
    * delta file), and at gate scale store setup dominates the actual work:
    * measured across ALL stateful gates (StreamPartProbe, sf0.1,
    * interleaved reps ×2 — superseding the round-4 "changed nothing" note,
    * which predated the tmpfs/phase instrumentation), 8 partitions is
    * 1.4-1.8× faster than 32 on every gate (window_counts 3.3-4.0→2.1-2.3 s,
    * sessionize 2.6-3.4→1.6-1.9 s, dedup 2.3-2.5→1.2-1.4 s, enrich
    * 2.9-3.8→2.1-2.5 s) and 4 is flat vs 8 — the same sweet spot SsjProbe
    * found for the stream-stream join. Results are partition-count
    * independent (revalidated at 7 vs 32 in round 5). Production sizes
    * state partitions to key cardinality; the gate's key spaces are
    * hundreds-to-thousands — hence a CONFIG knob, not a constant:
    * `writer.stream_state_partitions` / `GRAFT_STREAM_STATE_PARTITIONS`
    * (round-7 verdict task 8). Read at replay invocation like
    * [[elideFlushConfigured]] (round-10: the former module `var` was the
    * same parallel-suite race the flush flag had); the spec that proves
    * the override reaches the state operator passes it per call. */
  private def statePartitionsConfigured: Int =
    try graft.Config.load().writer.streamStatePartitions
    catch { case scala.util.control.NonFatal(_) => 8 }

  /** Elide the no-data watermark-flush micro-batch for the by-algebra
    * gates (`stream_red`/`stream_hist`/`stream_burn`/`stream_boot`) — see
    * [[graft.Config.WriterConfig.streamElideFlush]]. Measured saving
    * 0.16-0.21 s per replay (StreamFlushProbe, sf0.1, parity-asserted).
    * Read at GATE INVOCATION (not module state): the round-9 `var` was
    * global mutable state that would race under parallel suite execution
    * and was invisible to a config reader — the parity specs now pass the
    * flag as a per-call parameter instead of toggling a module field. */
  private def elideFlushConfigured: Boolean =
    try graft.Config.load().writer.streamElideFlush
    catch { case scala.util.control.NonFatal(_) => true }

  /** Drain a watermark-windowed merge-commutative aggregation, either in
    * the append+watermark form (the immutable-log-sink shape: watermark on
    * the stream, AvailableNow's extra no-data micro-batch flushes the
    * closed windows) or — when [[elideFlush]] — in UPDATE mode with no
    * stream-side watermark: the single data micro-batch emits every
    * window's final state (the whole replay is ONE batch by the pinned
    * `maxFilesPerTrigger` invariant — the same precondition the dedup
    * gate's determinism already rests on), and the append-mode subset rule
    * "windows the final watermark closed" is applied as a deterministic
    * batch post-filter (`floor(max ts ms) − delay`, a footer-stats scan).
    * Row-identical by construction for merge-commutative state — probe-
    * asserted (StreamFlushProbe) and oracle-verified (the DuckDB twins
    * compute the same subset either way). `agg` builds the windowed
    * aggregation from the (possibly watermarked) event frame; its window
    * column must be named `window`. `elide` is resolved by the CALLER
    * (config default or an explicit per-call override from the parity
    * specs). */
  private def drainWindowed(spark: SparkSession, sfDir: String,
      ev: DataFrame, agg: DataFrame => DataFrame, elide: Boolean,
      tsCol: String = "ts", stateParts: Option[Int] = None): DataFrame =
    if (elide) {
      val wmMs = eventsMaxTsMs(spark, sfDir) - WindowDelayMs
      runToMemory(spark, agg(ev), outputMode = "update", stateParts = stateParts)
        .filter(expr("unix_micros(window.end) div 1000") <= wmMs)
    } else
      runToMemory(spark, agg(ev.withWatermark(tsCol, WindowDelay)),
        stateParts = stateParts)

  /** Drain a bounded stream into a uniquely-named memory sink, detach the
    * result (eager-analysis pin — see below), drop the sink view. State
    * partitions are capped at [[statePartitionsConfigured]] for the
    * query's start (a per-query start-time setting — the session value is
    * restored immediately). The residual ~1.5 s per replay is micro-batch
    * machinery: query planning, two WAL'd micro-batches (data + no-data
    * watermark flush), and the memory-sink collect; the checkpoint lives
    * under [[checkpointRoot]] when a tmpfs exists and is deleted after the
    * drain. Measured NON-levers, for the record (StreamProbe /
    * StreamPhaseProbe): tmpfs vs disk checkpoint is a wash (page cache
    * absorbs the deltas), and 4 gates run concurrently cost the same wall
    * as sequentially (executor saturation, state-store lock contention). */
  /** Serializes replays: the save/restore of the session-global shuffle
    * partitions below is not re-entrant — two concurrent replays could read
    * each other's "8" as the value to restore and pin the session
    * (StreamPhaseProbe measured concurrent replays as a wall-clock wash vs
    * sequential anyway — executor saturation — so the lock costs nothing). */
  private val replayLock = new Object

  private[graft] def runToMemory(spark: SparkSession, df: DataFrame,
      outputMode: String = "append",
      stateParts: Option[Int] = None): DataFrame = replayLock.synchronized {
    val name = s"graft_stream_gate_${runId.incrementAndGet()}"
    // checkpoint names must be unique ACROSS JVMs, not just within this one:
    // a stale same-named dir (crashed JVM whose finally-delete never ran, or
    // a concurrent probe JVM) carries committed offsets, and an AvailableNow
    // query that finds them resumes past the data and drains NOTHING — the
    // gate would silently return an empty frame. UUID suffix + delete-before-
    // start close both the collision and the stale-dir case.
    val ckpt = checkpointRoot.map(r =>
      s"$r/$name-${java.util.UUID.randomUUID().toString.take(8)}")
    ckpt.foreach(c =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
    // the conf must stay pinned through awaitTermination: micro-batches
    // plan asynchronously after start() returns, and the state partition
    // count is fixed from the conf at first-batch planning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions",
        stateParts.getOrElse(statePartitionsConfigured).toString)
      val writer = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
      ckpt.foreach(writer.option("checkpointLocation", _))
      val q = writer.start()
      q.awaitTermination()
      // the flush-elision rewrite (drainWindowed's update-mode form) is
      // row-correct only when the bounded replay lands in ONE data
      // micro-batch: a multi-batch replay would emit intermediate per-window
      // states that survive the window-end post-filter as duplicate rows.
      // The invariant is pinned by maxFilesPerTrigger at the sources, but
      // assert it here so a future source change fails loudly instead of
      // corrupting results silently.
      if (outputMode == "update") {
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches <= 1,
          s"flush-elision single-batch invariant violated: $dataBatches data " +
            "micro-batches in an update-mode drain — intermediate window " +
            "states would leak past the watermark post-filter")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
    }
    // Detach by eager analysis, not localCheckpoint: Dataset plans resolve
    // at creation, so this reference pins the memory sink's MemoryPlan and
    // survives the view drop with NO materialization job (the checkpoint
    // job was ~0.19 s per gate — StreamFloorProbe, round 11). The sink's
    // rows stay reachable only through the returned frame, so normal GC
    // reclaims them once the caller drops it.
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    out
  }

  /** Event-time tumbling-window counts over the replayed stream:
    * 1-minute windows per (event_type, severity), watermark 2 minutes.
    * Severity is a derived two-level key so [[OtlpStream.logCountsByWindow]]
    * is exercised with both its group columns. */
  def windowCounts(spark: SparkSession, sfDir: String,
      stateParts: Option[Int] = None,
      elide: Option[Boolean] = None): DataFrame = {
    val shaped = eventsStream(spark, sfDir).select(
      col("ts").as("Timestamp"),
      col("event_type").as("ServiceName"),
      when(col("value") >= 250.0, "HIGH").otherwise("LOW").as("SeverityText"))
    // elide path (see [[drainWindowed]]): the same window+group+count shape
    // in UPDATE mode, skipping the no-data flush batch; the non-elided form
    // drains the reference operator [[OtlpStream.logCountsByWindow]]
    // verbatim, and StreamingSpec pins the two row-identical.
    val drained =
      if (elide.getOrElse(elideFlushConfigured))
        drainWindowed(spark, sfDir, shaped,
          e => e.groupBy(window(col("Timestamp"), "1 minute"),
              col("ServiceName"), col("SeverityText"))
            .agg(count(lit(1)).as("n")),
          elide = true, tsCol = "Timestamp", stateParts = stateParts)
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("ServiceName"), col("SeverityText"), col("n"))
      else runToMemory(spark, OtlpStream.logCountsByWindow(shaped,
        windowLength = "1 minute", watermarkDelay = WindowDelay),
        stateParts = stateParts)
    drained
      .select(unix_micros(col("window_start")).as("window_start_us"),
        unix_micros(col("window_end")).as("window_end_us"),
        col("ServiceName").as("event_type"),
        col("SeverityText").as("severity"),
        col("n"))
      .orderBy(col("window_start_us"), col("event_type"), col("severity"))
  }

  /** Event-time sessionization over the replayed stream (30-min gap,
    * 10-min watermark): emits closed sessions only. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsUs"))
      .as[OtlpStream.SessionEvent]
    val sessions = OtlpStream.sessionizeStream(ev,
      watermarkDelay = SessionDelay, gapMinutes = SessionGapMinutes)
    runToMemory(spark, sessions.toDF())
      .select(col("user_id"), col("n_events"),
        col("startUs").as("session_start_us"),
        col("endUs").as("session_end_us"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Watermarked streaming dedup over the replayed stream: the distinct
    * (user_id, event_type) keys seen, each emitted exactly once via
    * [[OtlpStream.dedupWithinWatermark]] (state expires with the
    * watermark). Only the key columns are projected — WHICH physical row
    * wins the first-arrival race across 32 tasks is nondeterministic, but
    * the distinct key set is a pure function of the data, which is what
    * makes a streaming dedup oracle-checkable at all. */
  def dedupKeys(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val keyed = eventsStream(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"))
    // elide form: dropDuplicates WITHOUT a watermark — dedup emits each
    // first arrival in the data batch itself, so the only thing the
    // watermark buys a bounded replay is the state-expiry no-data batch
    // (~0.2 s of machinery for a gate whose state is discarded anyway).
    // The distinct key SET is identical either way (single-batch replay ⇒
    // watermark expiry never drops state mid-replay); StreamingSpec pins
    // the two forms row-identical. Production keeps the watermarked
    // operator — unbounded dedup state does not survive an infinite stream.
    val deduped =
      if (elide.getOrElse(elideFlushConfigured))
        keyed.dropDuplicates("user_id", "event_type")
      else OtlpStream.dedupWithinWatermark(keyed, "ts",
        WindowDelay, Seq("user_id", "event_type"))
    runToMemory(spark, deduped)
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Stream-static enrichment join over the replayed stream: each event
    * joins a STATIC dimension table (nation, keyed by `user_id % 25`) and
    * the enriched stream aggregates into watermarked 1-hour windows per
    * nation. This is the remaining streaming join pattern (stream ⋈ static
    * — Spark broadcasts or re-reads the static side per micro-batch; no
    * state, unlike stream-stream joins which hold both sides), and the
    * standard fleet shape: telemetry keyed by a small slowly-changing
    * dimension. Emitted subset = windows the final watermark passed, same
    * determinism argument as [[windowCounts]].
    *
    * The static side is CACHED and materialized before the stream starts
    * (`cacheStatic`, default on): Spark re-plans the static side of a
    * stream-static join on EVERY micro-batch, so an uncached dimension is
    * re-read from parquet per batch — free-looking at 25 rows, but the
    * re-read is a full scan of the dimension at production scale and the
    * cache is the standard fix. The knob exists so StreamProbe can measure
    * both forms. */
  def enrichJoin(spark: SparkSession, sfDir: String,
      cacheStatic: Boolean = true,
      elide: Option[Boolean] = None): DataFrame = {
    val nation0 = graft.operators.Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
    val nation = if (cacheStatic) nation0.cache() else nation0
    if (cacheStatic) nation.count() // materialize before the replay starts
    try {
      val shaped = eventsStream(spark, sfDir)
        .select(col("ts").as("Timestamp"),
          expr("user_id % 25").as("k"))
        .join(nation, col("k") === col("n_nationkey"))
      // the windowed count over the enriched stream is merge-commutative,
      // so the [[drainWindowed]] flush elision applies (the join itself is
      // stateless — stream ⋈ static); StreamingSpec pins elide == append.
      drainWindowed(spark, sfDir, shaped,
        e => e.groupBy(window(col("Timestamp"), "1 hour"), col("n_name"))
          .agg(count(lit(1)).as("n")),
        elide.getOrElse(elideFlushConfigured), tsCol = "Timestamp")
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("n_name"), col("n"))
        .orderBy(col("window_start_us"), col("n_name"))
    } finally if (cacheStatic) nation.unpersist()
  }

  /** Custom-state streaming gate: the rolling z-score anomaly detector
    * ([[OtlpStream.rollingAnomalyStream]], per-user flatMapGroupsWithState
    * with an O(window) buffer) over the replayed events. With the whole
    * replay in one micro-batch (the [[eventsStream]] contract) the emitted
    * flags are IDENTICAL to the batch `q_anomaly` operator, so this gate
    * reuses the batch oracle verbatim — batch/stream parity as a checked
    * property, not a claim. */
  def anomalies(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("tsUs"),
        col("user_id"), col("value"))
      .as[OtlpStream.AnomEvent]
    val flags = OtlpStream.rollingAnomalyStream(ev)
    runToMemory(spark, flags.toDF())
      .orderBy(col("event_id"))
  }

  /** STREAM-STREAM interval join over two replays of the event stream —
    * the last streaming join pattern ([[enrichJoin]] covers stream ⋈
    * static): purchases join errors by the same user within ±30 minutes
    * of event time. Both sides carry watermarks and the join condition
    * carries the time interval, which is exactly what lets Spark BOUND the
    * join state: each side's rows are dropped once the other side's
    * watermark passes their `ts` + interval — without the time bound the
    * state is "all rows ever seen" and the join cannot run forever.
    *
    * Determinism: INNER stream-stream joins emit a pair the micro-batch
    * both halves have arrived in; with the whole replay in one
    * AvailableNow batch every matching pair is emitted there, so the
    * result is the plain batch interval join — a pure function of the
    * data, which the DuckDB twin recomputes directly. */
  def streamStreamJoin(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    // elide form: both watermarks dropped. An INNER stream-stream join
    // emits a pair in the micro-batch both halves have arrived in — the
    // watermarks only bound STATE retention, which a single-batch replay
    // discards anyway, and removing them removes the state-expiry no-data
    // batch (four keyed stores per partition doing nothing but cleanup).
    // Pair set identical; StreamingSpec pins the two forms. Production
    // keeps the watermarked form — unbounded join state cannot survive an
    // infinite stream (the scaladoc's whole point).
    val el = elide.getOrElse(elideFlushConfigured)
    def wm(df: DataFrame, c: String): DataFrame =
      if (el) df else df.withWatermark(c, "1 hour")
    val p = wm(eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts")), "p_ts")
    val e = wm(eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts")), "e_ts")
    val joined = p.join(e,
      col("user_id") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("e_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
    // the stream-stream join pays FOUR keyed state stores per shuffle
    // partition (two sides × two stores) — the gate that first exposed the
    // state-partition cost (SsjProbe: 5.3-8.3 s at 32 partitions vs
    // 2.4-3.7 s at 8, same 370-row result). runToMemory now applies the
    // measured cap to every replay gate (see statePartitions).
    runToMemory(spark, joined.select(col("user_id"),
        col("purchase_id"), col("error_id"),
        unix_micros(col("p_ts")).as("purchase_ts_us"),
        unix_micros(col("e_ts")).as("error_ts_us")))
      .orderBy(col("user_id"), col("purchase_id"), col("error_id"))
  }

  // ---- DuckDB twins --------------------------------------------------------

  /** DuckDB twin of [[streamStreamJoin]]: the plain batch interval join
    * (single-batch replay ⇒ the stream emits every matching pair). */
  def streamStreamJoinOracleSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      |  FROM events WHERE event_type = 'purchase'
      |), e AS (
      |  SELECT user_id, event_id AS error_id, epoch_us(ts) AS e_us
      |  FROM events WHERE event_type = 'error'
      |)
      |SELECT p.user_id, p.purchase_id, e.error_id,
      |  p.p_us AS purchase_ts_us, e.e_us AS error_ts_us
      |FROM p JOIN e ON p.user_id = e.user_id
      |  AND e.e_us BETWEEN p.p_us - 1800000000 AND p.p_us + 1800000000
      |ORDER BY p.user_id, p.purchase_id, e.error_id""".stripMargin

  /** DuckDB twin of [[enrichJoin]]: the batch join + the same
    * watermark-passed window subset. */
  def enrichJoinOracleSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, user_id % 25 AS k FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), j AS (
       |  SELECT (e.ts_us // 3600000000) * 3600000000 AS window_start_us,
       |    n.n_name
       |  FROM e JOIN nation n ON e.k = n.n_nationkey
       |)
       |SELECT window_start_us, n_name, count(*) AS n
       |FROM j, wm
       |WHERE (window_start_us + 3600000000) // 1000 <= wm_ms
       |GROUP BY 1, 2
       |ORDER BY window_start_us, n_name""".stripMargin

  /** DuckDB twin of [[dedupKeys]]: with every event inside one replayed
    * batch, watermark expiry never drops state before all arrivals are
    * seen, so the emitted set is exactly the distinct key set. */
  def dedupKeysOracleSql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** DuckDB twin of [[windowCounts]]: same tumbling windows, restricted to
    * those the final watermark (`floor(max_ts_ms) - delay`) has passed. */
  def windowCountsOracleSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, event_type,
       |    CASE WHEN value >= 250.0 THEN 'HIGH' ELSE 'LOW' END AS severity
       |  FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), w AS (
       |  SELECT (ts_us // 60000000) * 60000000 AS window_start_us,
       |    (ts_us // 60000000) * 60000000 + 60000000 AS window_end_us,
       |    event_type, severity
       |  FROM e
       |)
       |SELECT CAST(window_start_us AS BIGINT) AS window_start_us,
       |  CAST(window_end_us AS BIGINT) AS window_end_us,
       |  event_type, severity, count(*) AS n
       |FROM w, wm
       |WHERE window_end_us // 1000 <= wm_ms
       |GROUP BY 1, 2, 3, 4
       |ORDER BY window_start_us, event_type, severity""".stripMargin

  /** DuckDB twin of [[sessionize]]: batch gaps-and-islands sessions,
    * restricted to the ones the stream emits — sessions closed by a later
    * in-batch event (not the user's last) plus final sessions whose
    * `end + gap` (ms) the final watermark passed. */
  def sessionizeOracleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $SessionDelayMs AS wm_ms FROM e
       |), s AS (
       |  SELECT user_id, event_id, ts_us,
       |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > $SessionGapUs
       |         OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e
       |), sid AS (
       |  SELECT user_id, ts_us,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM s
       |), sess AS (
       |  SELECT user_id, session_id, count(*) AS n_events,
       |    min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |    max(session_id) OVER (PARTITION BY user_id) AS last_session
       |  FROM sid GROUP BY user_id, session_id
       |)
       |SELECT user_id, n_events, session_start_us, session_end_us
       |FROM sess, wm
       |WHERE session_id < last_session
       |   OR (session_end_us + $SessionGapUs) // 1000 < wm_ms
       |ORDER BY user_id, session_start_us""".stripMargin

  /** The per-batch MERGE rule, shared with the multi-batch spec: read the
    * current snapshot (if any), union the batch, keep the latest row per
    * user (total tiebreak), rewrite. The localCheckpoint detaches the
    * merged frame from the snapshot files BEFORE they are overwritten. */
  private[graft] def mergeBatchInto(snapDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val sess = batch.sparkSession
    // snapshot existence goes through the Hadoop FS, not java.io.File — the
    // gate only ever passes a local tmp dir, but foreachBatch MERGE is the
    // production CDC-sink shape and an HDFS/S3 snapDir probed with
    // java.io.File would always read false, silently rebuilding every batch
    // from an empty base
    val snapPath = new org.apache.hadoop.fs.Path(snapDir)
    val snapFs = snapPath.getFileSystem(sess.sparkContext.hadoopConfiguration)
    val existing =
      if (snapFs.exists(snapPath)) sess.read.parquet(snapDir)
      else sess.createDataFrame(
        sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val merged = existing.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(snapDir)
  }

  /** Streaming upsert materialization — the `foreachBatch` MERGE pattern:
    * each micro-batch is merged latest-wins (by event time, unique
    * tiebreak) into a parquet snapshot keyed on `user_id`, and the gate
    * returns the final snapshot: every user's most recent event. This is
    * the streaming-CDC sink shape (a table format's MERGE inside
    * foreachBatch); with plain parquet the merge rewrites the snapshot —
    * fine for a gate probe, while production uses a merge-on-read format
    * or partition-pruned rewrites. The per-batch rule is associative
    * (latest-wins with a total tiebreak), so the final snapshot is a pure
    * function of the data regardless of how the replay batches.
    */
  def upsertSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-upsert")
    val snapDir = tmpRoot.toString + "/snap"
    val stream = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val ckptName = s"graft_stream_gate_upsert_${runId.incrementAndGet()}"
    val ckpt = checkpointRoot.map(r => s"$r/$ckptName")
    val writer = stream.writeStream
      .foreachBatch(mergeBatchInto(snapDir) _)
      .trigger(Trigger.AvailableNow())
    ckpt.foreach(writer.option("checkpointLocation", _))
    val q = writer.start()
    try q.awaitTermination()
    finally ckpt.foreach(c =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
    val out = spark.read.parquet(snapDir)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("ts_us").as("last_ts_us"))
      .orderBy(col("user_id"))
      .localCheckpoint(true) // detached from the files — safe to delete them
    // the gate/bench call this repeatedly; without cleanup every run leaks
    // one snapshot directory into /tmp
    org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
    out
  }

  /** DuckDB twin of [[upsertSnapshot]]: the latest event per user. */
  def upsertSnapshotOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM e
      |)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  ts_us AS last_ts_us
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- windowed count-min grid --------------------------------------------

  /** Stream CMS dimensions — smaller than the batch `q_cms_topk` grid
    * because the state is PER WINDOW (depth × width × windows-in-flight). */
  val StreamCmsDepth = 2
  val StreamCmsWidth = 64L

  /** `(r, user_id) → md5Lower63("scms{r}:{u}") % width` as codegen columns
    * (the [[graft.functions.PortableHash.md5Lower63Col]] kernel — the
    * round-9 UDF predated it). md5Lower63 is non-negative, so `%` is the
    * positive remainder either way. NULL semantics match the oracle's `||`
    * (NULL user_id → NULL bucket; the UDF form hashed "null") — the events
    * table's user_id is non-null by schema, see
    * [[graft.operators.Sketches]]' cmsBucket note. */
  private[graft] def streamCmsBucket(r: org.apache.spark.sql.Column,
      u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.md5Lower63Col(
      concat(lit("scms"), r.cast("string"), lit(":"), u.cast("string"))) %
      StreamCmsWidth

  /** Per-hour COUNT-MIN grids over the replayed stream (user-activity
    * frequency): each closed 1-hour window emits its non-empty
    * [[StreamCmsDepth]]×[[StreamCmsWidth]] cells. The grid is what makes
    * CMS *the* streaming frequency sketch: every cell is a plain windowed
    * SUM, so the stream result is independent of micro-batch boundaries
    * and arrival order BY ALGEBRA (sums commute) — the batch twin is not
    * an approximation of the stream, it is equal, which the oracle checks
    * cell-for-cell. Downstream, per-window grids merge by cell-wise
    * addition into any coarser granularity (hour→day→corpus) without
    * touching raw data again.
    *
    * State at 100 TB: windows-in-flight × 128 cells — bounded by the
    * watermark regardless of key cardinality or row rate (contrast the
    * windowed distinct-count state, which grows with keys). */
  def cmsWindows(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"), col("user_id"),
        explode(lit((0 until StreamCmsDepth).toArray)).as("r"))
      .withColumn("bucket", streamCmsBucket(col("r"), col("user_id")))
    // cell counts are plain sums — merge-commutative, so the
    // [[drainWindowed]] flush elision applies; StreamingSpec pins parity.
    drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"), col("r"), col("bucket"))
        .agg(count(lit(1)).as("cell_n")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("r"), col("bucket"), col("cell_n"))
      .orderBy(col("window_start_us"), col("r"), col("bucket"))
  }

  /** Bottom-k size for the windowed percentile sketch. */
  val StreamQsketchK = 64

  private def streamQsketchHash(
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.md5Lower63Col(
      concat(lit("sq:"), id.cast("string")))

  /** Per-hour PERCENTILE SKETCH over the replayed stream: each closed
    * window carries its bottom-[[StreamQsketchK]]-by-hash sample of
    * `value` (the deterministic uniform sample of `q_approx_percentile`)
    * and the p50/p95 estimates from the shared ⌈q·m⌉ index rule. The 9th
    * replay gate, and the second whose batch parity holds BY ALGEBRA:
    * keep-k-smallest-hashes is merge-commutative, so micro-batch
    * boundaries and arrival order cannot change the sample — where
    * KLL/GK/t-digest state is arrival-order-dependent and could not be
    * oracle-checked as a stream at all. State per window is k rows
    * regardless of rate — the streaming percentile shape at 100 TB. */
  def qsketchWindows(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"), col("value"),
        streamQsketchHash(col("event_id")).as("h"))
    // keep-k-smallest-hashes is merge-commutative (the gate's whole parity
    // argument), so the [[drainWindowed]] flush elision applies; the
    // percentile picks are post-drain projections of the final sample.
    drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.QsketchAggregate
          .qsketchBottomK(col("h"), col("value"), StreamQsketchK).as("sample")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        size(col("sample")).cast("long").as("m_sample"),
        element_at(col("sample"),
          expr("(size(sample) + 1) div 2").cast("int")).as("est_p50"),
        element_at(col("sample"),
          expr("(19 * size(sample) + 19) div 20").cast("int")).as("est_p95"))
      .orderBy(col("window_start_us"))
  }

  /** DuckDB twin of [[qsketchWindows]] — identical per-window bottom-k
    * sample and index rule, with the append-mode window filter. */
  def qsketchWindowsOracleSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, event_id, value FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), src AS (
       |  SELECT (ts_us // 3600000000) * 3600000000 AS w, value AS v,
       |    CAST(md5_number_lower('sq:' || CAST(event_id AS VARCHAR))
       |      & 9223372036854775807 AS BIGINT) AS h
       |  FROM e
       |), d AS (
       |  SELECT DISTINCT w, h, v FROM src
       |), rk AS (
       |  SELECT w, v,
       |    row_number() OVER (PARTITION BY w ORDER BY h, v) AS rn
       |  FROM d
       |), sm AS (
       |  SELECT w, v,
       |    row_number() OVER (PARTITION BY w ORDER BY v) AS vr,
       |    count(*) OVER (PARTITION BY w) AS m
       |  FROM rk WHERE rn <= $StreamQsketchK
       |)
       |SELECT CAST(w AS BIGINT) AS window_start_us,
       |  CAST(max(m) AS BIGINT) AS m_sample,
       |  min(CASE WHEN vr = (m + 1) // 2 THEN v END) AS est_p50,
       |  min(CASE WHEN vr = (19 * m + 19) // 20 THEN v END) AS est_p95
       |FROM sm, wm
       |WHERE (w + 3600000000) // 1000 <= wm_ms
       |GROUP BY w ORDER BY window_start_us""".stripMargin

  /** DuckDB twin of [[cmsWindows]] — batch grid with the append-mode
    * window filter (window closed by the final watermark). */
  def cmsWindowsOracleSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, user_id FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), rr AS (
       |  SELECT * FROM (VALUES (0), (1)) AS t(r)
       |), cells AS (
       |  SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
       |    rr.r AS r,
       |    CAST((md5_number_lower('scms' || CAST(rr.r AS VARCHAR) || ':'
       |        || CAST(user_id AS VARCHAR))
       |      & 9223372036854775807) % $StreamCmsWidth AS BIGINT) AS bucket,
       |    count(*) AS cell_n
       |  FROM e CROSS JOIN rr
       |  GROUP BY 1, 2, 3
       |)
       |SELECT CAST(window_start_us AS BIGINT) AS window_start_us, r, bucket,
       |  CAST(cell_n AS BIGINT) AS cell_n
       |FROM cells, wm
       |WHERE (window_start_us + 3600000000) // 1000 <= wm_ms
       |ORDER BY window_start_us, r, bucket""".stripMargin

  /** STREAMING RED PANEL — the 10th replay gate: per (1-hour window,
    * event_type) request count, "error" count (`value ≥ 250` — the HIGH
    * tail, the same severity cut as `stream_window_counts`, standing in
    * for a status flag), portably-
    * rounded error rate and exact mean value — the service-health rollup
    * [[graft.operators.OtelQueries.redMetrics]] computes in batch, kept
    * live by Structured Streaming.
    *
    * Parity BY ALGEBRA, like `stream_cms`/`stream_qsketch`: every
    * accumulated quantity (counts, conditional counts, DECIMAL sums) is
    * merge-commutative, so micro-batch boundaries provably cannot perturb
    * the result; the ratio/mean are computed AFTER the drain as pure
    * projections of the final state. Append mode emits exactly the
    * windows the final watermark closed — the same deterministic subset
    * rule as `stream_window_counts`. State per window is one row per
    * (window, event_type): bounded by the type vocabulary at any event
    * rate. */
  def redWindows(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
    drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 250.0, 1L).otherwise(0L)).as("n_err"),
          sum(col("value").cast("decimal(28,6)")).as("sum_v")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("n_err"),
        graft.operators.Tables.portableRound6(
          col("n_err").cast("double") / col("n").cast("double")).as("err_rate"),
        graft.operators.Tables.portableRound6(
          col("sum_v").cast("double") / col("n").cast("double")).as("avg_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** STREAMING FIXED-GRID HISTOGRAM — the live sibling of
    * [[graft.operators.OtelQueries.histRebucket]]'s analysis grid: per
    * (1-hour window, grid bucket) event counts over `value`, the data
    * behind a latency-heatmap panel kept current by Structured Streaming.
    * The grid is [[graft.operators.OtelQueries.RebucketBounds]] (shared
    * constant — one analysis grid across the batch rebucketer and the
    * live panel). Parity BY ALGEBRA: cell counts are merge-commutative,
    * so micro-batching cannot perturb them; append mode emits the
    * watermark-closed windows. State is ≤ windows×5 cells at any rate. */
  def histWindows(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val bs = graft.operators.OtelQueries.RebucketBounds
    val bucketExpr = bs.zipWithIndex.foldRight(lit(bs.size.toLong)) {
      case ((b, i), acc) => when(col("value") < b.toDouble, i.toLong).otherwise(acc)
    }
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"), bucketExpr.as("bucket"))
    drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"), col("bucket"))
        .agg(count(lit(1)).as("n")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("bucket"), col("n"))
      .orderBy(col("window_start_us"), col("bucket"))
  }

  /** STREAMING BURN-RATE PANEL — the 12th replay gate: the
    * [[graft.operators.OtelQueries.burnRate]] error-budget policy kept
    * live. The STREAM drains per-hour (n, err) cells — merge-commutative,
    * so the by-algebra parity argument (and the [[drainWindowed]] elision)
    * applies — and the 6-hour block rates plus the two-window alert are
    * batch projections of the drained state: block counts compose EXACTLY
    * from hour cells (Σn, Σerr), so no second stateful query is needed.
    * Deviation from the batch gate, by design: blocks aggregate the
    * WATERMARK-CLOSED hours (the panel's visible state), where the batch
    * form sees all events — the oracle mirrors this closed-hours rule.
    * State is one (n, err) pair per hour window at any event rate. */
  def burnWindows(spark: SparkSession, sfDir: String,
      elide: Option[Boolean] = None): DataFrame = {
    val HourUs = 3600000000L
    val BlockUs = 6 * HourUs
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"),
        when(col("value") >= graft.operators.OtelQueries.BurnErrValue, 1L)
          .otherwise(0L).as("is_err"))
    val drained = drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_1h"), sum(col("is_err")).as("err_1h")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("n_1h"), col("err_1h"))
      .localCheckpoint(true) // two consumers (hours + block rollup)
    val hours = drained
      .withColumn("err_ppm_1h", expr("err_1h * 1000000L div n_1h"))
      .withColumn("block_us", expr(s"(hour_us div $BlockUs) * $BlockUs"))
    val blocks = drained
      .groupBy(expr(s"(hour_us div $BlockUs) * $BlockUs").as("block_us"))
      .agg(expr("sum(err_1h) * 1000000L div sum(n_1h)").as("err_ppm_6h"))
    val alertPpm = graft.operators.OtelQueries.BurnAlertPpm
    hours.join(blocks, Seq("block_us"))
      .select(col("hour_us"), col("n_1h"), col("err_1h"), col("err_ppm_1h"),
        col("err_ppm_6h"),
        (col("err_ppm_1h") > alertPpm && col("err_ppm_6h") > alertPpm)
          .as("alert"))
      .orderBy(col("hour_us"))
  }

  /** DuckDB twin of [[burnWindows]] — hour cells under the append-mode
    * closed-window filter, block rates composed from the closed cells. */
  def burnWindowsOracleSql: String = {
    val h = 3600000000L
    val b = 6 * h
    val alertPpm = graft.operators.OtelQueries.BurnAlertPpm
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us,
       |    CASE WHEN value >= ${graft.operators.OtelQueries.BurnErrValue}
       |         THEN 1 ELSE 0 END AS is_err
       |  FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), hr AS (
       |  SELECT (ts_us // $h) * $h AS hour_us, count(*) AS n_1h,
       |    CAST(sum(is_err) AS BIGINT) AS err_1h
       |  FROM e GROUP BY 1
       |), closed AS (
       |  SELECT hour_us, n_1h, err_1h FROM hr, wm
       |  WHERE (hour_us + $h) // 1000 <= wm_ms
       |), blk AS (
       |  SELECT (hour_us // $b) * $b AS block_us,
       |    CAST(sum(err_1h) * 1000000 // sum(n_1h) AS BIGINT) AS err_ppm_6h
       |  FROM closed GROUP BY 1
       |)
       |SELECT c.hour_us, c.n_1h, c.err_1h,
       |  CAST(c.err_1h * 1000000 // c.n_1h AS BIGINT) AS err_ppm_1h,
       |  b.err_ppm_6h,
       |  c.err_1h * 1000000 // c.n_1h > $alertPpm
       |    AND b.err_ppm_6h > $alertPpm AS alert
       |FROM closed c JOIN blk b ON (c.hour_us // $b) * $b = b.block_us
       |ORDER BY c.hour_us""".stripMargin
  }

  /** DuckDB twin of [[histWindows]] — same grid thresholds, append-mode
    * window filter. */
  def histWindowsOracleSql: String = {
    val bs = graft.operators.OtelQueries.RebucketBounds
    val bucketSql = "CASE " + bs.zipWithIndex.map { case (b, i) =>
      s"WHEN value < $b.0 THEN $i"
    }.mkString(" ") + s" ELSE ${bs.size} END"
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, CAST($bucketSql AS BIGINT) AS bucket
       |  FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), w AS (
       |  SELECT (ts_us // 3600000000) * 3600000000 AS ws, bucket FROM e
       |)
       |SELECT CAST(ws AS BIGINT) AS window_start_us, bucket, count(*) AS n
       |FROM w, wm
       |WHERE (ws + 3600000000) // 1000 <= wm_ms
       |GROUP BY 1, 2
       |ORDER BY window_start_us, bucket""".stripMargin
  }

  /** DuckDB twin of [[redWindows]] — batch aggregate with the append-mode
    * window filter and identical decimal/rounding arithmetic. */
  def redWindowsOracleSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, event_type, value FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), w AS (
       |  SELECT (ts_us // 3600000000) * 3600000000 AS ws, event_type, value
       |  FROM e
       |), a AS (
       |  SELECT ws, event_type, count(*) AS n,
       |    CAST(sum(CASE WHEN value >= 250.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
       |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
       |  FROM w GROUP BY 1, 2
       |)
       |SELECT CAST(ws AS BIGINT) AS window_start_us, event_type, n, n_err,
       |  ${graft.operators.Tables.portableRound6Sql(
            "CAST(n_err AS DOUBLE) / n")} AS err_rate,
       |  ${graft.operators.Tables.portableRound6Sql("sum_v / n")} AS avg_value
       |FROM a, wm
       |WHERE (ws + 3600000000) // 1000 <= wm_ms
       |ORDER BY window_start_us, event_type""".stripMargin

  /** STREAMING POISSON-BOOTSTRAP BAND — the 13th replay gate: the
    * [[graft.operators.QuerySurface.bootstrapCi]] uncertainty band kept
    * LIVE per hour window. Each event fans out to B = 32 replicates with
    * the SAME Poisson(1) multiplicities as the batch gate (shared
    * [[graft.operators.QuerySurface.poissonBootHash]] /
    * `poissonWeightFromHash` definitions — one replicate universe), and
    * the stream drains (hour, b) → (Σw·v, Σw) cells: pure sums,
    * merge-commutative, so the by-algebra parity argument (and the
    * [[drainWindowed]] flush elision) applies. The batch projection turns
    * the 32 drained cells per closed hour into replicate means and the
    * rank-2 / rank-(B−1) band — the live "is the hourly mean drifting
    * outside its own sampling noise" panel. State: 32 (Σw·v, Σw) pairs
    * per open hour window at ANY event rate. */
  def bootWindows(spark: SparkSession, sfDir: String, b: Int = 32,
      elide: Option[Boolean] = None): DataFrame = {
    import graft.operators.QuerySurface.{poissonBootHash, poissonWeightFromHash}
    val ev = eventsStream(spark, sfDir)
      .select(col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"))
      // the stream-side spreadIfNarrow: the single-file source scans as ONE
      // partition and the B× hash fan-out below would otherwise run on one
      // task (explicit count — AQE is off in streaming, but the batch
      // lesson stands); keyed on event_id like every spread
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      .withColumn("b", explode(array((0 until b).map(i => lit(i)): _*)))
      .withColumn("h", poissonBootHash(col("b"), col("event_id")))
      .withColumn("w", poissonWeightFromHash(col("h")))
    val drained = drainWindowed(spark, sfDir, ev,
      e => e.groupBy(window(col("ts"), "1 hour"), col("b"))
        .agg(sum(col("w") * col("v_fp")).as("swv"), sum(col("w")).as("sw")),
      elide.getOrElse(elideFlushConfigured))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("b"), col("swv"), col("sw"))
    val means = drained.filter(col("sw") > 0L)
      .select(col("hour_us"), col("b"), expr("swv div sw").as("rep_mean_fp"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_us")).orderBy(col("rep_mean_fp"), col("b"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_us"))
    means
      .withColumn("rk", row_number().over(wr))
      .withColumn("np", count(lit(1)).over(wAll))
      .groupBy(col("hour_us"))
      .agg(max(col("np")).as("n_reps"),
        max(when(col("rk") === 2L, col("rep_mean_fp"))).as("boot_lo_fp"),
        max(when(col("rk") === col("np") - 1L, col("rep_mean_fp")))
          .as("boot_hi_fp"))
      .orderBy(col("hour_us"))
  }

  /** DuckDB twin of [[bootWindows]] — the same replicate hash, thresholds,
    * closed-hour filter, and rank picks. */
  def bootWindowsOracleSql(b: Int = 32): String = {
    val h = 3600000000L
    val terms = graft.operators.QuerySurface.poissonWeightSqlTerms("h")
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS ts_us, event_id,
       |    CAST(floor(value * 1000000) AS BIGINT) AS v_fp
       |  FROM events
       |), wm AS (
       |  SELECT max(ts_us) // 1000 - $WindowDelayMs AS wm_ms FROM e
       |), reps AS (
       |  SELECT hour_us, b, v_fp, $terms AS w
       |  FROM (
       |    SELECT (ts_us // $h) * $h AS hour_us, b, v_fp,
       |      CAST(md5_number_lower('boot:' || CAST(b AS VARCHAR) || ':' ||
       |        CAST(event_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS h
       |    FROM e CROSS JOIN (SELECT unnest(range(0, $b)) AS b)
       |  )
       |), closed AS (
       |  SELECT hour_us, b,
       |    CAST(sum(w * v_fp) AS BIGINT) AS swv, CAST(sum(w) AS BIGINT) AS sw
       |  FROM reps, wm WHERE (hour_us + $h) // 1000 <= wm_ms
       |  GROUP BY 1, 2 HAVING sum(w) > 0
       |), rm AS (
       |  SELECT hour_us, b, swv // sw AS rep_mean_fp FROM closed
       |), rk AS (
       |  SELECT hour_us, rep_mean_fp, b,
       |    row_number() OVER (PARTITION BY hour_us
       |      ORDER BY rep_mean_fp, b) AS rk,
       |    count(*) OVER (PARTITION BY hour_us) AS np
       |  FROM rm
       |)
       |SELECT hour_us, CAST(max(np) AS BIGINT) AS n_reps,
       |  CAST(max(CASE WHEN rk = 2 THEN rep_mean_fp END) AS BIGINT)
       |    AS boot_lo_fp,
       |  CAST(max(CASE WHEN rk = np - 1 THEN rep_mean_fp END) AS BIGINT)
       |    AS boot_hi_fp
       |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** STREAMING incremental LSH dedup against the MAINTAINED band index —
    * the at-ingest form of [[graft.operators.Dedup.dedupIncrementalFromIndex]]
    * and the capstone of the round-12 index story (build → maintain →
    * probe live): the "new batch" tranche of `documents` arrives as a
    * bounded file STREAM, each document's band signatures probe the
    * materialized corpus index via a stateless STREAM-STATIC join (the
    * stream row carries its own shingle set through the join, so nothing
    * ever joins back into the stream), and the drained candidate rows get
    * the exact-Jaccard verify + best-match ranking as a plain batch
    * projection of the sink — the `foreachBatch` post-step a production
    * ingest would run before routing a duplicate away.
    *
    * Stream side is STATELESS by design (map + explode + static joins, no
    * watermark, no streaming aggregation): a candidate pair that agrees in
    * several bands emits several rows, and the batch-side `distinct`
    * collapses them — pushing that dedup into the stream would be a
    * second stateful operator for zero semantic gain. The in-stream static
    * side (the band index) is cached and materialized BEFORE the replay
    * starts, the [[enrichJoin]] rule — Spark re-plans the static side of a
    * stream-static join every micro-batch. The corpus shingle sets feed
    * only the post-drain batch verify and are derived candidate-filtered
    * there (r15).
    *
    * Same candidates, same verify, same ranking ⇒ hash-identical to the
    * batch forms; shares [[graft.operators.Dedup.dedupIncrementalOracleSql]].
    * At 100 TB the stream side scales with the batch (the one-sided-probe
    * argument of the batch gate). This HARNESS caches and pre-counts the
    * whole index and drains candidates (with their shingle arrays) to a
    * memory sink so the replay is deterministic and the verify is
    * observable; a production deployment would instead probe the
    * (band, bkt)-partitioned index UNCACHED — the equi-join's keys prune
    * the index read to the probed cells — and run the verify inside
    * `foreachBatch` (the shape [[dedupLshIncrementalStream]] exercises,
    * with maintenance interleaved). */
  def dedupLshIndex(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    import graft.operators.Dedup
    val isBatch = col("doc_id") % Dedup.IncrementalBatchMod === 3L
    // the in-stream static side, materialized before the stream starts
    // (the enrichJoin rule — Spark re-plans the static side of a
    // stream-static join every micro-batch). The corpus shingle sets are
    // NOT pre-built any more: they feed only the post-drain batch verify,
    // which now derives sets for the candidate targets alone (the §3.2
    // semi-join prefilter the maintenance gates use — hashing the whole
    // corpus up front was this gate's single biggest block, r15).
    val index = spark.read.parquet(s"${Dedup.bandIndexTable(spark, sfDir)}/rows")
      .select(col("doc_id").as("dup_of"), col("band"), col("bkt"),
        col("bandSig")).cache()
    index.count()
    try {
      val path = s"$sfDir/documents.parquet"
      val schema = spark.read.parquet(path).schema
      val docsStream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", Int.MaxValue)
        .parquet(s"$sfDir/document[s].parquet")
        .filter(isBatch)
        .select(col("doc_id"), col("text"))
      val cand = Dedup.bandProbeRows(docsStream)
        .join(index, Seq("band", "bkt", "bandSig"))
        .select(col("doc_id").as("new_id"), col("shh"), col("dup_of"))
      // drain the stateless probe stream, then verify + rank in batch;
      // target sets derived for the candidates only (isBatch targets are
      // excluded exactly as the former whole-corpus frame did)
      val drained = runToMemory(spark, cand)
      val candTargets = drained.select(col("dup_of").as("doc_id")).distinct()
      val corpusSets = Dedup.docShingleHashesOf(
          graft.operators.Tables.documents(spark, sfDir)
            .join(broadcast(candTargets), "doc_id"))
        .filter(!isBatch && size(col("shh")) > 0)
        .select(col("doc_id").as("dup_of"), col("shh").as("corpus_shh"))
      val verified = drained
        .select(col("new_id"), col("shh"), col("dup_of")).distinct()
        .join(corpusSets, "dup_of")
        .select(col("new_id"), col("dup_of"),
          (size(array_intersect(col("shh"), col("corpus_shh"))).cast("double") /
            size(array_union(col("shh"), col("corpus_shh"))).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id")).orderBy(col("jaccard").desc, col("dup_of"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id"))
      verified
        .withColumn("rn", row_number().over(w))
        .withColumn("n_matches", count(lit(1)).over(wAll))
        .filter(col("rn") === 1)
        .select(col("new_id").as("doc_id"), col("dup_of"), col("jaccard"),
          col("n_matches"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
    } finally index.unpersist(false)
  }

  /** MULTI-TRIGGER streaming dedup with INTERLEAVED index maintenance —
    * the production daily-ingest loop [[dedupLshIndex]] only approximates
    * (verdict r12 task 3): probe micro-batch N against the maintained
    * band index, then [[graft.operators.Dedup.bandIndexUpsert]] batch N
    * INTO the index, then probe batch N+1 — which may near-dup against
    * batch N's documents, not just the base corpus. The replay splits the
    * batch tranche into [[graft.operators.Dedup.StreamDedupMicroBatches]]
    * ordered micro-batches (`doc_id mod 3`; one landing file each,
    * strictly increasing modification times so the file source replays
    * them oldest-first, `maxFilesPerTrigger = 1` so each is its own
    * trigger), runs probe-then-upsert inside `foreachBatch`, and applies
    * the shared exact-Jaccard verify + best-match ranking batch-side over
    * the accumulated candidates.
    *
    * The gate clones the memoized corpus index before mutating it (other
    * gates share the per-JVM memo). Result ≡ the sequential batch
    * recompute [[graft.operators.Dedup.dedupIncrementalMulti]] — "probe
    * batch m against corpus ∪ batches < m" — because band rows are a pure
    * per-document function and each upsert adds exactly the prior batches'
    * rows; Round13OpsSpec pins the identity plus cross-batch detection on
    * a constructed fixture, and the gate shares the DuckDB twin
    * [[graft.operators.Dedup.dedupIncrementalMultiOracleSql]]. At 100 TB
    * each trigger's probe is the one-sided index join (batch-bounded) and
    * each upsert rewrites only touched cells via the doc→cells sidecar —
    * the loop's cost per day is O(|day|), independent of corpus size.
    *
    * Bench wall (r13, sf0.1, local[4]: ~17 s — the surface's heaviest
    * gate, BY DESIGN): it prices one index clone, three landing writes,
    * three streaming triggers (~1.2 s micro-batch machinery each), three
    * probes AND three full [[graft.operators.Dedup.bandIndexUpsert]]s. At
    * gate scale each ~1,500-doc micro-batch's 16·|batch| band rows hash
    * into ALL 128 (band, bkt) cells, so every upsert rewrites the whole
    * rows/ table — the honest cost of a cell grid sized for the corpus; a
    * 100 TB deployment's thousands-of-cells grid localizes each day's
    * rewrite to the touched fraction (the same argument as the IVF codes
    * table). The single-trigger probe-only twin (`stream_dedup_lsh`,
    * ~3 s) isolates what the maintenance loop adds. */
  /** Write the multi-trigger gates' per-micro-batch landing files in ONE
    * Spark job (r15: one filter+coalesce(1) write job per micro-batch cost
    * ~0.5 s per gate run): partition the tranche by the micro-batch key,
    * hash-repartition so each micro-batch's rows land in exactly one task
    * (⇒ exactly one parquet file per `__mb=` directory), then move each
    * directory's file to `landing/mb$m.parquet` with the strictly
    * increasing modification times the file source's oldest-first replay
    * contract needs. Row order within a file may differ from the former
    * per-batch coalesce(1) writes; no gate result depends on file row
    * order (probes are joins, verifies are distinct/window pipelines). */
  private def writeLandingFiles(docs: org.apache.spark.sql.DataFrame,
      mb: org.apache.spark.sql.Column, nMb: Int,
      landing: java.io.File): Unit = {
    val tmp = new java.io.File(landing.getParentFile, "landing-tmp")
    docs.withColumn("__mb", mb.cast("int"))
      .repartition(nMb, col("__mb"))
      .write.partitionBy("__mb").parquet(tmp.toString)
    val t0 = landing.lastModified()
    (0 until nMb).foreach { m =>
      val dir = new java.io.File(tmp, s"__mb=$m")
      val dst = new java.io.File(landing, s"mb$m.parquet")
      Option(dir.listFiles())
        .flatMap(_.find(_.getName.endsWith(".parquet"))) match {
        case Some(part) => java.nio.file.Files.move(part.toPath, dst.toPath)
        case None =>
          // a residue class with zero rows (small or custom corpus): write
          // an empty landing file with the docs schema so the replay still
          // runs an (empty) trigger, matching the old per-batch
          // coalesce(1) behavior — aborting here turned a data-shape
          // quirk into a gate failure (ADVICE r15)
          docs.limit(0).coalesce(1).write.mode("overwrite")
            .parquet(s"$tmp/__mb_empty_$m")
          val empty = new java.io.File(tmp, s"__mb_empty_$m").listFiles()
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"empty-landing write for micro-batch $m " +
              "produced no parquet file"))
          java.nio.file.Files.move(empty.toPath, dst.toPath)
      }
      require(dst.setLastModified(t0 + m * 60000L))
    }
    graft.io.Storage.deleteRecursively(tmp)
  }

  def dedupLshIncrementalStream(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = replayLock.synchronized {
    import graft.operators.Dedup
    val nMb = Dedup.StreamDedupMicroBatches
    val isBatch = col("doc_id") % Dedup.IncrementalBatchMod === 3L
    val work = java.nio.file.Files.createTempDirectory("graft-streamidx")
    val workDir = work.toString
    val indexDir = s"$workDir/index"
    try {
      // clone the memoized corpus index — this gate MUTATES its copy.
      // Hard links, not a byte copy: maintenance replaces whole files, so
      // the memo's inodes are never written through (Storage
      // .cloneWithHardLinks scaladoc; the byte copy cost ~2.6 s/run, r15)
      graft.io.Storage.cloneWithHardLinks(
        new java.io.File(Dedup.bandIndexTable(spark, sfDir)),
        new java.io.File(indexDir))
      // one landing file per micro-batch, modTimes 1 minute apart —
      // written in ONE job ([[writeLandingFiles]])
      val docsB = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(isBatch).select(col("doc_id"), col("text"))
      val landing = new java.io.File(workDir, "landing")
      landing.mkdirs()
      writeLandingFiles(docsB, pmod(col("doc_id"), lit(nMb.toLong)), nMb,
        landing)
      val candDir = s"$workDir/cands"
      val ckpt = checkpointRoot.map(r => s"$r/graft_stream_dedup_multi_" +
        s"${runId.incrementAndGet()}-${java.util.UUID.randomUUID().toString.take(8)}")
      ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      try {
        val schema = docsB.schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$landing/mb*.parquet")
        val writer = stream.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val docs = batch.select(col("doc_id"), col("text"))
            // band rows derived ONCE per trigger and shared by the probe
            // and the upsert (each formerly re-ran shingle+minhash, r15)
            val probeRows = Dedup.bandProbeRows(docs).persist()
            // probe FIRST (against the index as of the previous batch) …
            probeRows
              .join(spark.read.parquet(s"$indexDir/rows")
                  .select(col("doc_id").as("dup_of"), col("band"),
                    col("bkt"), col("bandSig")),
                Seq("band", "bkt", "bandSig"))
              .select(col("doc_id").as("new_id"), col("shh"), col("dup_of"))
              .write.mode("append").parquet(candDir)
            // … then MAINTAIN, so the next trigger sees this batch
            Dedup.bandIndexUpsert(spark, indexDir, docs,
              preRows = Some(probeRows.drop("shh")))
            probeRows.unpersist(false)
            ()
          }
          .trigger(Trigger.AvailableNow())
        ckpt.foreach(writer.option("checkpointLocation", _))
        val q = writer.start()
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == nMb,
          s"multi-trigger invariant: expected $nMb data micro-batches, " +
            s"got $dataBatches — the probe-upsert interleave was not exercised")
      } finally ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      // batch-side verify + rank over the accumulated candidates: targets
      // may be corpus docs OR earlier-batch docs, so the verify joins the
      // full shingle-set table
      val candSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("new_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("shh",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.StructField("dup_of",
          org.apache.spark.sql.types.LongType)))
      new java.io.File(candDir).mkdirs()
      val drained = spark.read.schema(candSchema).parquet(candDir)
      // semi-join prefilter (guide §3.2 shape): only CANDIDATE targets'
      // shingle sets are derived — hashing the whole corpus and joining
      // away all but a few hundred rows was the verify's dominant cost
      // (r15). Filter-then-hash ≡ hash-then-filter: the kernel is per-row
      // pure, so surviving rows carry identical sets.
      val candTargets = drained.select(col("dup_of").as("doc_id")).distinct()
      val targetSets = Dedup.docShingleHashesOf(
          graft.operators.Tables.documents(spark, sfDir)
            .join(broadcast(candTargets), "doc_id"))
        .filter(size(col("shh")) > 0)
        .select(col("doc_id").as("dup_of"), col("shh").as("corpus_shh"))
      val verified = drained
        .select(col("new_id"), col("shh"), col("dup_of")).distinct()
        .join(targetSets, "dup_of")
        .select(col("new_id"), col("dup_of"),
          (size(array_intersect(col("shh"), col("corpus_shh"))).cast("double") /
            size(array_union(col("shh"), col("corpus_shh"))).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id")).orderBy(col("jaccard").desc, col("dup_of"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id"))
      verified
        .withColumn("rn", row_number().over(w))
        .withColumn("n_matches", count(lit(1)).over(wAll))
        .filter(col("rn") === 1)
        .select(col("new_id").as("doc_id"), col("dup_of"), col("jaccard"),
          col("n_matches"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
    } finally graft.io.Storage.deleteRecursively(work.toFile)
  }

  /** PRUNED-REGIME streaming dedup maintenance — the flagship
    * [[dedupLshIncrementalStream]] demonstrates the full-grid WORST case
    * (its ~|corpus|/33-doc micro-batches band into all 128 cells, so
    * every upsert rewrites the whole rows/ table); this twin demonstrates
    * the regime the sidecar exists FOR (verdict r13 task 4): a FIXED
    * 10-document tranche (the smallest batch-tranche ids — a "few
    * re-crawled docs today" daily batch) in 2 ordered micro-batches of 5,
    * probe-then-upsert per trigger. Five docs emit ≤80 band rows, so each
    * upsert touches ≈60 of the 128 (band, bkt) cells at ANY sf — and the
    * gate REQUIRES, from the existing-rows scan's own physical plan
    * ([[graft.operators.Dedup.bandIndexUpsert]]'s scanAudit: partition
    * count after PartitionFilters vs the table's partition count), that
    * every trigger read a strict subset of the grid and no more
    * partitions than the touched-cell list. The 100 TB claim ("a daily
    * batch rewrites only its own cells") is thereby asserted on the
    * maintenance path at runtime, not just in an off-path spec.
    *
    * Semantics mirror the flagship exactly (probe against corpus ∪
    * earlier batches, exact-Jaccard verify, best-match window); only the
    * tranche differs, and the DuckDB twin
    * [[graft.operators.Dedup.dedupLshPrunedStreamOracleSql]] narrows the
    * candidate restriction accordingly. The 10-id driver collect is
    * bounded by construction ([[graft.operators.Dedup
    * .StreamDedupPrunedDocs]]). */
  def dedupLshPrunedStream(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = replayLock.synchronized {
    import graft.operators.Dedup
    val nMb = Dedup.StreamDedupPrunedBatches
    val perBatch = Dedup.StreamDedupPrunedDocs / nMb
    val work = java.nio.file.Files.createTempDirectory("graft-streamprn")
    val workDir = work.toString
    val indexDir = s"$workDir/index"
    try {
      // hard-link clone, not a byte copy (Storage.cloneWithHardLinks
      // scaladoc; same rationale as the flagship, r15)
      graft.io.Storage.cloneWithHardLinks(
        new java.io.File(Dedup.bandIndexTable(spark, sfDir)),
        new java.io.File(indexDir))
      val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
      val trancheIds = docsAll
        .filter(col("doc_id") % Dedup.IncrementalBatchMod === 3L)
        .select(col("doc_id")).orderBy(col("doc_id"))
        .limit(Dedup.StreamDedupPrunedDocs)
        .collect().map(_.getLong(0)) // bounded: 10 ids by construction
      val landing = new java.io.File(workDir, "landing")
      landing.mkdirs()
      // micro-batch = position-group within the sorted tranche (the fixed
      // grouped(perBatch) split), written in ONE job via a CASE key
      val mbOfId = trancheIds.grouped(perBatch).zipWithIndex.flatMap {
        case (ids, m) => ids.map(_ -> m)
      }.toSeq
      val mbCase = mbOfId.foldRight(lit(-1)) { case ((id, m), acc) =>
        when(col("doc_id") === id, m).otherwise(acc)
      }
      writeLandingFiles(
        docsAll.filter(col("doc_id").isin(trancheIds.map(Long.box): _*))
          .select(col("doc_id"), col("text")),
        mbCase, nMb, landing)
      val candDir = s"$workDir/cands"
      val ckpt = checkpointRoot.map(r => s"$r/graft_stream_dedup_prn_" +
        s"${runId.incrementAndGet()}-${java.util.UUID.randomUUID().toString.take(8)}")
      ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      // per-trigger (partitions read, partitions total, touched cells)
      val audits =
        scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      try {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$landing/mb*.parquet")
        val writer = stream.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val docs = batch.select(col("doc_id"), col("text"))
            // band rows derived ONCE per trigger, shared by probe + upsert
            // (each formerly re-ran shingle+minhash over the batch, r15)
            val probeRows = Dedup.bandProbeRows(docs).persist()
            // the PROBE's index read is partition-pruned to the batch's
            // own (band, bkt) cells — an equi-join on (band, bkt, bandSig)
            // can only match inside them, and THIS gate's batches touch a
            // strict subset of the grid (≤16·|batch| cells; bounded
            // collect — 5 docs ⇒ ≤80 cells). The flagship keeps the full
            // read: its corpus-sized batches band into every cell.
            val probeCells = probeRows.select(col("band"), col("bkt"))
              .distinct().collect()
              .map(r => (r.getInt(0), r.getInt(1)))
            val probePred = probeCells
              .map { case (b, k) => col("band") === b && col("bkt") === k }
              .reduceOption(_ || _).getOrElse(lit(false))
            // probe FIRST (index as of the previous batch) …
            probeRows
              .join(spark.read.parquet(s"$indexDir/rows").filter(probePred)
                  .select(col("doc_id").as("dup_of"), col("band"),
                    col("bkt"), col("bandSig")),
                Seq("band", "bkt", "bandSig"))
              .select(col("doc_id").as("new_id"), col("shh"), col("dup_of"))
              .write.mode("append").parquet(candDir)
            // … then MAINTAIN, with the scan audited from its own plan
            var scan: Option[(Int, Int)] = None
            val touched = Dedup.bandIndexUpsert(spark, indexDir, docs,
              scanAudit = Some((read, total) => scan = Some((read, total))),
              preRows = Some(probeRows.drop("shh")))
            probeRows.unpersist(false)
            audits.synchronized {
              audits += ((scan.get._1, scan.get._2, touched.size)); ()
            }
            ()
          }
          .trigger(Trigger.AvailableNow())
        ckpt.foreach(writer.option("checkpointLocation", _))
        val q = writer.start()
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == nMb,
          s"multi-trigger invariant: expected $nMb data micro-batches, " +
            s"got $dataBatches")
      } finally ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      // THE gate's claim: every trigger's existing-rows scan was pruned
      // to at most the touched cells and to a strict subset of the grid
      val auditList = audits.synchronized(audits.toList)
      auditList.foreach { case (read, total, touchedN) =>
        require(read > 0 && read <= touchedN && read < total,
          s"sidecar pruning not demonstrated: scan read $read of $total " +
            s"partitions for $touchedN touched cells")
      }
      // batch-side verify + rank over the accumulated candidates (the
      // flagship's shape verbatim)
      val candSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("new_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("shh",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.StructField("dup_of",
          org.apache.spark.sql.types.LongType)))
      new java.io.File(candDir).mkdirs()
      val drained = spark.read.schema(candSchema).parquet(candDir)
      // candidate-filtered target sets — the flagship's §3.2 semi-join
      // prefilter verbatim (r15)
      val candTargets = drained.select(col("dup_of").as("doc_id")).distinct()
      val targetSets = Dedup.docShingleHashesOf(
          graft.operators.Tables.documents(spark, sfDir)
            .join(broadcast(candTargets), "doc_id"))
        .filter(size(col("shh")) > 0)
        .select(col("doc_id").as("dup_of"), col("shh").as("corpus_shh"))
      val verified = drained
        .select(col("new_id"), col("shh"), col("dup_of")).distinct()
        .join(targetSets, "dup_of")
        .select(col("new_id"), col("dup_of"),
          (size(array_intersect(col("shh"), col("corpus_shh"))).cast("double") /
            size(array_union(col("shh"), col("corpus_shh"))).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id")).orderBy(col("jaccard").desc, col("dup_of"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("new_id"))
      verified
        .withColumn("rn", row_number().over(w))
        .withColumn("n_matches", count(lit(1)).over(wAll))
        .filter(col("rn") === 1)
        .select(col("new_id").as("doc_id"), col("dup_of"), col("jaccard"),
          col("n_matches"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
    } finally graft.io.Storage.deleteRecursively(work.toFile)
  }

  /** MULTI-TRIGGER streaming ANN index maintenance — the
    * [[dedupLshIncrementalStream]] loop mirrored onto the similarity
    * family (verdict r13 task 3, the last dedup/similarity asymmetry):
    * the ~2% [[graft.operators.Similarity.IvfPqUpsertMod]] late-arrival
    * vectors stream in [[graft.operators.Similarity.StreamAnnMicroBatches]]
    * ordered micro-batches (`vec_id mod 3`, one landing file each,
    * strictly increasing modification times, `maxFilesPerTrigger = 1`);
    * each trigger PROBES the maintained index first (the full shared
    * [[graft.operators.Similarity.ivfPqQuery]] over the index as of the
    * previous trigger — a real query against a half-maintained store,
    * not a row count), then
    * [[graft.operators.Similarity.ivfPqUpsertCodes]] encodes the batch
    * with the EXISTING codebooks and rewrites only touched cells +
    * sidecar buckets. The gate clones the memoized PRE-upsert base index
    * ([[graft.operators.Similarity.ivfPqBaseIndexTable]]) — other gates
    * share the per-JVM memo and this one mutates its copy.
    *
    * Runtime invariants (fail the gate, not just a spec): exactly nMb
    * data micro-batches ran; the codes table grew STRICTLY across
    * triggers (each probe observed a different index state — the
    * interleave was real); every in-stream probe returned the full
    * k·nQueries rows. Evidence source for the strict-growth check (r16):
    * the codes table's committed row count is read per trigger from the
    * parquet file FOOTERS ([[graft.io.Storage.parquetRowCountFromFooters]]
    * — the identical number a full `count()` scan returns, pinned by
    * StorageSpec) instead of scheduling a full-table count job per
    * trigger; the invariant is still measured from the real files each
    * upsert committed, never assumed from the upsert's own bookkeeping.
    *
    * Result: the final probe over the fully-maintained index. Encoding
    * is a pure per-vector function of the FIXED base-fit codebooks and
    * batch ids are disjoint, so upserting the tranche in 3 batches lands
    * the exact index state of [[graft.operators.Similarity
    * .annIvfPqUpsert]]'s one-shot upsert — the gate shares its DuckDB
    * twin (base-filtered fit CTEs, full-corpus encode), and
    * Round14OpsSpec pins frame-parity with the batch recompute. At
    * 100 TB each trigger's cost is O(|day|): probe = nProbe pruned list
    * scans, upsert = touched-cell rewrite via the id→cell sidecar. */
  def annIvfPqIncrementalStream(spark: SparkSession, sfDir: String,
      k: Int = 5, nProbe: Int = 2,
      nQueries: Int = 8): DataFrame = replayLock.synchronized {
    import graft.operators.Similarity
    val nMb = Similarity.StreamAnnMicroBatches
    val work = java.nio.file.Files.createTempDirectory("graft-streamann")
    val workDir = work.toString
    val indexDir = s"$workDir/index"
    // the cleaned vector frame is consumed by the landing write, every
    // per-trigger probe's re-rank join, and the final probe — persist it
    // for the gate's run (released in the finally below) instead of
    // re-deriving the embeddings parse + norm per consumer (r16)
    val e = Similarity.vectors(spark, sfDir).persist()
    try {
      // clone the memoized base (pre-upsert) index — this gate MUTATES it.
      // Hard links, not a byte copy (Storage.cloneWithHardLinks scaladoc;
      // the byte copy cost ~1.8 s/run, r15)
      graft.io.Storage.cloneWithHardLinks(
        new java.io.File(Similarity.ivfPqBaseIndexTable(spark, sfDir)),
        new java.io.File(indexDir))
      val late = e.filter(col("vec_id") % Similarity.IvfPqUpsertMod === 1L)
      // one landing file per micro-batch, modTimes 1 minute apart so the
      // file source replays them oldest-first — ONE job
      // ([[writeLandingFiles]])
      val landing = new java.io.File(workDir, "landing")
      landing.mkdirs()
      writeLandingFiles(late, pmod(col("vec_id"), lit(nMb.toLong)), nMb,
        landing)
      val ckpt = checkpointRoot.map(r => s"$r/graft_stream_ann_" +
        s"${runId.incrementAndGet()}-${java.util.UUID.randomUUID().toString.take(8)}")
      ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      // (codes rows BEFORE the trigger's upsert, in-stream probe rows) —
      // appended on the driver by foreachBatch, read after the drain
      val trigStats = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      // the probe's query-vector set is FIXED across triggers — collect it
      // once here instead of once per trigger (r15; ivfPqQuery's qsPre).
      // Ditto the codebooks (r16): coarse/books are IMMUTABLE under upsert
      // (FAISS add-time semantics — the upsert itself leans on this), so
      // the per-trigger readIvfPqIndex driver collects are hoisted out of
      // the loop; only the CODES read — the part the upsert mutates — is
      // re-opened per trigger, so each probe still sees the index state
      // the previous trigger committed.
      val qsPre = Similarity.collectQueries(e, nQueries)
      val (coarse, books, _) = Similarity.readIvfPqIndex(spark, indexDir)
      val hconf = spark.sparkContext.hadoopConfiguration
      try {
        val stream = spark.readStream.schema(late.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$landing/mb*.parquet")
        val writer = stream.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val vecs = batch.select(col("vec_id"), col("v"))
            // probe FIRST (index as of the previous trigger) …
            val codes = spark.read.parquet(s"$indexDir/codes")
              .select(col("vec_id"), col("cl"), col("codes"))
            val probed = Similarity.ivfPqQuery(
              e, coarse, books, codes, k, nProbe, nQueries, Some(qsPre))
            // the strict-growth evidence is the codes table's committed
            // row count, read from the parquet FOOTERS (r16): the same
            // number a full count() scan returns — StorageSpec pins the
            // equality — measured from the real files the upsert wrote,
            // without materializing the full table 3× per run
            trigStats.synchronized {
              trigStats += ((graft.io.Storage.parquetRowCountFromFooters(
                hconf, s"$indexDir/codes"), probed.count())); ()
            }
            // … then MAINTAIN, so the next trigger sees this batch —
            // codebooks are immutable under upsert, so the hoisted read
            // is passed through instead of re-collected (r15)
            Similarity.ivfPqUpsertCodes(spark, indexDir, vecs,
              preBooks = Some((coarse, books)))
            ()
          }
          .trigger(Trigger.AvailableNow())
        ckpt.foreach(writer.option("checkpointLocation", _))
        val q = writer.start()
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == nMb,
          s"multi-trigger invariant: expected $nMb data micro-batches, " +
            s"got $dataBatches — the probe-upsert interleave was not exercised")
      } finally ckpt.foreach(c =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c)))
      val stats = trigStats.synchronized(trigStats.toList)
      require(stats.map(_._1) == stats.map(_._1).sorted &&
        stats.map(_._1).distinct.size == stats.size,
        s"codes table must grow strictly across triggers, saw ${stats.map(_._1)}")
      require(stats.forall(_._2 == k.toLong * nQueries),
        s"every in-stream probe must return k*nQueries=${k * nQueries} " +
          s"rows, saw ${stats.map(_._2)}")
      // final probe over the fully-maintained index ≡ the batch recompute
      // (codebooks are the hoisted immutable pair; only codes re-read)
      val codesFinal = spark.read.parquet(s"$indexDir/codes")
        .select(col("vec_id"), col("cl"), col("codes"))
      Similarity.ivfPqQuery(e, coarse, books, codesFinal, k,
          nProbe, nQueries, Some(qsPre))
        .localCheckpoint(true)
    } finally {
      e.unpersist(false)
      graft.io.Storage.deleteRecursively(work.toFile)
    }
  }
}
