package graft

import org.apache.spark.sql.SparkSession

/** Runtime configuration with the reference's resolution chain
  * (/root/reference/src/config/sources.rs:17-29, env_overrides.rs:17-112,
  * mod.rs:23-183, validation.rs:9-113):
  *
  *   1. environment variables (`GRAFT_*` prefix) — highest priority
  *   2. config file named by `GRAFT_CONFIG`
  *   3. inline TOML content in `GRAFT_CONFIG_CONTENT`
  *   4. default config files `./config.toml`, `./.graft.toml`
  *   5. built-in defaults — lowest priority
  *
  * The knob set maps the reference's onto this engine's actual surface:
  * batch thresholds (rows/bytes/age — [[graft.streaming.OtlpStream.serviceBatcher]]'s
  * flush predicate), payload limit ([[graft.io.OtlpRead]] fail-fast /
  * [[graft.streaming.OtlpStream]] skip+count), writer knobs
  * (maxRecordsPerFile on every parquet sink, streaming trigger interval,
  * maxFilesPerTrigger pull-throttle), and the fs/S3/R2 storage backend
  * ([[graft.io.Storage]] wires the Hadoop s3a connector).
  *
  * Files are TOML — parsed by a minimal subset parser ([[Config.parseToml]]:
  * `[section]` tables, `key = value` with string/integer/boolean values,
  * `#` comments), which covers the reference's entire config.example.toml
  * shape without an external dependency (none is available offline).
  */
object Config {

  val EnvPrefix = "GRAFT_"

  case class BatchConfig(
      maxRows: Long = 200000L,
      maxBytes: Long = 128L * 1024 * 1024,
      maxAgeSecs: Long = 10L,
      enabled: Boolean = true)

  case class RequestConfig(maxPayloadBytes: Long = 8L * 1024 * 1024)

  /** Engine-side writer/stream knobs (the repo's own operational surface —
    * the reference folds these into its batch writer). */
  case class WriterConfig(
      maxRecordsPerFile: Long = 200000L,
      triggerIntervalSecs: Long = 10L,
      maxFilesPerTrigger: Int = 1000,
      /** Stamp `graft.schema_version` into the footers of the files each
        * ingest run just wrote ([[graft.io.FooterStamp]]). Off by default:
        * the stamp is a second sequential read+write of every new file. */
      footerStamp: Boolean = false,
      /** Shuffle/state partitions for the replay gates' stateful streaming
        * queries ([[graft.streaming.StreamGate]]). Each stateful operator
        * pays one state store per partition per micro-batch; the default 8
        * is the measured sweet spot for gate-scale key spaces
        * (hundreds-to-thousands of keys — StreamPartProbe, SCALE.md).
        * Production deployments size this to key cardinality. */
      streamStatePartitions: Int = 8,
      /** Checkpoint root for the replay gates' ephemeral streaming
        * checkpoints ([[graft.streaming.StreamGate]]). Empty = auto: use
        * `/dev/shm/graft-stream-ckpt` when a writable tmpfs exists (kept
        * for deterministic cleanup, not speed — measured a wash vs disk),
        * else Spark's temp default. Production checkpoints go to durable
        * storage via the ingest path, not this knob. */
      streamCheckpointRoot: String = "",
      /** Elide the no-data watermark-flush micro-batch for the BY-ALGEBRA
        * replay gates (`stream_red`, `stream_hist`): their merge-commutative
        * window state is drained in UPDATE mode (no stream-side watermark —
        * all final rows emit in the data batch) and the append-mode
        * "windows the watermark closed" subset is applied as a
        * deterministic post-filter. Output is row-identical (probe-asserted
        * parity, StreamFlushProbe) and each replay saves one WAL'd
        * micro-batch — measured 0.16-0.21 s per gate (14-16%) at sf0.1.
        * `false` restores the append+watermark form (the immutable-log-sink
        * shape the other replay gates keep exercising). */
      streamElideFlush: Boolean = true)

  case class S3Config(
      bucket: String = "",
      region: String = "",
      endpoint: Option[String] = None,
      prefix: Option[String] = None,
      // captured from the env map at load time (AWS standard variables,
      // unprefixed) so applyStorage never reaches back into the process env
      accessKeyId: String = "",
      secretAccessKey: String = "")

  case class R2Config(
      bucket: String = "",
      accountId: String = "",
      accessKeyId: String = "",
      secretAccessKey: String = "",
      endpoint: Option[String] = None,
      prefix: Option[String] = None)

  case class StorageConfig(
      backend: String = "fs", // fs | s3 | r2 (aliases: filesystem, aws)
      path: String = "./data",
      s3: S3Config = S3Config(),
      r2: R2Config = R2Config())

  case class GraftConfig(
      batch: BatchConfig = BatchConfig(),
      request: RequestConfig = RequestConfig(),
      writer: WriterConfig = WriterConfig(),
      storage: StorageConfig = StorageConfig()) {

    /** Output root for the configured backend: `file` path, or
      * `s3a://bucket[/prefix]` for s3/r2 (both ride the s3a connector).
      * Prefix joining delegates to [[graft.io.Storage.root]] — one owner for
      * the slash-normalization rule. */
    def outputRoot: String = storage.backend match {
      case "fs" => storage.path
      case "s3" =>
        graft.io.Storage.root(s"s3a://${storage.s3.bucket}",
          storage.s3.prefix.map(_.stripSuffix("/")))
      case "r2" =>
        graft.io.Storage.root(s"s3a://${storage.r2.bucket}",
          storage.r2.prefix.map(_.stripSuffix("/")))
    }

    /** Wire the storage backend into the session's Hadoop conf (no-op for
      * fs). R2 derives the account endpoint + path-style access, the
      * reference's R2 rule. */
    def applyStorage(spark: SparkSession): Unit = storage.backend match {
      case "fs" => ()
      case "s3" =>
        graft.io.Storage.configureS3(spark,
          accessKey = storage.s3.accessKeyId,
          secretKey = storage.s3.secretAccessKey,
          endpoint = storage.s3.endpoint,
          region = Option(storage.s3.region).filter(_.nonEmpty))
      case "r2" =>
        graft.io.Storage.configureS3(spark,
          accessKey = storage.r2.accessKeyId,
          secretKey = storage.r2.secretAccessKey,
          endpoint = storage.r2.endpoint
            .orElse(Some(s"https://${storage.r2.accountId}.r2.cloudflarestorage.com")),
          pathStyleAccess = true)
    }
  }

  /** Load with the full resolution chain from the real environment/cwd. */
  def load(): GraftConfig = load(sys.env, new java.io.File("."))

  /** Testable entry point: explicit env map and default-file directory. */
  def load(env: Map[String, String], cwd: java.io.File): GraftConfig = {
    var c = GraftConfig()
    fileConfig(env, cwd).foreach(toml => c = applyToml(c, toml))
    c = applyEnvOverrides(c, env)
    validate(c)
    c
  }

  /** Locate the file layer: GRAFT_CONFIG path (hard error if unreadable —
    * an explicitly named file must exist), else GRAFT_CONFIG_CONTENT inline,
    * else the first default file present. */
  private def fileConfig(env: Map[String, String],
      cwd: java.io.File): Option[Map[String, String]] = {
    env.get(s"${EnvPrefix}CONFIG") match {
      case Some(path) =>
        val f = new java.io.File(path)
        if (!f.isFile)
          throw new IllegalArgumentException(s"config file not readable: $path")
        return Some(parseToml(readFile(f), path))

      case None => ()
    }
    env.get(s"${EnvPrefix}CONFIG_CONTENT") match {
      case Some(content) =>
        return Some(parseToml(content, s"${EnvPrefix}CONFIG_CONTENT"))
      case None => ()
    }
    Seq("config.toml", ".graft.toml").iterator
      .map(new java.io.File(cwd, _))
      .find(_.isFile)
      .map(f => parseToml(readFile(f), f.getPath))
  }

  private def readFile(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Minimal TOML subset → flat `section.key -> raw value` map. Supports
    * `[a]`/`[a.b]` tables, `key = value` (basic string, integer, boolean),
    * full-line and trailing `#` comments (quote-aware). Anything else —
    * arrays, multi-line strings, inline tables — is a parse error: better a
    * loud failure than a silently-ignored knob. */
  private[graft] def parseToml(content: String, where: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var section = ""
    content.linesIterator.zipWithIndex.foreach { case (rawLine, i) =>
      val line = stripComment(rawLine).trim
      def fail(msg: String) = throw new IllegalArgumentException(
        s"$where:${i + 1}: $msg: ${rawLine.trim}")
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          if (!line.endsWith("]")) fail("malformed table header")
          section = line.substring(1, line.length - 1).trim
          if (section.isEmpty) fail("empty table name")
        } else {
          val eq = line.indexOf('=')
          if (eq < 1) fail("expected key = value")
          val key = line.substring(0, eq).trim
          val raw = line.substring(eq + 1).trim
          val value =
            if (raw.startsWith("\"")) {
              if (raw.length < 2 || !raw.endsWith("\"")) fail("unterminated string")
              val inner = raw.substring(1, raw.length - 1)
              // loud-failure contract: `"a" junk "` would otherwise parse as
              // `a" junk `; escapes are not part of the supported subset, so
              // a backslash is rejected rather than silently passed through
              if (inner.contains('"')) fail("embedded quote in string value")
              if (inner.contains('\\')) fail("backslash escapes unsupported (subset syntax)")
              inner
            } else if (raw == "true" || raw == "false") raw
            else if (raw.nonEmpty && raw.matches("-?[0-9_]+")) raw.replace("_", "")
            else fail("unsupported value (subset: string, integer, boolean)")
          val full = if (section.isEmpty) key else s"$section.$key"
          out(full) = value
        }
      }
    }
    out.toMap
  }

  private def stripComment(line: String): String = {
    var inString = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') inString = !inString
      else if (ch == '#' && !inString) return line.substring(0, i)
      i += 1
    }
    line
  }

  /** Every file-layer key the engine understands (see [[applyToml]]);
    * anything else in a config file is a hard error — a typo'd knob must
    * not silently run on defaults (the same contract the subset parser
    * enforces for syntax). */
  private val KnownTomlKeys = Set(
    "batch.max_rows", "batch.max_bytes", "batch.max_age_secs", "batch.enabled",
    "request.max_payload_bytes",
    "writer.max_records_per_file", "writer.trigger_interval_secs",
    "writer.max_files_per_trigger", "writer.footer_stamp",
    "writer.stream_state_partitions", "writer.stream_elide_flush",
    "storage.backend", "storage.fs.path",
    "storage.s3.bucket", "storage.s3.region", "storage.s3.endpoint", "storage.s3.prefix",
    "storage.r2.bucket", "storage.r2.account_id", "storage.r2.access_key_id",
    "storage.r2.secret_access_key", "storage.r2.endpoint", "storage.r2.prefix")

  /** File layer: each present key overrides the default (missing keys keep
    * defaults — the reference's serde `#[serde(default)]` semantics);
    * unknown keys are rejected via [[KnownTomlKeys]]. */
  private def applyToml(c: GraftConfig, t: Map[String, String]): GraftConfig = {
    val unknown = t.keySet -- KnownTomlKeys
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown config keys: ${unknown.toSeq.sorted.mkString(", ")}")
    def long(k: String, cur: Long) = t.get(k).map(parseLong(k, _)).getOrElse(cur)
    def int(k: String, cur: Int) = t.get(k).map(parseInt(k, _)).getOrElse(cur)
    def bool(k: String, cur: Boolean) = t.get(k).map(parseBool(k, _)).getOrElse(cur)
    def str(k: String, cur: String) = t.getOrElse(k, cur)
    def opt(k: String, cur: Option[String]) = t.get(k).filter(_.nonEmpty).orElse(cur)
    c.copy(
      batch = c.batch.copy(
        maxRows = long("batch.max_rows", c.batch.maxRows),
        maxBytes = long("batch.max_bytes", c.batch.maxBytes),
        maxAgeSecs = long("batch.max_age_secs", c.batch.maxAgeSecs),
        enabled = bool("batch.enabled", c.batch.enabled)),
      request = c.request.copy(
        maxPayloadBytes = long("request.max_payload_bytes", c.request.maxPayloadBytes)),
      writer = c.writer.copy(
        maxRecordsPerFile = long("writer.max_records_per_file", c.writer.maxRecordsPerFile),
        triggerIntervalSecs = long("writer.trigger_interval_secs", c.writer.triggerIntervalSecs),
        maxFilesPerTrigger = int("writer.max_files_per_trigger", c.writer.maxFilesPerTrigger),
        footerStamp = bool("writer.footer_stamp", c.writer.footerStamp),
        streamStatePartitions =
          int("writer.stream_state_partitions", c.writer.streamStatePartitions),
        streamCheckpointRoot =
          str("writer.stream_checkpoint_root", c.writer.streamCheckpointRoot),
        streamElideFlush =
          bool("writer.stream_elide_flush", c.writer.streamElideFlush)),
      storage = c.storage.copy(
        backend = t.get("storage.backend").map(normalizeBackend).getOrElse(c.storage.backend),
        path = str("storage.fs.path", c.storage.path),
        s3 = c.storage.s3.copy(
          bucket = str("storage.s3.bucket", c.storage.s3.bucket),
          region = str("storage.s3.region", c.storage.s3.region),
          endpoint = opt("storage.s3.endpoint", c.storage.s3.endpoint),
          prefix = opt("storage.s3.prefix", c.storage.s3.prefix).map(normalizePrefix)),
        r2 = c.storage.r2.copy(
          bucket = str("storage.r2.bucket", c.storage.r2.bucket),
          accountId = str("storage.r2.account_id", c.storage.r2.accountId),
          accessKeyId = str("storage.r2.access_key_id", c.storage.r2.accessKeyId),
          secretAccessKey = str("storage.r2.secret_access_key", c.storage.r2.secretAccessKey),
          endpoint = opt("storage.r2.endpoint", c.storage.r2.endpoint),
          prefix = opt("storage.r2.prefix", c.storage.r2.prefix).map(normalizePrefix))))
  }

  /** Env layer (highest priority). Prefixed `GRAFT_*` knobs plus the raw
    * (unprefixed) AWS standard credential variables, exactly the reference's
    * split. `GRAFT_BATCHING_ENABLED` is honored as the legacy alias of
    * `GRAFT_BATCH_ENABLED` (canonical wins when both are set). */
  private[graft] def applyEnvOverrides(c0: GraftConfig,
      env: Map[String, String]): GraftConfig = {
    def get(k: String) = env.get(EnvPrefix + k)
    def long(k: String, cur: Long) = get(k).map(parseLong(EnvPrefix + k, _)).getOrElse(cur)
    def int(k: String, cur: Int) = get(k).map(parseInt(EnvPrefix + k, _)).getOrElse(cur)
    def str(k: String, cur: String) = get(k).getOrElse(cur)
    def opt(k: String, cur: Option[String]) = get(k).filter(_.nonEmpty).orElse(cur)

    var c = c0.copy(
      batch = c0.batch.copy(
        maxRows = long("BATCH_MAX_ROWS", c0.batch.maxRows),
        maxBytes = long("BATCH_MAX_BYTES", c0.batch.maxBytes),
        maxAgeSecs = long("BATCH_MAX_AGE_SECS", c0.batch.maxAgeSecs),
        enabled = get("BATCH_ENABLED").orElse(get("BATCHING_ENABLED"))
          .map(parseBool(s"${EnvPrefix}BATCH_ENABLED", _)).getOrElse(c0.batch.enabled)),
      request = c0.request.copy(
        maxPayloadBytes = long("MAX_PAYLOAD_BYTES", c0.request.maxPayloadBytes)),
      writer = c0.writer.copy(
        maxRecordsPerFile = long("MAX_RECORDS_PER_FILE", c0.writer.maxRecordsPerFile),
        triggerIntervalSecs = long("TRIGGER_INTERVAL_SECS", c0.writer.triggerIntervalSecs),
        maxFilesPerTrigger = int("MAX_FILES_PER_TRIGGER", c0.writer.maxFilesPerTrigger),
        footerStamp = get("FOOTER_STAMP")
          .map(parseBool(s"${EnvPrefix}FOOTER_STAMP", _))
          .getOrElse(c0.writer.footerStamp),
        streamStatePartitions =
          int("STREAM_STATE_PARTITIONS", c0.writer.streamStatePartitions),
        streamCheckpointRoot =
          str("STREAM_CHECKPOINT_ROOT", c0.writer.streamCheckpointRoot),
        streamElideFlush = get("STREAM_ELIDE_FLUSH")
          .map(parseBool(s"${EnvPrefix}STREAM_ELIDE_FLUSH", _))
          .getOrElse(c0.writer.streamElideFlush)))

    c = c.copy(storage = c.storage.copy(
      backend = get("STORAGE_BACKEND").map(normalizeBackend).getOrElse(c.storage.backend),
      path = str("STORAGE_PATH", c.storage.path),
      s3 = c.storage.s3.copy(
        bucket = str("S3_BUCKET", c.storage.s3.bucket),
        region = str("S3_REGION", c.storage.s3.region),
        endpoint = opt("S3_ENDPOINT", c.storage.s3.endpoint),
        // generic PREFIX wins over S3_PREFIX when both are set — the
        // reference applies PREFIX after S3_PREFIX (env_overrides.rs:82-88),
        // so a config migrated from it keeps the same resolved prefix
        prefix = opt("PREFIX", opt("S3_PREFIX", c.storage.s3.prefix)).map(normalizePrefix),
        // AWS standard variables, unprefixed (shared with the r2 branch)
        accessKeyId = env.getOrElse("AWS_ACCESS_KEY_ID", c.storage.s3.accessKeyId),
        secretAccessKey = env.getOrElse("AWS_SECRET_ACCESS_KEY", c.storage.s3.secretAccessKey)),
      r2 = c.storage.r2.copy(
        bucket = str("R2_BUCKET", c.storage.r2.bucket),
        accountId = str("R2_ACCOUNT_ID", c.storage.r2.accountId),
        // AWS standard variables are read UNprefixed, like the reference
        accessKeyId = env.getOrElse("AWS_ACCESS_KEY_ID", c.storage.r2.accessKeyId),
        secretAccessKey = env.getOrElse("AWS_SECRET_ACCESS_KEY", c.storage.r2.secretAccessKey),
        endpoint = env.get("AWS_ENDPOINT_URL").orElse(c.storage.r2.endpoint),
        prefix = opt("R2_PREFIX", c.storage.r2.prefix).map(normalizePrefix))))
    c
  }

  private def parseLong(name: String, v: String): Long =
    try v.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"failed to parse $name as integer: $v")
    }

  /** A Long that must also fit an Int knob — out-of-range is a loud config
    * error, never a silent `.toInt` wraparound. */
  private def parseInt(name: String, v: String): Int = {
    val l = parseLong(name, v)
    if (l < Int.MinValue || l > Int.MaxValue)
      throw new IllegalArgumentException(s"$name out of 32-bit range: $v")
    l.toInt
  }

  private def parseBool(name: String, v: String): Boolean = v.toLowerCase match {
    case "true" => true
    case "false" => false
    case other =>
      throw new IllegalArgumentException(s"failed to parse $name as bool: $other")
  }

  private[graft] def normalizeBackend(s: String): String = s.toLowerCase match {
    case "fs" | "filesystem" => "fs"
    case "s3" | "aws" => "s3"
    case "r2" => "r2"
    case other => throw new IllegalArgumentException(
      s"unsupported storage backend: $other (supported: fs, s3, r2)")
  }

  /** Prefixes are stored with a trailing slash; empty means none — the
    * reference's normalize_prefix. */
  private[graft] def normalizePrefix(p: String): String =
    if (p.endsWith("/")) p else p + "/"

  /** The reference's validation rules (validation.rs): positive thresholds,
    * backend-required fields. Failures are config errors, raised before any
    * work starts. */
  private[graft] def validate(c: GraftConfig): Unit = {
    def bad(msg: String) = throw new IllegalArgumentException(s"invalid config: $msg")
    if (c.batch.maxRows <= 0) bad("batch.max_rows must be greater than 0")
    if (c.batch.maxBytes <= 0) bad("batch.max_bytes must be greater than 0")
    if (c.batch.maxAgeSecs <= 0) bad("batch.max_age_secs must be greater than 0")
    if (c.request.maxPayloadBytes <= 0) bad("request.max_payload_bytes must be greater than 0")
    if (c.writer.maxRecordsPerFile <= 0) bad("writer.max_records_per_file must be greater than 0")
    if (c.writer.triggerIntervalSecs <= 0) bad("writer.trigger_interval_secs must be greater than 0")
    if (c.writer.maxFilesPerTrigger <= 0) bad("writer.max_files_per_trigger must be greater than 0")
    if (c.writer.streamStatePartitions <= 0)
      bad("writer.stream_state_partitions must be greater than 0")
    c.storage.backend match {
      case "fs" =>
        if (c.storage.path.isEmpty) bad("storage.fs.path must not be empty")
      case "s3" =>
        if (c.storage.s3.bucket.isEmpty) bad("storage.s3.bucket is required")
        if (c.storage.s3.region.isEmpty && c.storage.s3.endpoint.isEmpty)
          bad("storage.s3.region is required (or an explicit endpoint)")
      case "r2" =>
        if (c.storage.r2.bucket.isEmpty) bad("storage.r2.bucket is required")
        if (c.storage.r2.accountId.isEmpty && c.storage.r2.endpoint.isEmpty)
          bad("storage.r2.account_id is required (or an explicit endpoint)")
        if (c.storage.r2.accessKeyId.isEmpty) bad("storage.r2.access_key_id is required")
        if (c.storage.r2.secretAccessKey.isEmpty) bad("storage.r2.secret_access_key is required")
    }
  }
}
