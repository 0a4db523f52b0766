package graft

import org.apache.spark.sql.SparkSession

import graft.io.{OtelWrite, OtlpRead}
import graft.transform.Otlp

/** Batch-mode pipeline driver: OTLP payload files → partitioned Parquet
  * tables. The Spark equivalent of the reference's serve→decode→write path
  * collapsed into one lazy plan (SURVEY §3.3).
  *
  * Operational knobs (payload limit, maxRecordsPerFile, storage backend)
  * come from [[Config.load]] — the reference's resolution chain (env >
  * GRAFT_CONFIG file > inline content > ./config.toml > defaults), so an
  * operator tunes the pipeline without touching the CLI. The output root is
  * the CLI argument; passing the flag `--from-config` takes it from the
  * resolved storage backend instead (`cfg.outputRoot` — fs path or
  * s3a://bucket/prefix; a flag spelling, not a bare word, so no real
  * directory name can collide with it).
  *
  * Usage: Ingest <logs|traces|metrics> <json|jsonl|protobuf> <inputPath...> <outputRoot|--from-config>
  */
object Ingest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Ingest <logs|traces|metrics> <json|jsonl|protobuf> <inputPath...> <outputRoot|--from-config>")
    val signal = args(0)
    val format = args(1)
    val inputs = args.slice(2, args.length - 1)
    val cfg = Config.load() // fails fast on malformed config, like the reference
    val outRoot = if (args.last == "--from-config") cfg.outputRoot else args.last

    // writability probe before any work — the reference validates the
    // output location at startup and exits with a clear error
    // (/root/reference/src/config/validation.rs:9-188). Only local paths are
    // probed with java.io.File; remote roots (s3a://, hdfs://) go through
    // the Hadoop FS, whose own errors surface at first write.
    val (scheme, localPath) =
      try {
        val u = java.net.URI.create(outRoot)
        (u.getScheme, Option(u.getPath).filter(_.nonEmpty).getOrElse(outRoot))
      } catch {
        // plain paths with URI-illegal characters (spaces etc.) are local;
        // a string that CLAIMS a scheme but fails to parse is a config error
        case e: IllegalArgumentException if outRoot.contains("://") =>
          throw new IllegalArgumentException(
            s"invalid output root URI: $outRoot (${e.getMessage})")
        case _: IllegalArgumentException => (null, outRoot)
      }
    if (scheme == null || scheme == "file") {
      val root = new java.io.File(localPath)
      if (!root.exists() && !root.mkdirs())
        throw new IllegalArgumentException(s"output root not creatable: $outRoot")
      try {
        val probe = java.io.File.createTempFile(".graft-probe", "", root)
        if (!probe.delete())
          throw new IllegalArgumentException(s"output root not writable: $outRoot")
      } catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"output root not writable: $outRoot (${e.getMessage})")
      }
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg.applyStorage(spark) // s3a/R2 Hadoop conf when the backend needs it

    val telemetry = new Telemetry(spark.sparkContext)
    val counted = run(spark, cfg, signal, format, inputs.toSeq, outRoot, telemetry)

    val summary = counted.map { case (t, n, p) =>
      s""""$t":{"records":$n,"partitions":$p}"""
    }.mkString("{", ",", "}")
    println(s"""{"ingest":$summary,"telemetry":${telemetry.summaryJson}}""")
    spark.stop()
  }

  /** Expand input paths (files, directories, globs) to (path, bytes) via the
    * Hadoop FS — the request-accounting unit: one landing file is one
    * request body in the landing-dir model (SURVEY §2.1). */
  private[graft] def listInputFiles(spark: SparkSession,
      inputs: Seq[String]): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    // skip hidden/marker files (`.`-prefixed, `_SUCCESS` etc.) exactly like
    // Spark's own file index — they are never decoded, so they must not
    // count as requests nor trip the payload guard
    def visible(name: String): Boolean =
      !name.startsWith(".") && !name.startsWith("_")
    inputs.flatMap { in =>
      val p = new org.apache.hadoop.fs.Path(in)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty).flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.filter(st => visible(st.getPath.getName))
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** The full ingest pipeline as a callable: decode → flatten → partitioned
    * write, with request/record/flush telemetry. Returns per-table
    * (table, records, partitions).
    *
    * Request accounting happens driver-side on the file listing because the
    * batch path is fail-fast: an oversized landing file increments
    * `otlp.ingest.rejected` and then aborts (413 parity,
    * /root/reference/src/handlers.rs:78-85) — accumulator updates from
    * failed executor tasks would be dropped, so the guard cannot live in the
    * decoder here. The streaming path ([[graft.streaming.OtlpStream]]) keeps
    * its skip-and-count executor-side guard instead.
    */
  def run(spark: SparkSession, cfg: Config.GraftConfig, signal: String,
      format: String, inputs: Seq[String], outRoot: String,
      telemetry: Telemetry): Seq[(String, Long, Long)] = {
    val t0 = System.nanoTime()

    val files = listInputFiles(spark, inputs)
    require(files.nonEmpty, s"no input files matched: ${inputs.mkString(", ")}")
    telemetry.ingestRequests.add(files.size.toLong)
    telemetry.ingestBytes.add(files.map(_._2).sum)
    // 413 parity applies to REQUEST bodies. For protobuf and multiline json
    // one file IS one request body; jsonl is the bulk landing format where
    // each LINE is an envelope — a large jsonl file of small envelopes is
    // legitimate and must not be rejected on file size.
    if (format != "jsonl")
      files.find(_._2 > cfg.request.maxPayloadBytes).foreach { case (p, len) =>
        telemetry.ingestRejected.add(1L)
        throw new IllegalArgumentException(
          s"payload $p is $len bytes, exceeds max ${cfg.request.maxPayloadBytes} (reference 413)")
      }

    def read(sig: OtlpRead.Signal) = format match {
      case "json" => OtlpRead.json(spark, sig, inputs: _*)
      case "jsonl" => OtlpRead.jsonl(spark, sig, inputs: _*)
      case "protobuf" | "pb" =>
        OtlpRead.protobufLimited(spark, sig, cfg.request.maxPayloadBytes, inputs: _*)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

    // writes one table and returns this run's (records, partitions) — the
    // reference's 200 response body reports per-request counts
    // (/root/reference/src/handlers.rs:191-198), so the numbers come from
    // the batch being written, not a read-back of the (append-mode) table
    def writeCounted(df: org.apache.spark.sql.DataFrame, table: String,
        flushes: org.apache.spark.util.LongAccumulator): (String, Long, Long) = {
      val flat = df.persist()
      val n = flat.count()
      val nParts =
        if (n == 0) 0L
        else OtelWrite.withPartitionColumns(flat)
          .select("service", "year", "month", "day", "hour").distinct().count()
      if (n > 0) {
        OtelWrite.write(flat, outRoot, table,
          maxRecordsPerFile = cfg.writer.maxRecordsPerFile)
        // one completed batch write per table per run — the reference
        // increments per completed batch flush (handlers.rs:682-687)
        flushes.add(1L)
        // opt-in schema-version footer stamp (writer.footer_stamp /
        // GRAFT_FOOTER_STAMP): tag the table's files with the signal's
        // schema version as the final step of the run. stampTable walks the
        // whole table dir, but files stamped by earlier runs are skipped
        // after a footer-only read — repeat runs over a growing table cost
        // O(files) cheap footer reads, and only this run's new files are
        // rewritten (no re-opened rename window over historical data).
        if (cfg.writer.footerStamp)
          graft.io.FooterStamp.schemaVersionFor(table).foreach { v =>
            graft.io.FooterStamp.stampTable(spark, outRoot, table,
              Map(graft.io.FooterStamp.SchemaVersionKey -> v))
          }
      }
      flat.unpersist()
      (table, n, nParts)
    }

    val counted = signal match {
      case "logs" =>
        val out = Seq(writeCounted(Otlp.logs(read(OtlpRead.Logs)), "otel_logs",
          telemetry.batchFlushes))
        telemetry.ingestRecords.add(out.map(_._2).sum)
        out
      case "traces" =>
        val out = Seq(writeCounted(Otlp.traces(read(OtlpRead.Traces)),
          "otel_traces", telemetry.tracesFlushes))
        telemetry.ingestRecords.add(out.map(_._2).sum)
        out
      case "metrics" =>
        val pm = Otlp.metrics(read(OtlpRead.Metrics))
        val out = Seq(
          writeCounted(pm.gauge, "otel_metrics_gauge", telemetry.metricsFlushes),
          writeCounted(pm.sum, "otel_metrics_sum", telemetry.metricsFlushes),
          writeCounted(pm.histogram, "otel_metrics_histogram",
            telemetry.metricsFlushes),
          writeCounted(pm.expHistogram, "otel_metrics_exponential_histogram",
            telemetry.metricsFlushes))
        val skipped = pm.skipped.collect()
        if (skipped.nonEmpty)
          System.err.println("[ingest] skipped: " + skipped.mkString(", "))
        // the reference's records counter for metrics counts ALL decoded
        // data points, including skipped ones (handlers.rs:595-600)
        telemetry.ingestRecords.add(
          out.map(_._2).sum + skipped.map(_.getLong(1)).sum)
        out
      case other => throw new IllegalArgumentException(s"unknown signal: $other")
    }

    telemetry.ingestLatencyMs.add((System.nanoTime() - t0) / 1000000L)
    counted
  }
}
