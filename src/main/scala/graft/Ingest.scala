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
    def writeCounted(df: org.apache.spark.sql.DataFrame,
        table: String): (String, Long, Long) = {
      val flat = df.persist()
      val n = flat.count()
      val nParts =
        if (n == 0) 0L
        else OtelWrite.withPartitionColumns(flat)
          .select("service", "year", "month", "day", "hour").distinct().count()
      if (n > 0) OtelWrite.write(flat, outRoot, table,
        maxRecordsPerFile = cfg.writer.maxRecordsPerFile)
      flat.unpersist()
      (table, n, nParts)
    }

    val counted = signal match {
      case "logs" =>
        Seq(writeCounted(Otlp.logs(read(OtlpRead.Logs)), "otel_logs"))
      case "traces" =>
        Seq(writeCounted(Otlp.traces(read(OtlpRead.Traces)), "otel_traces"))
      case "metrics" =>
        val pm = Otlp.metrics(read(OtlpRead.Metrics))
        val out = Seq(
          writeCounted(pm.gauge, "otel_metrics_gauge"),
          writeCounted(pm.sum, "otel_metrics_sum"),
          writeCounted(pm.histogram, "otel_metrics_histogram"),
          writeCounted(pm.expHistogram, "otel_metrics_exponential_histogram"))
        val skipped = pm.skipped.collect()
        if (skipped.nonEmpty)
          System.err.println("[ingest] skipped: " + skipped.mkString(", "))
        out
      case other => throw new IllegalArgumentException(s"unknown signal: $other")
    }

    val summary = counted.map { case (t, n, p) =>
      s""""$t":{"records":$n,"partitions":$p}"""
    }.mkString("{", ",", "}")
    println(s"""{"ingest":$summary}""")
    spark.stop()
  }
}
