package graft

import org.apache.spark.sql.SparkSession

import graft.io.{OtelWrite, OtlpRead}
import graft.transform.Otlp

/** Batch-mode pipeline driver: OTLP payload files → partitioned Parquet
  * tables. The Spark equivalent of the reference's serve→decode→write path
  * collapsed into one lazy plan (SURVEY §3.3).
  *
  * Usage: Ingest <logs|traces|metrics> <json|jsonl|protobuf> <inputPath...> <outputRoot>
  */
object Ingest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Ingest <logs|traces|metrics> <json|jsonl|protobuf> <inputPath...> <outputRoot>")
    val signal = args(0)
    val format = args(1)
    val inputs = args.slice(2, args.length - 1)
    val outRoot = args.last

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(sig: OtlpRead.Signal) = format match {
      case "json" => OtlpRead.json(spark, sig, inputs: _*)
      case "jsonl" => OtlpRead.jsonl(spark, sig, inputs: _*)
      case "protobuf" | "pb" => OtlpRead.protobuf(spark, sig, inputs: _*)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

    val tables = signal match {
      case "logs" =>
        OtelWrite.write(Otlp.logs(read(OtlpRead.Logs)), outRoot, "otel_logs")
        Seq("otel_logs")
      case "traces" =>
        OtelWrite.write(Otlp.traces(read(OtlpRead.Traces)), outRoot, "otel_traces")
        Seq("otel_traces")
      case "metrics" =>
        val pm = Otlp.metrics(read(OtlpRead.Metrics))
        OtelWrite.writeMetrics(pm, outRoot)
        val skipped = pm.skipped.collect()
        if (skipped.nonEmpty)
          System.err.println("[ingest] skipped: " + skipped.mkString(", "))
        Seq("otel_metrics_gauge", "otel_metrics_sum", "otel_metrics_histogram",
          "otel_metrics_exponential_histogram")
      case other => throw new IllegalArgumentException(s"unknown signal: $other")
    }

    // summary line — the batch analog of the reference's 200 response body
    // (records_processed + partitions, /root/reference/src/handlers.rs:191-198);
    // the count reads back parquet footer stats, not the data
    val summary = tables.map { t =>
      val dir = new java.io.File(s"$outRoot/$t")
      try {
        val df = spark.read.parquet(dir.toString)
        val nParts = df.select("service", "year", "month", "day", "hour")
          .distinct().count()
        s""""$t":{"records":${df.count()},"partitions":$nParts}"""
      } catch {
        // a kind with no datapoints leaves only _SUCCESS behind (or no dir)
        case _: org.apache.spark.sql.AnalysisException =>
          s""""$t":{"records":0,"partitions":0}"""
      }
    }.mkString("{", ",", "}")
    println(s"""{"ingest":$summary}""")
    spark.stop()
  }
}
