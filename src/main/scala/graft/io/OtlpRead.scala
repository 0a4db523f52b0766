package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.OtlpSchemas

/** OTLP envelope readers → one row per Export*ServiceRequest.
  *
  * Formats follow the reference's `InputFormat` (json / jsonl / protobuf,
  * /root/reference/src/handlers.rs:68-69). gzip inputs are transparent —
  * Hadoop codecs decompress `.gz` natively, matching the reference's
  * RequestDecompressionLayer (/root/reference/src/lib.rs:227).
  *
  * Malformed JSON is a hard error (FAILFAST), matching the reference's 400
  * on parse failure (/root/reference/src/handlers.rs:106-108).
  */
object OtlpRead {

  sealed trait Signal { def schema: org.apache.spark.sql.types.StructType }
  case object Logs extends Signal { val schema = OtlpSchemas.logsRequestType }
  case object Traces extends Signal { val schema = OtlpSchemas.tracesRequestType }
  case object Metrics extends Signal { val schema = OtlpSchemas.metricsRequestType }

  /** Pretty-printed / single-envelope JSON files (multiline). */
  def json(spark: SparkSession, signal: Signal, paths: String*): DataFrame =
    spark.read
      .schema(signal.schema)
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .json(paths: _*)

  /** JSONL: one envelope per line — line-parallel, splittable, the scalable
    * landing format for bulk ingest. */
  def jsonl(spark: SparkSession, signal: Signal, paths: String*): DataFrame =
    spark.read
      .schema(signal.schema)
      .option("mode", "FAILFAST")
      .json(paths: _*)
}
