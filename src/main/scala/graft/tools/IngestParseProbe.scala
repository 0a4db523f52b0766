package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch probe (round-11 verdict task 2): where does the ingest wall go,
  * and can the JSON parse — the measured dominator after round 10 removed
  * every flatten UDF — be cut without touching the golden contract?
  *
  * Variants, each the FULL pipeline (decode → flatten → parquet write, the
  * Bench headline shape) over the same ~202k-record landing corpus:
  *
  *  - `jsonl_current`: the shipping path (DataFrameReader.json, full
  *    envelope schema, FAILFAST).
  *  - `jsonl_pruned`: same reader, envelope schema with the fields the
  *    flatten never projects (`droppedAttributesCount`, 3 sites on the logs
  *    path) removed — Jackson skips instead of materializing them.
  *  - `text_from_json`: `spark.read.text` + `from_json(value, schema)` —
  *    same Jackson core, different scan plumbing (no per-file JsonDataSource
  *    dispatch; one UTF8String → InternalRow expression per line).
  *  - `text_from_json_pruned`: both changes together.
  *  - `pb`: the protobuf path (binaryFile scan → hand-written wire decoder)
  *    over the same record count — one logs.pb request body per file, the
  *    reference's own landing unit. Skips Jackson entirely; verdict task 2b
  *    asks for this as a second headline.
  *
  * Interleaved reps, per-variant medians (QProbe discipline).
  * Usage: IngestParseProbe [reps]
  */
object IngestParseProbe {
  /** Recursively drop fields the flatten never reads. */
  private def prune(dt: DataType, drop: Set[String]): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.filterNot(f => drop(f.name))
        .map(f => f.copy(dataType = prune(f.dataType, drop))))
    case a: ArrayType => a.copy(elementType = prune(a.elementType, drop))
    case m: MapType => m.copy(valueType = prune(m.valueType, drop))
    case other => other
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // same landing prep as Bench.ingestRowsPerSec: one jsonl file per core
    val src = java.nio.file.Paths.get("/root/reference/testdata/logs.jsonl")
    val lines = java.nio.file.Files.readAllLines(src)
    val pbBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/testdata/logs.pb"))
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-parse-probe")
    val landingDir = tmpDir.resolve("landing")
    val pbDir = tmpDir.resolve("landing_pb")
    java.nio.file.Files.createDirectory(landingDir)
    java.nio.file.Files.createDirectory(pbDir)
    val files = Runtime.getRuntime.availableProcessors()
    val copiesPerFile = 2500 / files + 1
    (0 until files).foreach { f =>
      val w = java.nio.file.Files.newBufferedWriter(landingDir.resolve(s"logs-$f.jsonl"))
      (0 until copiesPerFile).foreach(_ => lines.forEach { l => w.write(l); w.newLine() })
      w.close()
    }
    // pb: one request body per file (the reference's landing unit)
    (0 until copiesPerFile * files).foreach { i =>
      java.nio.file.Files.write(pbDir.resolve(f"req-$i%05d.pb"), pbBytes)
    }
    // pb_bulk: protobuf CONCATENATION is the wire format's own batch merge
    // (serialized messages concatenated = one message whose repeated fields
    // concatenate), so one file per core holding copiesPerFile request
    // bodies is a VALID single request — the jsonl layout's equal-bytes twin
    val pbBulkDir = tmpDir.resolve("landing_pb_bulk")
    java.nio.file.Files.createDirectory(pbBulkDir)
    (0 until files).foreach { f =>
      val out = java.nio.file.Files.newOutputStream(pbBulkDir.resolve(s"bulk-$f.pb"))
      (0 until copiesPerFile).foreach(_ => out.write(pbBytes))
      out.close()
    }
    val rows = 81L * copiesPerFile * files
    println(s"corpus: $rows records, ${copiesPerFile * files} requests")

    val fullSchema = graft.schema.OtlpSchemas.logsRequestType
    val prunedSchema =
      prune(fullSchema, Set("droppedAttributesCount")).asInstanceOf[StructType]

    def jsonlRead(schema: StructType): DataFrame =
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(landingDir.toString)
    def textRead(schema: StructType): DataFrame =
      spark.read.text(landingDir.toString)
        .select(from_json(col("value"), schema, Map("mode" -> "FAILFAST")).as("req"))
        .select("req.*")

    var outN = 0
    def run(read: => DataFrame, coalesce: Boolean = false): Double = {
      outN += 1
      val out = tmpDir.resolve(s"out$outN").toString
      val t0 = System.nanoTime()
      graft.io.OtelWrite.write(graft.transform.Otlp.logs(read), out, "otel_logs",
        coalescePartitions = coalesce)
      val s = (System.nanoTime() - t0) / 1e9
      graft.io.Storage.deleteRecursively(new java.io.File(out))
      s
    }

    // stage decompositions (round-12): where does the wall go? `_parse`
    // forces the decode with a work-forcing aggregate over a decoded deep
    // field (count() would prune the decode — CountPruneProbe), `_flat`
    // adds the full flatten but skips the parquet write. write share =
    // full − flat; flatten share = flat − parse.
    def timeOnly(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.agg(sum(length(col("Body")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    def timeParse(read: => DataFrame): Double = {
      val t0 = System.nanoTime()
      read.agg(sum(size(col("resourceLogs")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    def pbBulkRead = graft.io.OtlpRead.protobufLimited(
      spark, graft.io.OtlpRead.Logs, 64L * 1024 * 1024, pbBulkDir.toString)
    def runRebalanced(read: => DataFrame): Double = {
      outN += 1
      val out = tmpDir.resolve(s"out$outN").toString
      val t0 = System.nanoTime()
      val flat = graft.io.OtelWrite.withPartitionColumns(
        graft.transform.Otlp.logs(read))
        .hint("rebalance", "service", "year", "month", "day", "hour")
      flat.write.mode("append").option("compression", "snappy")
        .option("maxRecordsPerFile", 200000L)
        .partitionBy("service", "year", "month", "day", "hour")
        .parquet(s"$out/otel_logs")
      val s = (System.nanoTime() - t0) / 1e9
      graft.io.Storage.deleteRecursively(new java.io.File(out))
      s
    }

    val variants: Seq[(String, () => Double)] = Seq(
      "jsonl_current" -> (() => run(jsonlRead(fullSchema))),
      "jsonl_pruned" -> (() => run(jsonlRead(prunedSchema))),
      "text_from_json" -> (() => run(textRead(fullSchema))),
      "text_from_json_pruned" -> (() => run(textRead(prunedSchema))),
      "pb" -> (() => run(graft.io.OtlpRead.protobuf(
        spark, graft.io.OtlpRead.Logs, pbDir.toString))),
      "pb_bulk" -> (() => run(pbBulkRead)),
      "jsonl_parse" -> (() => timeParse(jsonlRead(fullSchema))),
      "pb_bulk_parse" -> (() => timeParse(pbBulkRead)),
      "jsonl_flat" -> (() => timeOnly(graft.transform.Otlp.logs(jsonlRead(fullSchema)))),
      "pb_bulk_flat" -> (() => timeOnly(graft.transform.Otlp.logs(pbBulkRead))),
      // clustered write: one shuffle on the partition tuple → one file per
      // (service, hour) instead of one per (task, service, hour) — the
      // reference's own per-service-flush layout, and ~6 writer inits
      // instead of ~190 at this batch size
      "jsonl_clustered" -> (() => run(jsonlRead(fullSchema), coalesce = true)),
      "pb_bulk_clustered" -> (() => run(pbBulkRead, coalesce = true)),
      // rebalance hint: same clustering intent, but AQE merges small shuffle
      // partitions AND splits skewed ones — the skew-safe production form
      "jsonl_rebalanced" -> (() => runRebalanced(jsonlRead(fullSchema))),
      "pb_bulk_rebalanced" -> (() => runRebalanced(pbBulkRead)),
    )
    variants.foreach { case (_, f) => f(); f() } // 2 warmups each
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- variants)
      times(name) = times(name) :+ f()
    println(s"== IngestParseProbe reps=$reps ($rows records/pass) ==")
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      val med = ts(ts.length / 2)
      println(f"$name%-24s median=$med%6.3f s  (${(rows / med).toLong}%6d rows/s)  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    graft.io.Storage.deleteRecursively(tmpDir.toFile)
    spark.stop()
  }
}
