package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}

/** Adds key/value entries to parquet file footers after a Spark write.
  *
  * Investigation result (round 3, closing COVERAGE "Known deviations" #2):
  * Spark's parquet sink hardcodes its own `WriteSupport`, whose
  * `WriteContext` extraMetadata carries only the Spark schema key — there is
  * no conf knob to add footer KV entries during the write. Post-write
  * stamping IS reachable, and cheaply: `ParquetFileWriter.appendFile` copies
  * row groups byte-for-byte (no decode/re-encode — pages, compression and
  * statistics are preserved; column indexes are dropped, as with any
  * parquet-mr file rewrite), then `end()` writes a fresh footer with the
  * union of the original and the new KV entries. Cost is one sequential
  * read+write of the file — run it as the final step of an ingest job on
  * the files just written (each a bounded `maxRecordsPerFile` chunk), never
  * as a scan over historical data.
  *
  * Note the reference itself does NOT write such a key: every golden footer
  * under `/root/reference/testdata/parquet` carries only arrow-rs's
  * automatic `ARROW:schema`, and `schema_version` appears nowhere in its
  * source — SURVEY §2's "observed in footers" claim was checked this round
  * and is corrected there. The capability exists here so schema-version
  * tagging (the useful operational idea behind the original claim) is
  * available: [[stampTable]] tags every file of a written signal table with
  * `graft.schema_version` = [[graft.schema.OtlpSchemas]]'s version for that
  * signal.
  */
object FooterStamp {

  /** Rewrite one parquet file's footer with `extra` merged over its existing
    * key/value metadata (`extra` wins on key collisions). Row-group bytes
    * are copied verbatim. */
  def stampFile(file: Path, conf: Configuration, extra: Map[String, String]): Unit = {
    val in = HadoopInputFile.fromPath(file, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, existingKv) =
      try {
        val fm = reader.getFooter.getFileMetaData
        (fm.getSchema, fm.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()

    val tmp = new Path(file.getParent, s".${file.getName}.stamp.tmp")
    val fs = file.getFileSystem(conf)
    try {
      val writer = new ParquetFileWriter(
        HadoopOutputFile.fromPath(tmp, conf), schema,
        ParquetFileWriter.Mode.OVERWRITE,
        128L * 1024 * 1024, 0) // block size is irrelevant: row groups are appended as-is
      writer.start()
      writer.appendFile(HadoopInputFile.fromPath(file, conf))
      writer.end((existingKv ++ extra).asJava)
      if (!fs.delete(file, false) || !fs.rename(tmp, file))
        throw new java.io.IOException(s"footer stamp: atomic replace failed for $file")
    } finally fs.delete(tmp, false) // no-op when the rename succeeded
  }

  /** Stamp every parquet file under `{root}/{tableDir}` (recursing through
    * the service/year/…/hour partition dirs). */
  def stampTable(spark: org.apache.spark.sql.SparkSession, root: String,
      tableDir: String, extra: Map[String, String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(s"$root/$tableDir")
    val fs = base.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer[Path]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        files += st.getPath
    }
    files.foreach(stampFile(_, conf, extra))
    files.size.toLong
  }

  /** The signal-table schema versions [[graft.schema.OtlpSchemas]] declares. */
  def schemaVersionFor(tableDir: String): Option[String] = tableDir match {
    case "otel_logs" => Some(graft.schema.OtlpSchemas.LogsSchemaVersion)
    case "otel_traces" => Some(graft.schema.OtlpSchemas.TracesSchemaVersion)
    case t if t.startsWith("otel_metrics") => Some(graft.schema.OtlpSchemas.MetricsSchemaVersion)
    case _ => None
  }

  val SchemaVersionKey = "graft.schema_version"
}
