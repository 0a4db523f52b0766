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
  /** A crash between stampFile's two renames leaves the data only in the
    * hidden `.{name}.stamp.bak` (which parquet directory reads skip). If the
    * primary is missing but its .bak exists, restore it — so a crashed stamp
    * run self-heals on the next invocation instead of silently losing the
    * file from the table. Returns true if a restore happened. */
  def healBak(file: Path, conf: Configuration): Boolean = {
    val fs = file.getFileSystem(conf)
    val bak = new Path(file.getParent, s".${file.getName}.stamp.bak")
    if (!fs.exists(file) && fs.exists(bak)) {
      if (!fs.rename(bak, file))
        throw new java.io.IOException(
          s"footer stamp: could not restore $file from orphaned $bak")
      true
    } else false
  }

  /** Returns true if the file was rewritten, false if its footer already
    * carried every requested key=value — the footer read is a tail-of-file
    * metadata read, so re-stamping an already-stamped table costs one cheap
    * footer read per file instead of a full read+write (idempotent AND
    * near-free; without the skip, repeat ingest runs rewrote the entire
    * historical table every run and re-opened the non-atomic rename window
    * over files that needed no change). */
  def stampFile(file: Path, conf: Configuration, extra: Map[String, String]): Boolean = {
    healBak(file, conf)
    val in = HadoopInputFile.fromPath(file, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, existingKv) =
      try {
        val fm = reader.getFooter.getFileMetaData
        (fm.getSchema, fm.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()
    if (extra.forall { case (k, v) => existingKv.get(k).contains(v) }) return false

    val tmp = new Path(file.getParent, s".${file.getName}.stamp.tmp")
    val bak = new Path(file.getParent, s".${file.getName}.stamp.bak")
    val fs = file.getFileSystem(conf)
    var replaced = false
    try {
      val writer = new ParquetFileWriter(
        HadoopOutputFile.fromPath(tmp, conf), schema,
        ParquetFileWriter.Mode.OVERWRITE,
        128L * 1024 * 1024, 0) // block size is irrelevant: row groups are appended as-is
      writer.start()
      writer.appendFile(HadoopInputFile.fromPath(file, conf))
      writer.end((existingKv ++ extra).asJava)
      // replace without a window where no copy exists: original → .bak,
      // tmp → original; on any failure the original is restored from .bak.
      // (A reader between the two renames can still miss the file — true
      // atomic swap needs a filesystem with atomic rename-over, which
      // HDFS/local rename-to-existing is not; callers stamp tables that are
      // not concurrently read, e.g. as the final step of the ingest job.)
      fs.delete(bak, false) // a stale .bak from a crashed run would wedge the rename
      if (!fs.rename(file, bak))
        throw new java.io.IOException(s"footer stamp: could not move $file aside")
      if (!fs.rename(tmp, file)) {
        if (!fs.rename(bak, file)) // restore — the original still exists in .bak
          throw new java.io.IOException(
            s"footer stamp: replace failed AND restore failed — original preserved at $bak")
        throw new java.io.IOException(s"footer stamp: could not move stamped copy into place for $file")
      }
      replaced = true
      fs.delete(bak, false)
    } finally {
      if (!replaced) fs.delete(tmp, false) // never delete tmp after it became the data file
    }
    true
  }

  /** Stamp every parquet file under `{root}/{tableDir}` (recursing through
    * the service/year/…/hour partition dirs). Files whose footer already
    * carries the requested key=value are skipped after a footer-only read
    * ([[stampFile]]), so repeat runs over a growing table cost O(files)
    * footer reads, not O(files) rewrites. Returns the number of files
    * actually rewritten. */
  def stampTable(spark: org.apache.spark.sql.SparkSession, root: String,
      tableDir: String, extra: Map[String, String]): Long =
    stampUnder(spark.sparkContext.hadoopConfiguration,
      new Path(s"$root/$tableDir"), extra)

  /** Stamp specific directories (e.g. only the partition dirs one streaming
    * micro-batch touched) — bounds per-batch stamp work to the batch's own
    * partitions instead of the whole growing table. Missing dirs are
    * skipped. Returns the number of files actually rewritten. */
  def stampDirs(spark: org.apache.spark.sql.SparkSession, dirs: Seq[String],
      extra: Map[String, String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.map(d => stampUnder(conf, new Path(d), extra)).sum
  }

  private def stampUnder(conf: Configuration, base: Path,
      extra: Map[String, String]): Long = {
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) return 0L
    val files = scala.collection.mutable.ArrayBuffer[Path]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet"))
        files += st.getPath
      else if (st.isFile && name.startsWith(".") && name.endsWith(".stamp.bak")) {
        // orphaned backup from a crashed run: its primary never reappears in
        // this listing (hidden files are skipped by parquet readers), so
        // restore it here and stamp the restored primary like any other file
        val primary = new Path(st.getPath.getParent,
          name.stripPrefix(".").stripSuffix(".stamp.bak"))
        if (healBak(primary, conf)) files += primary
      }
    }
    files.count(stampFile(_, conf, extra)).toLong
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
