package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Exactly-once micro-batch publish for `foreachBatch` sinks.
  *
  * Plain appends inside `foreachBatch` are at-least-once: the write is not
  * transactional with the streaming checkpoint, so a crash between the sink
  * write and the commit-log entry makes the restarted query re-run the
  * batch and duplicate its rows. This helper closes that window with the
  * stage → deterministic-rename publish → commit-marker protocol:
  *
  *  1. **Skip**: if `{root}/_graft_commits/{table}/{batchId}` exists the
  *     batch was fully published by a previous attempt — return.
  *  2. **Stage**: write the batch under
  *     `{root}/_graft_staging/{table}/{batchId}` (the staging dir is
  *     deleted first, so a replay of a half-staged crash starts clean).
  *     The staged layout is the live table's own partition layout
  *     ([[OtelWrite.write]] — service/year/month/day/hour dirs).
  *  3. **Publish**: move each staged file into the live partition dir under
  *     a DETERMINISTIC name — `b{batchId}-{i}.snappy.parquet`, `i` the
  *     file's rank in the sorted staging listing of its partition dir.
  *     Before moving, every existing `b{batchId}-*` file in the target dir
  *     is deleted: a replay after a crash MID-publish therefore overwrites
  *     exactly the files the crashed attempt had moved, instead of adding
  *     a second copy next to them.
  *  4. **Stamp** (optional): footer-stamp the touched partition dirs
  *     ([[FooterStamp.stampDirs]] — itself idempotent: already-stamped
  *     files are skipped after a footer-only read).
  *  5. **Commit**: create the marker, then delete the staging dir and sweep
  *     markers older than [[RetainMarkers]] batches (a restarted query can
  *     only replay batches the streaming checkpoint retains, so older
  *     markers are dead weight — without the sweep they accumulate one file
  *     per (table, batchId) forever).
  *
  * Every crash window replays into the same final state: before any move →
  * clean re-stage; mid-publish → deterministic overwrite; after the last
  * move but before the marker → full overwrite then marker; after the
  * marker → step 1 skips. Underscore-prefixed staging/commit dirs are
  * invisible to Spark/parquet directory readers, and in-flight `b{id}-*`
  * files become visible to concurrent readers as they land — the same
  * blind-append visibility the reference's own writer has
  * (/root/reference/src/writer/write.rs:93-130).
  *
  * Assumes same-filesystem `rename` (HDFS / local / any HCFS where rename
  * is a metadata move) — the same assumption Spark's own file-sink
  * metadata log makes. Object stores want a committer, not renames.
  */
object BatchPublish {

  private def fsOf(df: DataFrame, p: Path): FileSystem =
    p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** True if `batchId` is already committed for `tableDir`. */
  def isCommitted(df: DataFrame, root: String, tableDir: String,
      batchId: Long): Boolean = {
    val marker = markerPath(root, tableDir, batchId)
    fsOf(df, marker).exists(marker)
  }

  private def markerPath(root: String, tableDir: String, batchId: Long): Path =
    new Path(s"$root/_graft_commits/$tableDir/$batchId")

  /** Markers retained behind the newest batch before the post-commit sweep
    * deletes them. Mirrors the streaming checkpoint's own commit-log
    * retention (`spark.sql.streaming.minBatchesToRetain`, default 100): a
    * restarted query can only replay batches the checkpoint still holds, so
    * a marker older than the retained window can never be consulted again —
    * without the sweep, one marker file per (table, batchId) accumulates
    * forever on a long-running stream. */
  val RetainMarkers: Long = 100L

  /** Delete commit markers for batches ≤ `batchId − retain` (see
    * [[RetainMarkers]]). Non-numeric names are left alone. */
  private def sweepMarkers(fs: FileSystem, root: String, tableDir: String,
      batchId: Long, retain: Long): Unit = {
    val dir = new Path(s"$root/_graft_commits/$tableDir")
    val cutoff = batchId - retain
    if (cutoff >= 0 && fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        val id = try Some(st.getPath.getName.toLong)
          catch { case _: NumberFormatException => None }
        if (id.exists(_ <= cutoff)) fs.delete(st.getPath, false)
      }
    }
  }

  /** Publish one micro-batch of `tableDir` rows exactly once (see object
    * doc). Returns true if this call published, false if the batch was
    * already committed. */
  def publish(batch: DataFrame, root: String, tableDir: String, batchId: Long,
      maxRecordsPerFile: Long = 200000L, stamp: Boolean = false,
      retainMarkers: Long = RetainMarkers): Boolean = {
    val marker = markerPath(root, tableDir, batchId)
    val fs = fsOf(batch, marker)
    val stagingTable = new Path(s"$root/_graft_staging/$tableDir/$batchId")
    if (fs.exists(marker)) {
      fs.delete(stagingTable, true) // leftover from a crash after commit
      return false
    }

    // stage (clean slate — a half-staged crash replays from scratch)
    fs.delete(stagingTable, true)
    OtelWrite.write(batch, s"$root/_graft_staging/$tableDir",
      batchId.toString, maxRecordsPerFile)

    // group staged data files by their partition dir, relative to staging
    val staged = scala.collection.mutable.ArrayBuffer[Path]()
    if (fs.exists(stagingTable)) {
      val it = fs.listFiles(stagingTable, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          staged += st.getPath
      }
    }
    val stagingUri = stagingTable.toUri.getPath
    val byDir = staged.groupBy { p =>
      val rel = p.getParent.toUri.getPath.stripPrefix(stagingUri)
      rel.stripPrefix("/")
    }

    val touchedDirs = byDir.keys.toSeq.sorted.map { rel =>
      val target = if (rel.isEmpty) new Path(s"$root/$tableDir")
        else new Path(s"$root/$tableDir/$rel")
      fs.mkdirs(target)
      // a crashed previous attempt may have moved some of this batch's
      // files already — deterministic names let us overwrite, not append
      val stale = fs.globStatus(new Path(target, s"b$batchId-*"))
      if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
      byDir(rel).sortBy(_.getName).zipWithIndex.foreach { case (src, i) =>
        val dst = new Path(target, f"b$batchId%d-$i%05d.snappy.parquet")
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"batch publish: rename $src → $dst failed")
      }
      target.toString
    }

    if (stamp)
      FooterStamp.schemaVersionFor(tableDir).foreach { v =>
        FooterStamp.stampDirs(batch.sparkSession, touchedDirs,
          Map(FooterStamp.SchemaVersionKey -> v))
      }

    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    fs.delete(stagingTable, true)
    sweepMarkers(fs, root, tableDir, batchId, retainMarkers)
    true
  }
}
