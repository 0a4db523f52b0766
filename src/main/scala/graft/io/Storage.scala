package graft.io

import org.apache.spark.sql.SparkSession

/** Storage backend configuration (sink-storage, SURVEY §2.1): the Spark/
  * Hadoop-FS equivalent of the reference's OpenDAL fs/S3/R2 backends
  * (/root/reference/src/writer/storage.rs:12-91, config
  * /root/reference/src/config/mod.rs:93-158).
  *
  *   - fs      → plain `file://` (or bare) paths — no configuration needed
  *   - S3      → `s3a://bucket/prefix` + the hadoop-aws connector settings
  *   - R2      → S3-compatible account endpoint + path-style access
  *
  * Paths everywhere else in this library are backend-agnostic strings: the
  * same `OtelWrite.write(df, root, table)` call lands on any configured
  * filesystem, mirroring how the reference routes all writers through one
  * `Operator`. (Not integration-tested here: the environment has no object
  * store; settings are the stock hadoop-aws surface.)
  */
object Storage {

  /** Configure `s3a://` for AWS S3 or any S3-compatible endpoint (MinIO, R2).
    * For R2 pass `endpoint = Some("https://<account>.r2.cloudflarestorage.com")`
    * — the reference's account-endpoint rule. */
  def configureS3(spark: SparkSession, accessKey: String, secretKey: String,
      endpoint: Option[String] = None, region: Option[String] = None,
      pathStyleAccess: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
    endpoint.foreach(conf.set("fs.s3a.endpoint", _))
    region.foreach(conf.set("fs.s3a.endpoint.region", _))
    conf.set("fs.s3a.path.style.access", pathStyleAccess.toString)
    // parquet-friendly committer: no rename-based commit on object stores
    conf.set("fs.s3a.committer.name", "magic")
    conf.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")
  }

  /** Root path for a signal under an optional key prefix — `{prefix}{signal}`
    * like the reference's `storage.prefix` (config.example.toml). */
  def root(base: String, prefix: Option[String]): String =
    prefix.filter(_.nonEmpty).map(p => s"${base.stripSuffix("/")}/${p.stripPrefix("/")}")
      .getOrElse(base)

  /** Recursive local-file delete — shared by the bench/audit mains' temp-dir
    * cleanup (leaked landing/output files measurably degrade later runs). */
  def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Total row count of a parquet table from its file FOOTERS alone — a
    * driver-side metadata walk, no Spark job, no column data read. Parquet
    * footers carry the committed row count per file, so this equals what a
    * full `count()` over the table returns (StorageSpec pins the equality
    * against a Spark-written table). Used by the streaming ANN gate's
    * strict-growth invariant (r16): the check still measures the REAL
    * committed table after each trigger's upsert, it just reads the
    * metadata instead of scheduling a full-table scan job per trigger. */
  def parquetRowCountFromFooters(
      conf: org.apache.hadoop.conf.Configuration, dir: String): Long = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf)
    var n = 0L
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try n += r.getRecordCount
        finally r.close()
      }
    }
    n
  }

  /** Commit a partition-dir rewrite by SWAP (r16, index maintenance): the
    * caller wrote the merged content of the `touched` partitions of
    * `dstDir` to `tmpDir` (same partitionBy layout). Every touched
    * partition dir under `dstDir` is deleted, every partition dir the
    * write actually produced under `tmpDir` is renamed into place, and the
    * tmp table is dropped. A touched partition whose rows were all
    * replaced-away produces no dir in the write, so the swap reproduces
    * dynamic-partition-overwrite + explicit stale-dir cleanup exactly —
    * without the eager checkpoint the overwrite-in-place shape needed to
    * detach the merged frame from the files it reads, and without the
    * survivors collect (the write's own dir listing is the survivor set).
    * `touched` entries are dst-relative partition paths ("band=3/bkt=17",
    * "idb=5"); the write may only produce partitions within `touched`
    * (enforced). Commit markers (_SUCCESS) stay in the tmp dir and are
    * dropped with it — the destination table root is never written
    * through, so a hard-link clone's shared markers are never mutated. */
  def swapPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      tmpDir: String, dstDir: String, touched: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(tmpDir)
    val dst = new Path(dstDir)
    val depth = touched.headOption.map(_.count(_ == '/') + 1).getOrElse(1)
    // the partition dirs the write produced, tmp-relative
    def partDirs(p: Path, d: Int): Seq[String] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap { s =>
          if (d == 1) Seq(s.getPath.getName)
          else partDirs(s.getPath, d - 1).map(c => s"${s.getPath.getName}/$c")
        }
    val produced = partDirs(tmp, depth)
    val touchedSet = touched.toSet
    val stray = produced.filterNot(touchedSet)
    require(stray.isEmpty,
      s"partition swap: write produced partitions outside the touched set: " +
        s"${stray.take(5).mkString(", ")}")
    touched.foreach(rel => fs.delete(new Path(dst, rel), true))
    produced.foreach { rel =>
      val target = new Path(dst, rel)
      val parent = target.getParent
      if (!fs.exists(parent)) require(fs.mkdirs(parent), s"mkdirs $parent")
      require(fs.rename(new Path(tmp, rel), target),
        s"partition swap: rename ${new Path(tmp, rel)} -> $target failed")
    }
    fs.delete(tmp, true)
    ()
  }

  /** Clone a local directory tree using HARD LINKS for the file contents —
    * the copy-on-write fixture clone the streaming maintenance gates use
    * (r15): a byte copy of the memoized band/IVF-PQ index (~300 small
    * parquet + .crc files) cost 1.7–3.1 s per gate run, while a link walk
    * is milliseconds. Safe for parquet tables because nothing ever mutates
    * a parquet file in place — maintenance REPLACES files (dynamic
    * partition overwrite writes new files and deletes old ones, and
    * deleting a link never touches the source inode's other names). Falls
    * back to a byte copy per file when the filesystem refuses the link
    * (cross-device, or a non-link-capable FS). Local paths only — exactly
    * the gates' temp-dir clone case.
    *
    * Commit markers (`_SUCCESS`, `*.crc`) are BYTE-COPIED, never linked
    * (ADVICE r15): Hadoop's commit protocol re-creates markers in place
    * with `create(overwrite=true)`, which truncates THROUGH a shared
    * inode — the parquet data files are only ever replaced (safe to
    * link), but a linked marker would let a later commit at the clone
    * mutate the memoized source's marker. Harmless today (markers are
    * zero bytes) — copied so the "nothing mutates through an inode"
    * invariant holds structurally, not by accident. */
  def cloneWithHardLinks(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      if (!dst.isDirectory) require(dst.mkdirs(), s"mkdirs failed: $dst")
      val children = src.listFiles()
      if (children != null)
        children.foreach(c => cloneWithHardLinks(c, new java.io.File(dst, c.getName)))
    } else if (src.getName == "_SUCCESS" || src.getName.endsWith(".crc")) {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      ()
    } else {
      try java.nio.file.Files.createLink(dst.toPath, src.toPath)
      catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(src.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
          ()
      }
    }
  }
}
