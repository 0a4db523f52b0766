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
    * the gates' temp-dir clone case. */
  def cloneWithHardLinks(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      if (!dst.isDirectory) require(dst.mkdirs(), s"mkdirs failed: $dst")
      val children = src.listFiles()
      if (children != null)
        children.foreach(c => cloneWithHardLinks(c, new java.io.File(dst, c.getName)))
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
