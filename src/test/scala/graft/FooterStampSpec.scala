package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.io.{FooterStamp, OtelWrite}

/** Closes COVERAGE "Known deviations" #2 with executed evidence: footer KV
  * metadata IS reachable post-write (ParquetFileWriter.appendFile byte-copy
  * + fresh footer), the stamped files stay fully readable, and the Spark
  * schema key survives. (The reference's goldens were re-checked this
  * round: they carry only arrow-rs's `ARROW:schema` — no schema_version
  * key exists in the reference's output or source.) */
class FooterStampSpec extends SparkTestBase {

  test("stampTable adds footer KV to every partition file; data unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stamp").toString
    val df = Seq(
      ("svc-a", java.sql.Timestamp.valueOf("2024-03-01 10:15:00"), "one"),
      ("svc-a", java.sql.Timestamp.valueOf("2024-03-01 10:20:00"), "two"),
      ("svc-b", java.sql.Timestamp.valueOf("2024-03-02 09:05:00"), "three"))
      .toDF("ServiceName", "Timestamp", "Body")
    OtelWrite.write(df, root, "otel_logs")
    val before = spark.read.parquet(s"$root/otel_logs")
      .select("Body").as[String].collect().sorted

    val version = FooterStamp.schemaVersionFor("otel_logs").get
    val n = FooterStamp.stampTable(spark, root, "otel_logs",
      Map(FooterStamp.SchemaVersionKey -> version))
    assert(n >= 2, "expected at least one file per service partition")

    // every footer carries the stamp AND still carries Spark's schema key
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(s"$root/otel_logs")
    val fs = base.getFileSystem(conf)
    val it = fs.listFiles(base, true)
    var checked = 0
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
          finally r.close()
        assert(kv.get(FooterStamp.SchemaVersionKey).contains(version), st.getPath.toString)
        assert(kv.contains("org.apache.spark.sql.parquet.row.metadata"),
          "Spark schema key must survive the rewrite")
        checked += 1
      }
    }
    assert(checked == n)

    // stamped files read back identically (row groups copied verbatim)
    val after = spark.read.parquet(s"$root/otel_logs")
      .select("Body").as[String].collect().sorted
    assert(after.sameElements(before))
  }

  test("stamping is idempotent and extra wins on key collision") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stamp2").toString
    val df = Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("ServiceName", "Timestamp", "Body")
    OtelWrite.write(df, root, "otel_traces")
    FooterStamp.stampTable(spark, root, "otel_traces", Map("k" -> "v1"))
    FooterStamp.stampTable(spark, root, "otel_traces", Map("k" -> "v2"))
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(s"$root/otel_traces")
    val file = {
      val it = base.getFileSystem(conf).listFiles(base, true)
      var found: Option[Path] = None
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) found = Some(st.getPath)
      }
      found.get
    }
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
      finally r.close()
    assert(kv.get("k").contains("v2"))
    assert(spark.read.parquet(s"$root/otel_traces").count() == 1)
  }

  test("re-stamping with the same KV rewrites nothing (footer-read skip)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stamp4").toString
    val df = Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "z"))
      .toDF("ServiceName", "Timestamp", "Body")
    OtelWrite.write(df, root, "otel_logs")
    val n1 = FooterStamp.stampTable(spark, root, "otel_logs", Map("k" -> "v"))
    assert(n1 == 1L)
    // identical re-run: footer already carries k=v → zero rewrites (repeat
    // ingest runs over a historical table must not rewrite it every run)
    val n2 = FooterStamp.stampTable(spark, root, "otel_logs", Map("k" -> "v"))
    assert(n2 == 0L)
    assert(spark.read.parquet(s"$root/otel_logs").count() == 1)
  }

  test("a crash between the two renames self-heals from the .stamp.bak") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stamp3").toString
    val df = Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "y"))
      .toDF("ServiceName", "Timestamp", "Body")
    OtelWrite.write(df, root, "otel_logs")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(s"$root/otel_logs")
    val fs = base.getFileSystem(conf)
    val file = {
      val it = fs.listFiles(base, true)
      var found: Option[Path] = None
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) found = Some(st.getPath)
      }
      found.get
    }
    // simulate the crash window: original moved to .bak, replacement never
    // landed — the table has silently lost the file
    val bak = new Path(file.getParent, s".${file.getName}.stamp.bak")
    assert(fs.rename(file, bak))
    assert(!fs.exists(file))

    // the next stampTable run must restore AND stamp the file
    val n = FooterStamp.stampTable(spark, root, "otel_logs", Map("healed" -> "yes"))
    assert(n == 1L)
    assert(fs.exists(file) && !fs.exists(bak))
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
      finally r.close()
    assert(kv.get("healed").contains("yes"))
    assert(spark.read.parquet(s"$root/otel_logs").select("Body")
      .as[String].collect().sameElements(Array("y")))
  }
}
