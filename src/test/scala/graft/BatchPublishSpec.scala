package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.BatchPublish

/** [[graft.io.BatchPublish]] — the exactly-once foreachBatch publish
  * protocol (stage → deterministic rename → commit marker), exercised
  * through its crash windows. */
class BatchPublishSpec extends SparkTestBase {

  private def flatLogs() = graft.transform.Otlp.logs(
    graft.io.OtlpRead.jsonl(spark, graft.io.OtlpRead.Logs,
      "/root/reference/testdata/logs.jsonl"))

  private def rows(root: String): Long =
    spark.read.parquet(s"$root/otel_logs").count()

  test("publish is idempotent on the marker: a committed batch replays as a no-op") {
    val root = Files.createTempDirectory("graft-bp").toString
    val df = flatLogs()
    assert(BatchPublish.publish(df, root, "otel_logs", 0L))
    assert(rows(root) == 81)
    // replay after a crash that happened AFTER the marker: skipped entirely
    assert(!BatchPublish.publish(df, root, "otel_logs", 0L))
    assert(rows(root) == 81)
    // a different batch appends
    assert(BatchPublish.publish(df, root, "otel_logs", 1L))
    assert(rows(root) == 162)
  }

  test("a replay after a crash BEFORE the marker overwrites the crashed " +
      "attempt's files instead of duplicating them (deterministic names)") {
    val root = Files.createTempDirectory("graft-bp2").toString
    val df = flatLogs()
    BatchPublish.publish(df, root, "otel_logs", 0L)
    val before = listDataFiles(root)
    // simulate the crash window: all files moved, marker never written
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$root/_graft_commits/otel_logs/0"), false))
    assert(BatchPublish.publish(df, root, "otel_logs", 0L), "must re-publish")
    assert(rows(root) == 81, "no duplicate rows after the replay")
    assert(listDataFiles(root) == before, "same deterministic file names")
  }

  test("the staged layout publishes into the live partition dirs and " +
      "stamping marks exactly the batch's files") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-bp3").toString
    BatchPublish.publish(flatLogs(), root, "otel_logs", 7L, stamp = true)
    val files = listDataFiles(root)
    assert(files.nonEmpty && files.forall(_.contains("service=")))
    assert(files.forall(f => f.split("/").last.startsWith("b7-")))
    // no staging or marker debris visible to a directory read
    assert(rows(root) == 81)
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf))
      val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
        finally r.close()
      assert(kv.get(graft.io.FooterStamp.SchemaVersionKey)
        .contains(graft.schema.OtlpSchemas.LogsSchemaVersion), f)
    }
  }

  test("marker retention: commits older than the retain window are swept, " +
      "recent ones stay consultable for replay skips") {
    val root = Files.createTempDirectory("graft-bp4").toString
    val df = flatLogs()
    (0L to 5L).foreach(b =>
      BatchPublish.publish(df, root, "otel_logs", b, retainMarkers = 3L))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markers(): Set[String] = {
      val dir = new org.apache.hadoop.fs.Path(s"$root/_graft_commits/otel_logs")
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).map(_.getPath.getName).toSet
    }
    // after batch 5 with retain=3: markers ≤ 2 swept, {3,4,5} kept
    assert(markers() == Set("3", "4", "5"), markers().toString)
    // a retained batch still replays as a no-op
    assert(!BatchPublish.publish(df, root, "otel_logs", 5L, retainMarkers = 3L))
    assert(rows(root) == 81 * 6)
  }

  private def listDataFiles(root: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(s"$root/otel_logs")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toUri.getPath
    }
    out.sorted.toSeq
  }
}
