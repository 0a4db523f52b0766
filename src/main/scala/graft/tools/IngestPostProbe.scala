package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 measurement for the `ingest_post` inversion (VERDICT r8 task 6):
  * the round-8 driver artifact recorded the POST-sweep ingest at 32.2k
  * rows/s median (with one 10.5 s stall pass) while the pre-sweep ran 67.0k
  * — inverting the "warmed engine is faster" expectation. This probe
  * reproduces the bench's exact phase order in one JVM and instruments
  * what the bench cannot see:
  *
  *   1. pre-sweep ingest (the same `Bench.ingestRowsPerSec`, 5 passes),
  *   2. a one-shot sweep of every gate query (each once — the page-cache /
  *      JIT / storage-memory end state of the real 4-execution sweep
  *      without its wall cost),
  *   3. post-sweep ingest immediately (bench parity),
  *   4. post-sweep ingest after an explicit GC + 5 s settle,
  *
  * recording per-phase JVM GC time, heap occupancy, and storage-memory
  * block counts, so a post-only slowdown can be attributed: GC pressure
  * from sweep survivors → (4) recovers; page-cache eviction by the sweep's
  * parquet reads → (3) and (4) both slow, pass times uniform; a one-off VM
  * stall → one outlier pass, medians agree. Emits one JSON line.
  */
object IngestPostProbe {

  private def gcStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  private def heapUsedMb(): Long = {
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def phase[A](name: String)(body: => A): (A, String) = {
      val (gc0, gct0) = gcStats()
      val t0 = System.nanoTime()
      val a = body
      val wall = (System.nanoTime() - t0) / 1e9
      val (gc1, gct1) = gcStats()
      (a, f""""$name":{"wall_s":$wall%.2f,"gc_n":${gc1 - gc0},"gc_ms":${gct1 - gct0},"heap_mb":${heapUsedMb()}}""")
    }

    // same table warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("nation", "region", "customer", "supplier", "orders", "lineitem",
      "events", "documents", "embeddings", "part")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    def ingestJson(r: graft.Bench.IngestResult): String = {
      val passes = r.passSeconds.map(t => f"$t%.3f").mkString("[", ",", "]")
      s"""{"pass_s":$passes,"median":${r.medianRowsPerSec},"best":${r.bestRowsPerSec}}"""
    }

    val (pre, prePh) = phase("pre") { graft.Bench.ingestRowsPerSec(spark) }

    val (_, sweepPh) = phase("sweep") {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.catalog.clearCache()
        System.gc()
        try fn(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"sweep $name: $t") }
      }
      spark.catalog.clearCache()
      System.gc() // the bench's own pre-ingest_post hygiene
    }

    val (postNow, postNowPh) = phase("post_immediate") {
      graft.Bench.ingestRowsPerSec(spark)
    }

    System.gc(); Thread.sleep(5000); System.gc()
    val (postGc, postGcPh) = phase("post_after_gc_settle") {
      graft.Bench.ingestRowsPerSec(spark)
    }

    println(s"""{"sf":"$sfDir","pre":${ingestJson(pre)},"post_immediate":${
      ingestJson(postNow)},"post_after_gc_settle":${ingestJson(postGc)},"phases":{$prePh,$sweepPh,$postNowPh,$postGcPh}}""")
    spark.stop()
  }
}
