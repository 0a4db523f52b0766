package graft

import org.apache.spark.sql.functions._

import graft.operators.OtelQueries

/** End-to-end at >golden scale on the ENGINE'S OWN OUTPUT: generate a
  * deterministic 20k-record / 8k-span OTLP landing corpus (≈250× the golden
  * fixtures), ingest through the full decode→flatten→partitioned-write
  * pipeline, then run the documented query set against the partitioned
  * tables the engine itself wrote — with closed-form expected counts from
  * the generator's formulas, and a partition-pruning assertion on the plan.
  */
class EngineOutputE2eSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  // deleteOnExit cannot remove non-empty dirs — this suite writes ~70 MB
  // per run and leaked /tmp measurably degraded ingest throughput in
  // round 3, so clean up explicitly
  private val created = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  override def afterAll(): Unit = {
    created.foreach(graft.io.Storage.deleteRecursively)
    super.afterAll()
  }

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    created += d
    d.getAbsolutePath
  }

  // one ingest for the whole suite
  private lazy val outRoot: String = {
    val landingLogs = tmp("graft-e2e-logs-in")
    val landingTraces = tmp("graft-e2e-traces-in")
    val out = tmp("graft-e2e-out")
    val nLogs = TestDataGen.writeLogs(landingLogs,
      files = 8, envelopesPerFile = 250, recordsPerEnvelope = 10)
    val nSpans = TestDataGen.writeTraces(landingTraces,
      tracesPerFile = 200, childrenPerTrace = 4)
    assert(nLogs == 20000L && nSpans == 8000L)
    val tel = new Telemetry(spark.sparkContext)
    Ingest.run(spark, Config.GraftConfig(), "logs", "jsonl",
      Seq(landingLogs), out, tel)
    Ingest.run(spark, Config.GraftConfig(), "traces", "jsonl",
      Seq(landingTraces), out, tel)
    assert(tel.snapshot(Telemetry.IngestRecords) == 28000L)
    out
  }

  test("ingested corpus lands complete and partitioned (250x golden scale)") {
    assert(OtelQueries.logs(spark, outRoot).count() == 20000L)
    assert(OtelQueries.traces(spark, outRoot).count() == 8000L)
    // the 30-hour window crosses the Feb-29 leap day into March
    val parts = OtelQueries.logs(spark, outRoot)
      .select("year", "month", "day").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(parts == Set((2024, 2, 28), (2024, 2, 29), (2024, 3, 1)))
  }

  test("documented queries over engine output: closed-form counts") {
    // severity formula: ERROR = g%10==0 (2000), FATAL = g%100==55 (200)
    val errs = OtelQueries.recentErrors(spark, outRoot, limit = 1000000)
    assert(errs.count() == 2200L)
    // volume: 8 services × 2500 records each
    val vol = OtelQueries.logVolumeByService(spark, outRoot).collect()
    assert(vol.length == TestDataGen.Services &&
      vol.forall(_.getLong(1) == 20000L / TestDataGen.Services))
    // top-k roots: 1600 root spans, k survive, ordered by duration desc
    val slow = OtelQueries.slowestTraces(spark, outRoot, k = 10).collect()
    assert(slow.length == 10)
    assert(slow.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    // linkage formula: log g errors iff g%5==0 → 4000 joined rows (one
    // distinct errored root per trace)
    assert(OtelQueries.logsForErroredTraces(spark, outRoot).count() == 4000L)
    // per-hour throughput: 30 distinct hours × 8 services
    assert(OtelQueries.spansPerHour(spark, outRoot).count() ==
      TestDataGen.SpanHours.toLong * TestDataGen.Services)
  }

  test("partition pruning reaches the file index on the engine's layout") {
    val df = OtelQueries.logs(spark, outRoot)
      .filter(col("service") === "svc-3" && col("month") === 3)
    // expected count straight from the generator's formulas: month 3 ⟺
    // hour index 26..29 of the 30-hour window; service 3 ⟺ (g/10)%8 == 3
    val expected = (0L until 20000L).count(g =>
      (g % TestDataGen.SpanHours) >= 26 && ((g / 10) % TestDataGen.Services) == 3)
    assert(df.count() == expected.toLong && expected > 0)
    // the predicate must prune partitions, not filter rows post-scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("service"),
      s"expected partition filters in:\n$plan")
    // sparkPlan, not executedPlan: AQE wraps the tree in an
    // AdaptiveSparkPlanExec LEAF, hiding the scan from collectLeaves
    val scanned = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
          .map(_.files.size).sum }
    val all = OtelQueries.logs(spark, outRoot).inputFiles.length
    assert(scanned.nonEmpty && scanned.head < all,
      s"pruned scan should read fewer files (${scanned.headOption} vs $all)")
  }
}
