package graft

import graft.operators.{Bucketing, QuerySurface}

/** Bucketed-layout shuffle elimination: the bucketed events table must
  * answer per-user work without an Exchange, and agree with the plain
  * pipeline's results. */
class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** DROP TABLE alone can't clear residue from a crashed earlier JVM: the
    * in-memory catalog starts empty, so the drop is a no-op while the
    * warehouse LOCATION dir survives on disk and fails the next create
    * with LOCATION_ALREADY_EXISTS. Clear both. */
  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
  }

  test("bucketed events: windowed session counts run exchange-free and agree") {
    dropManaged("events_bucketed_test")
    Bucketing.writeEventsBucketed(spark, sf, "events_bucketed_test", buckets = 8)

    val bucketed = Bucketing.sessionCountsBucketed(spark, "events_bucketed_test")
    val plan = bucketed.queryExecution.executedPlan.toString
    // orderBy at the end introduces a range exchange; the keyed work before
    // it must have no hash exchange on user_id
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 0,
      s"bucket layout should satisfy the window/groupBy partitioning:\n$plan")

    // same numbers as the plain sessionize pipeline, aggregated per user
    val viaPlain = QuerySurface.sessionize(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(rows =>
        (rows.map(_.getAs[Long]("session_id")).max,
          rows.map(_.getAs[Long]("n_events")).sum)).toMap
    val viaBucketed = bucketed.collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(viaBucketed == viaPlain)
    spark.sql("DROP TABLE IF EXISTS events_bucketed_test")
  }

  test("bucketed events: per-user join runs with zero hash exchanges") {
    dropManaged("events_bucketed_join_test")
    Bucketing.writeEventsBucketed(spark, sf, "events_bucketed_join_test", buckets = 8)
    // disable auto-broadcast: a BroadcastHashJoin would also be
    // exchange-free but would prove nothing about the bucket layout — the
    // claim under test is that BOTH the aggregate and the shuffle join
    // inherit HashPartitioning(user_id) from the bucket spec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("events_bucketed_join_test")
      val perUser = t.groupBy(org.apache.spark.sql.functions.col("user_id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val joined = t.join(perUser, "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      val hashExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(hashExchanges == 0,
        s"bucketed join should need no exchange on either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"join must be a shuffle-family join satisfied by buckets:\n$plan")
      // and the numbers agree with the plain pipeline
      val n = joined.count()
      val plainEvents = operators.Tables.events(spark, sf).count()
      assert(n == plainEvents, s"join must keep all $plainEvents events, got $n")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS events_bucketed_join_test")
    }
  }

  test("cluster-partitioned embeddings: probes prune to the probed lists") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-layout").toString + "/emb"
    Bucketing.writeEmbeddingsByCluster(spark, sf, path, k = 4, iters = 1)

    val probed = Bucketing.probeClusters(spark, path, Seq(0L, 2L))
    // the cluster predicate must be a NON-EMPTY partition filter (pruned at
    // listing time), not a post-scan data filter
    val scan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(scan).isDefined,
      s"cluster filter should appear inside PartitionFilters:\n$scan")
    // and the pruning must be REAL: the scan's numFiles metric after
    // execution counts only the probed clusters' files, strictly fewer
    // than the directory holds across all 4 clusters
    val scanExec = probed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    probed.collect()
    val filesRead = scanExec.metrics("numFiles").value
    val totalFiles = spark.read.parquet(path).inputFiles.length
    assert(filesRead > 0 && filesRead < totalFiles,
      s"probe must read fewer files ($filesRead) than the table has ($totalFiles)")

    // probe result = exactly the vectors assigned to those clusters
    val assign = operators.Clustering.kmeans(spark, sf, k = 4, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cluster")).toMap
    val want = assign.filter(kv => kv._2 == 0L || kv._2 == 2L).keySet
    assert(probed.collect().map(_.getAs[Long]("vec_id")).toSet == want)
  }
}
