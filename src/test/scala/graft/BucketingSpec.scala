package graft

import graft.operators.{Bucketing, QuerySurface}

/** Bucketed-layout shuffle elimination: the bucketed events table must
  * answer per-user work without an Exchange, and agree with the plain
  * pipeline's results. */
class BucketingSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed events: windowed session counts run exchange-free and agree") {
    spark.sql("DROP TABLE IF EXISTS events_bucketed_test")
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

  test("cluster-partitioned embeddings: probes prune to the probed lists") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-layout").toString + "/emb"
    Bucketing.writeEmbeddingsByCluster(spark, sf, path, k = 4, iters = 1)

    val probed = Bucketing.probeClusters(spark, path, Seq(0L, 2L))
    // the cluster predicate must be a partition filter (pruned at listing
    // time), not a post-scan data filter
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster"),
      s"cluster filter should prune partitions:\n$scan")

    // probe result = exactly the vectors assigned to those clusters
    val assign = operators.Clustering.kmeans(spark, sf, k = 4, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cluster")).toMap
    val want = assign.filter(kv => kv._2 == 0L || kv._2 == 2L).keySet
    assert(probed.collect().map(_.getAs[Long]("vec_id")).toSet == want)
  }
}
