package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Plan-shape assertions for the scale claims SCALE.md makes in prose:
  * pushdown reaches the scan, top-k avoids a global sort, dimension joins
  * broadcast, CUBE expands once, the KMV sketch plans as a partial/final
  * object-hash aggregate. PlanAudit prints these for eyeballing; this spec
  * makes them regressions. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // A ScalaUDF renders in executed-plan strings as `UDF(args)` — its
  // toString is `udfName.getOrElse("UDF")(children)`, so the literal class
  // name NEVER appears and a bare `!contains("ScalaUDF")` assertion is
  // vacuous (round-14 find: every such assertion in this suite passed
  // against any plan whatsoever). Both needles, and a positive control
  // below pins the rendering so a Spark upgrade can't silently re-vacuate
  // the negative assertions.
  private def hasScalaUdf(plan: String): Boolean =
    plan.contains("ScalaUDF") || plan.contains("UDF(")

  test("positive control: an actual ScalaUDF is visible to hasScalaUdf") {
    val f = udf { (s: String) => s.length }
    val df = spark.range(3)
      .select(f(col("id").cast("string")).as("n"))
    df.count()
    assert(hasScalaUdf(planOf(df)),
      "the UDF needle no longer matches Spark's ScalaUDF rendering — " +
        "every negative UDF assertion in this suite just went vacuous")
  }

  test("time-range filter is pushed to the parquet scan (physical ns column)") {
    val plan = planOf(QuerySurface.filterTime(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan)
    // the pushed predicate must be on the raw ns values, not a derived col
    assert(plan.contains("GreaterThanOrEqual(ts,") ||
      plan.contains("GreaterThanOrEqual(ts_us,"), plan)
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(QuerySurface.topK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dimension joins broadcast (q5 star join)") {
    val plan = planOf(QuerySurface.q5RegionRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }

  test("CUBE plans ONE Expand + hash aggregate, not 2^k scans") {
    val plan = planOf(QuerySurface.cubeCounts(spark, sf))
    assert("Expand".r.findAllIn(plan).length >= 1)
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"cube must scan the fact table exactly once:\n$plan")
  }

  test("multi-distinct plans ONE scan with Expand, not a scan per distinct") {
    val plan = planOf(QuerySurface.multiDistinct(spark, sf))
    assert("Expand".r.findAllIn(plan).nonEmpty,
      s"multiple COUNT(DISTINCT) must plan via Expand:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"multi-distinct must scan the fact table exactly once:\n$plan")
  }

  test("KMV sketch plans as partial/final ObjectHashAggregate (no sort)") {
    val hashed = Tables.events(spark, sf).select(col("event_type"),
      udf((s: String) => graft.functions.PortableHash.md5Lower63(s))
        .apply(col("user_id").cast("string")).as("h"))
    val plan = planOf(hashed.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), 16)))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmv_bottomk"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("qsketch percentile sample plans as partial/final ObjectHashAggregate") {
    val hashed = Tables.lineitem(spark, sf).select(col("l_returnflag"),
      col("l_extendedprice"),
      udf((s: String) => graft.functions.PortableHash.md5Lower63(s))
        .apply(col("l_orderkey").cast("string")).as("h"))
    val plan = planOf(hashed.groupBy(col("l_returnflag"))
      .agg(graft.functions.QsketchAggregate
        .qsketchBottomK(col("h"), col("l_extendedprice"), 256)))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_qsketch_bottomk"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("rarity broadcasts the df table under the vocab limit") {
    val plan = planOf(TextAnalysis.rarity(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("rarity falls back to a shuffle join above the vocab limit") {
    // limit 0 forces the over-threshold path: the df side must NOT broadcast
    // (web-scale vocab would OOM the driver), and the hint must also defeat
    // Spark's size-estimated auto-broadcast of the small test table
    val plan = planOf(TextAnalysis.rarity(spark, sf, broadcastVocabLimit = 0L))
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("bloom-join prunes before the semi join and aggregates after") {
    val plan = planOf(Sketches.bloomJoin(spark, sf))
    // the checkpointed result hides the upstream plan; re-derive the shape
    // from the un-checkpointed pipeline pieces instead
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val semiPlan = planOf(Tables.lineitem(spark, sf)
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"), "left_semi"))
    assert(semiPlan.contains("BroadcastHashJoin") &&
      semiPlan.contains("LeftSemi"), semiPlan)
    assert(plan.nonEmpty)
  }

  test("bm25 ranks via TakeOrderedAndProject with the df side broadcast") {
    val plan = planOf(TextAnalysis.bm25(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // no global sort anywhere: top-k is the only ordering operator
    assert(!plan.contains("SortExec"), plan)
  }

  test("fuzzy join plans one equi-join on the block key, never a cartesian") {
    val plan = planOf(QuerySurface.fuzzyJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("decay agg broadcasts the one-row max-ts side") {
    val plan = planOf(QuerySurface.decayAgg(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // exactly one wide shuffle: the user_id aggregate (the max-ts agg is a
    // single-partition exchange, not keyed)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("event paths finish with TakeOrderedAndProject over one window pass") {
    val plan = planOf(QuerySurface.eventPaths(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Sort [n"), plan) // no global sort of the counts
    assert(plan.split("Window").length - 1 <= 1, plan) // both leads share one window
  }

  test("anomaly z-test runs as ONE window operator (count+sum+sum share the frame)") {
    val plan = planOf(QuerySurface.anomalyZscore(spark, sf))
    assert(plan.split("\\bWindow\\b").length - 1 == 1, plan)
  }

  test("keywords broadcast the df vocabulary side") {
    val plan = planOf(TextAnalysis.keywords(spark, sf))
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("delta agg merge plans partial/final hash aggregates, no sort-based agg") {
    val plan = planOf(Mutations.deltaAgg(spark, sf))
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("span coverage shuffles 8-byte gram keys, never document text") {
    // the dup-hash groupBy and the left-semi join key on `gh` (a LongType
    // hash); the only stage carrying `text` is the pre-explode scan
    val df = Dedup.spanCoverage(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("LeftSemi"), plan)
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
  }

  test("cms grid join broadcasts the 768-cell side") {
    val plan = planOf(Sketches.cmsTopk(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("zone-map audit is aggregate-only: no global sort or window") {
    val plan = planOf(Bucketing.zoneMapAudit(spark, sf))
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
    // the min/max bounds come from one broadcast of the 1-row aggregate
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("markov probability division joins a broadcast totals side") {
    val plan = planOf(QuerySurface.markovTransitions(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("chi2 marginal grid joins are broadcasts over the aggregate, not the facts") {
    val plan = planOf(QuerySurface.chiSquared(spark, sf))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("percentile time series windows partition by hour — no global (empty-key) sort") {
    val plan = planOf(QuerySurface.percentileTs(spark, sf))
    assert(plan.contains("Window"), plan)
    // every window spec carries the hour partition key
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(hour_us".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
  }

  // The three former empty-key global-rank windows (pack_shards, q_lorenz,
  // text_quality_ntile) now rank via Ranks.globalRank: a distributed range
  // sort + broadcast offset join. The killer shape was `windowspecdefinition`
  // with no partition key → Exchange SinglePartition over ALL rows; assert
  // it is gone entirely (the only SinglePartition exchanges left feed
  // 1-row final aggregates, which move bytes, not the data).
  private def assertDistributedRank(plan: String): Unit = {
    assert(!plan.contains("windowspecdefinition"), plan)
    // the distributed range-sort pass now runs inside globalRank's eager
    // checkpoint job (single boundary draw — see Ranks scaladoc), so the
    // gate's own plan shows the checkpointed scan, not the exchange
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("BroadcastExchange"), plan) // the ≤32-row offset join
  }

  test("pack_shards ranks without any window — no SinglePartition data funnel") {
    assertDistributedRank(planOf(Sampling.packShards(spark, sf)))
  }

  // globalRank's offsets are only correct if the counts branch reads the
  // SAME materialized range partitioning as the output branch (the same
  // sampled boundaries). Exchange reuse provides that for plain scans but
  // NOT for persist()ed inputs under AQE: each branch then compiles its
  // own adaptive subplan over the cached relation and draws boundaries
  // with a different sampler seed — observed live as 19k of 20k ranks
  // corrupted, 100% reproducible. globalRank now pins one boundary draw
  // via an eager localCheckpoint; this is the regression test that the
  // OLD shape fails: rank a CACHED frame by a key equal to a known dense
  // sequence and demand exact agreement, plus the uncached shape.
  test("globalRank is exact over persisted AND plain inputs (single " +
      "boundary draw)") {
    // 50k rows so the range sampler sees a SUBSET (seed-dependent
    // boundaries) — at a few hundred rows the sample is the whole input
    // and even the broken two-draw shape happens to agree
    val big = spark.range(50000)
      .withColumn("h", hash(col("id"))).select(col("id"), col("h"))
    for (cached <- Seq(false, true)) {
      val in = if (cached) big.persist() else big
      val ranked = Ranks.globalRank(in, "rk", Seq(col("h"), col("id")))
        .withColumn("dense", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("h"), col("id"))))
      val bad = ranked.filter(col("rk") =!= col("dense")).count()
      assert(bad == 0, s"cached=$cached: $bad mis-ranked rows")
      if (cached) in.unpersist(true)
    }
  }

  // assertDistributedRank above can only see the gate's own plan, where
  // the rank pass appears as `Scan ExistingRDD` (the checkpointed blocks)
  // — ANY checkpoint satisfies that token (ADVICE r13). The scale
  // property lives in the CHECKPOINT JOB's plan: the range sort must be a
  // rangepartitioning exchange across partitions, never an
  // `Exchange SinglePartition` funnel. Capture that job's executed plan
  // with a QueryExecutionListener (the eager localCheckpoint runs through
  // Dataset.withAction, funcName "localCheckpoint") and assert on it
  // directly, for both the plain and the fused rank cores.
  test("rank cores' checkpoint jobs range-partition — no SinglePartition " +
      "sort inside globalRank/rankAndPrefixSum") {
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(s"[$funcName]\n" + qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import scala.jdk.CollectionConverters._
      def checkpointPlans(body: => Unit): Seq[String] = {
        captured.clear()
        body
        // the execution-listener bus is asynchronous — poll until the
        // checkpoint job's plan lands (or time out and fail with context)
        val deadline = System.currentTimeMillis() + 30000
        while (!captured.asScala.exists(p =>
            p.startsWith("[localCheckpoint]") &&
              p.contains("rangepartitioning")) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        captured.asScala.toList.filter(_.startsWith("[localCheckpoint]"))
      }
      val df = spark.range(50000)
        .withColumn("h", hash(col("id"))).select(col("id"), col("h"))
      val rankPlans = checkpointPlans(
        Ranks.globalRank(df, "rk", Seq(col("h"), col("id"))).count())
      val fusedPlans = checkpointPlans(
        Ranks.rankAndPrefixSum(df, "rk", "id", "cum",
          Seq(col("h"), col("id"))).count())
      for ((plans, name) <- Seq((rankPlans, "globalRank"),
          (fusedPlans, "rankAndPrefixSum"))) {
        val ranged = plans.filter(_.contains("rangepartitioning"))
        assert(ranged.nonEmpty,
          s"$name: no captured checkpoint plan contains a rangepartitioning" +
            s" exchange:\n${plans.mkString("\n---\n")}")
        ranged.foreach(p => assert(!p.contains("Exchange SinglePartition"),
          s"$name checkpoint job funnels through one partition:\n$p"))
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("q_lorenz ranks without any window — no SinglePartition data funnel") {
    assertDistributedRank(planOf(QuerySurface.lorenzDeciles(spark, sf)))
  }

  test("text_quality_ntile ranks without any window — no SinglePartition data funnel") {
    assertDistributedRank(planOf(TextAnalysis.qualityNtile(spark, sf)))
  }

  test("exact binary dedup shuffles the 32-byte hash, never document text") {
    val plan = planOf(Multimodal.exactDupGroups(spark, sf))
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
  }

  test("curation pipeline shuffles digests and group keys, never document text") {
    val plan = planOf(TextAnalysis.curationPipeline(spark, sf))
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
    // the final-token total joins as a 1-row broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  // -- round 9 plan shapes ---------------------------------------------------

  test("text_chunking is map+explode only — zero exchanges before the " +
      "output sort, whole pipeline codegen'd") {
    val plan = planOf(TextAnalysis.chunking(spark, sf))
    // the only exchange is the final ORDER BY's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // the chunk hash is the native codegen expression, not a ScalaUDF
    assert(plan.contains("md5_lower63(") && !hasScalaUdf(plan), plan)
  }

  test("text_chunk_delta exchanges carry chunk identities, never text") {
    val plan = planOf(TextAnalysis.chunkDelta(spark, sf))
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
  }

  test("otel_burn_rate plans as two aggregates and a join — no window") {
    val plan = planOf(OtelQueries.burnRate(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("dedup_minhash_lsh signs via the native expression — no ScalaUDF " +
      "on the signature path") {
    val plan = planOf(Dedup.minhashLsh(spark, sf))
    assert(plan.contains("minhash_sig") || !plan.contains("UDF"), plan)
  }

  test("q_ols is ONE map-side-combined aggregate — no window, no join") {
    val plan = planOf(QuerySurface.ols(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), plan)
    // partial + final pair around a single exchange: the sufficient-stats
    // shape that scales as one scan at 100 TB
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("q_acf aggregates first — the lag join runs on the (type,hour) count " +
      "frame, not row scale, and no window anywhere") {
    val plan = planOf(QuerySurface.acf(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    // both join inputs are aggregates of the scan (the only row-scale pass)
    val joinAt = plan.indexOfSlice("Join")
    assert(joinAt >= 0, plan)
    assert(plan.substring(joinAt).contains("HashAggregate"), plan)
  }

  test("q_mad_outliers windows partition by event_type — never empty-key — " +
      "and the median frames join as broadcasts") {
    val plan = planOf(QuerySurface.madOutliers(spark, sf))
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(event_type".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("dedup_containment shuffles 8-byte shingle hashes, never text") {
    val (frame, cached) = Dedup.shingleContainmentFrame(spark, sf)
    val plan = try planOf(frame) finally { cached.foreach(_.unpersist()); () }
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
    // the hot-shingle blacklist joins as a broadcast anti-join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("otel_root_cause filters the error subset BEFORE the per-trace " +
      "window shuffle; windows key on trace_id") {
    val plan = planOf(OtelQueries.errorRootCause(spark, sf))
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(trace_id".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
  }

  test("otel_self_time is one child aggregate + one trace-keyed join — " +
      "no window") {
    val plan = planOf(OtelQueries.selfTime(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("pair_preference shuffles (source, id, score) — document text never " +
      "leaves the scan; windows key on source") {
    val plan = planOf(Sampling.preferencePairs(spark, sf))
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(source".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
    val exchanges = plan.split("Exchange hashpartitioning").toSeq.tail
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.takeWhile(_ != ')').contains("text")), plan)
  }

  test("q_winsorize windows key on event_type; the band frame joins as a " +
      "broadcast") {
    val plan = planOf(QuerySurface.winsorize(spark, sf))
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(event_type".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q_kendall: no window anywhere; the pair join runs on aggregates of " +
      "the scan, never row scale") {
    val plan = planOf(QuerySurface.kendall(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    // the self-join's inputs are the hourly aggregate — a HashAggregate
    // must appear before (deeper than) the join in the tree dump
    val joinAt = plan.indexOfSlice("Join")
    assert(joinAt >= 0 && plan.indexOf("HashAggregate", joinAt) >= 0, plan)
  }

  test("q_spearman: both rank windows key on event_type over the hourly " +
      "aggregate — no empty-key window, no row-scale sort") {
    val plan = planOf(QuerySurface.spearman(spark, sf))
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(event_type".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
    assert(!plan.contains("SinglePartition, ENSURE_REQUIREMENTS"), plan)
  }

  test("q_gini: grouped rank is distributed — no window, range shuffle + " +
      "broadcast offsets (the globalRank shape, extended per group)") {
    val plan = planOf(QuerySurface.gini(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q_bootstrap_ci: the B-fold fan-out is builtins feeding a partial " +
      "aggregate — no ScalaUDF, explode present, CI window keyed by type") {
    val plan = planOf(QuerySurface.bootstrapCi(spark, sf))
    assert(!hasScalaUdf(plan), plan)
    assert(plan.contains("Generate explode"), plan)
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val keyed = "windowspecdefinition\\(event_type".r.findAllIn(plan).length
    assert(specs > 0 && specs == keyed, plan)
    // partial/final aggregate pair around the (type, b) shuffle
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("OTLP flatten plans are ScalaUDF-free: id decode (incl. the link-id " +
      "arrays inside transform lambdas) is codegen-native") {
    import graft.io.OtlpRead
    import graft.transform.Otlp
    val ref = "/root/reference/testdata"
    val logs = Otlp.logs(OtlpRead.jsonl(spark, OtlpRead.Logs, s"$ref/logs.jsonl"))
    val traces = Otlp.traces(OtlpRead.jsonl(spark, OtlpRead.Traces, s"$ref/traces.jsonl"))
    Seq("otel_logs" -> logs, "otel_traces" -> traces).foreach { case (name, df) =>
      val plan = planOf(df)
      assert(!hasScalaUdf(plan), s"$name flatten still plans a ScalaUDF:\n$plan")
    }
  }

  test("embedding family plans are ScalaUDF-free: assign/encode/ADC/sig/" +
      "quantize run as native kernel expressions inside codegen") {
    // the six 100 TB embedding-scale operators from the round-9 verdict,
    // plus the LSH-signature and quantize users of the same kernel layer
    val plans = Seq(
      "cluster_kmeans" -> Clustering.kmeans(spark, sf, k = 4, iters = 1),
      "cluster_eval" -> Clustering.clusterEval(spark, sf, k = 4, iters = 1),
      "dedup_semantic" -> Similarity.semanticDedup(spark, sf, k = 4, iters = 1),
      "sim_ann_ivf_kmeans" -> Similarity.annIvfKmeans(spark, sf,
        kClusters = 4, kmIters = 1),
      "sim_ann_pq" -> Similarity.annPq(spark, sf),
      "sim_centroid_drift" -> Similarity.centroidDrift(spark, sf),
      "sim_quantize" -> Similarity.quantize(spark, sf),
      "dedup_embedding_lsh" -> Similarity.cosinePairsLsh(spark, sf))
    plans.foreach { case (name, df) =>
      val plan = planOf(df)
      assert(!hasScalaUdf(plan), s"$name still plans a ScalaUDF:\n$plan")
    }
  }
}
