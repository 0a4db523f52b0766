package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-surface executed-plan audit (verdict r13 task 6): runs EVERY
  * `SparkEntry.queries` gate at the given sf and machine-checks, over
  * every executed plan the gate's run produces (a QueryExecutionListener
  * captures internal jobs too — localCheckpoint materializations,
  * foreachBatch writes — not just the returned frame's plan):
  *
  *  1. **No SinglePartition exchange of DATA.** `Exchange SinglePartition`
  *     is waived only when its direct child is a partial aggregate or a
  *     local limit (≤1 row / ≤k rows per upstream partition cross the
  *     wire — bytes, not data); anything else is the classic 100 TB
  *     funnel (empty-key window, global sort into one task).
  *  2. **No CartesianProduct.** `CartesianProductExec` is by definition
  *     the non-broadcast cross join; the acceptable broadcast form plans
  *     as BroadcastNestedLoopJoin and never matches.
  *  3. **No ScalaUDF without a def-site waiver.** Gates listed in
  *     [[UdfWaivers]] carry closures whose def sites document why no
  *     native kernel exists (inventory measured by [[UdfAuditProbe]],
  *     per-site sf1 costs in SCALE.md); any OTHER gate planning a
  *     ScalaUDF is a regression.
  *
  * Per-gate JSON rows + a summary line go to stdout AND
  * `target/planaudit.json` — committed per round as PLANAUDIT_r{N}.json
  * (the SCALESWEEP discipline applied to plan shapes). A row is
  * `"ok": false` iff it has an unwaived hit; the summary counts them and
  * the close checklist requires zero.
  *
  * Coverage caveat (documented, not hidden): plans executed purely as
  * RDD jobs and streaming IncrementalExecutions don't pass the
  * listener; foreachBatch-internal batch actions and eager checkpoints
  * do. PlanSpec's targeted assertions remain the deep check for shapes
  * the sweep can't see.
  *
  * Usage: PlanAuditAll [sfDir] [onlyCsv]
  */
object PlanAuditAll {

  /** Gates whose executed plans may contain a ScalaUDF: every entry maps
    * to a def-site-documented closure (see the UdfAuditProbe inventory).
    * Keyed by gate-name PREFIX match is deliberately avoided — exact
    * names only, so a new gate reusing a waived UDF must be waived
    * consciously. */
  lazy val UdfWaivers: Map[String, String] = DefaultUdfWaivers ++
    sys.env.get("GRAFT_PLANAUDIT_UDF_WAIVERS").map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map(_ -> "env waiver").toMap)
      .getOrElse(Map.empty)

  /** Gates whose plans may contain a SinglePartition exchange of data,
    * each with the def-site doc that bounds the rows crossing it. */
  val SinglePartitionWaivers: Map[String, String] = Map(
    "q_skyline" -> ("skyline2D phase-2 merge: empty-key window over the " +
      "union of per-salt LOCAL skylines — expected O(salts*log n) rows at " +
      "any corpus scale (QuerySurface.skyline2D def-site doc)")
  )

  /** The checked-in waiver list with rationale — each UDF names its
    * def-site scaladoc as the waiver record. This is the EXACT set of
    * gates whose executed plans showed a `UDF(` hit in the round-14 full
    * audit (258 gates) — no speculative entries: a stale waiver masks a
    * future regression exactly like a missing check. */
  private val DefaultUdfWaivers: Map[String, String] = Map(
    // Each waiver states why NO codegen builtin expresses the kernel
    // (verdict r15 task 6): Spark's array HOFs evaluate interpreted with
    // boxed lambdas per element, so "rewrite with transform/aggregate"
    // trades a measured JVM closure for a slower interpreted tree — the
    // UdfAuditProbe/SCALE.md r12 audit measured each closure as the
    // kernel's real cost, not the ScalaUDF fence.
    "dedup_simhash" -> "Dedup.simhashUdf: 64 parallel bit-counters over token hashes in one pass — needs a 64-cell mutable accumulator per row; no builtin holds per-row mutable state (UdfAuditProbe-measured: hashing dominates)",
    "dedup_decontaminate" -> "Sampling.ngramHash8Udf: rolling 8-gram md5 over a token array emitting one hash per offset — the md5 kernel (custom PortableHash) is not a builtin and HOF composition would re-join 8 tokens per position interpreted",
    "dedup_span_coverage" -> "Dedup.gramPosHashUdf: positional gram md5 hashes behind posexplode — same md5-per-window kernel (SCALE.md r12: 0.19 s udf-only at sf1; the digest IS the cost)",
    "pack_chunks_overlap" -> "Sampling.chunkUdfFor: stride chunker closing over (len, stride) — emits variable-count substring rows per doc; sequence+transform could express it but runs interpreted with per-chunk boxed closures over the same substring calls",
    "pipe_curation" -> "TextAnalysis.classifierScoreUdf + shingle filter in the curation chain — weighted feature scorer over a token array with early-exit loops; no builtin expresses the fused multi-feature pass",
    "q_kmv_overlap" -> "Dedup.shingleUdf feeding the per-source KMV sketches — md5 k-shingle kernel (custom hash, not a builtin)",
    "q_zorder_ranked" -> "Bucketing.mkUb: binary-search quantile bucketer on both z-order axes — closes over the collected boundary array; width_bucket is not portable to the oracle's rank rule and a CASE chain over ~100 boundaries defeats codegen method limits",
    // q_bloom_join's waiver retired r16: the probe is now the native
    // BloomFilterMightContain codegen expression (Sketches.bloomJoin)
    "text_fingerprint" -> "TextAnalysis.winnowUdf: winnowing window min (per-codepoint md5 k-grams + monotonic-deque window min — no codegen builtin expresses it; array HOFs run interpreted and the md5 kernel is the cost)",
    "text_quality_classifier" -> "TextAnalysis.classifierScoreUdf — fused multi-feature scorer (see pipe_curation)",
    "text_repetition" -> "TextAnalysis.repetitionStatsUdf — duplicate-line/gram ratios needing per-row hash maps over token arrays; no builtin holds per-row mutable state",
    "text_vocab_growth" -> "TextAnalysis.vocabGram3Udf — per-row distinct-gram set accumulation (mutable HashSet per row; interpreted HOFs would rebuild the gram strings per element)"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] =
      if (args.length >= 2) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        try captured.add(qe.executedPlan.toString)
        catch { case _: Throwable => () } // a to-string crash must not kill the job
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val out = new StringBuilder
    var unwaived = 0
    var failedGates = 0
    names.foreach { case (name, fn) =>
      captured.clear()
      val err = try {
        val df = fn(spark, sfDir)
        df.count()
        // snapshot the gate's own final plan plus everything the async
        // listener bus delivers (poll until stable, max 5 s)
        captured.add(df.queryExecution.executedPlan.toString)
        None
      } catch { case t: Throwable => Some(t.toString.take(200)) }
      var last = -1
      val deadline = System.currentTimeMillis() + 5000
      while (captured.size != last && System.currentTimeMillis() < deadline) {
        last = captured.size
        Thread.sleep(200)
      }
      import scala.jdk.CollectionConverters._
      val plans = captured.asScala.toList
      val spHits = plans.flatMap(singlePartitionViolations)
      if (sys.env.contains("GRAFT_PLANAUDIT_DUMP") && spHits.nonEmpty)
        plans.filter(p => singlePartitionViolations(p).nonEmpty)
          .foreach(p => System.err.println(s"==== $name ====\n$p"))
      val spWaived = SinglePartitionWaivers.contains(name)
      val spViol = if (spWaived) Nil else spHits
      val cartesian = plans.count(_.contains("CartesianProduct"))
      // a ScalaUDF renders as `UDF(args)` (udfName.getOrElse("UDF")) —
      // the literal class name never appears in plan strings (round-14
      // find; PlanSpec carries the positive control for the needle)
      val udfHits =
        plans.count(p => p.contains("ScalaUDF") || p.contains("UDF("))
      if (sys.env.contains("GRAFT_PLANAUDIT_DUMP") && udfHits > 0)
        plans.filter(p => p.contains("ScalaUDF") || p.contains("UDF("))
          .foreach(p => System.err.println(s"==== UDF $name ====\n" +
            p.split('\n').filter(l => l.contains("ScalaUDF") ||
              l.contains("UDF(")).mkString("\n").take(2000)))
      val waived = UdfWaivers.contains(name)
      val udfViol = if (udfHits > 0 && !waived) udfHits else 0
      val ok = err.isEmpty && spViol.isEmpty && cartesian == 0 && udfViol == 0
      if (!ok) {
        if (err.isDefined) failedGates += 1
        else unwaived += 1
      }
      def js(xs: Seq[String]) =
        xs.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
          .mkString("[", ",", "]")
      val row = s"""{"q":"$name","plans":${plans.size},"single_partition":${js(spHits.distinct)},"sp_waived":$spWaived,"cartesian":$cartesian,"scala_udf":$udfHits,"udf_waived":$waived,"ok":$ok${err.map(e => s""","error":${js(Seq(e)).drop(1).dropRight(1)}""").getOrElse("")}}"""
      println(row)
      out.append(row).append('\n')
    }
    val summary = s"""{"metric":"planaudit","n_gates":${names.size},"registry_n":${graft.SparkEntry.queries.size},"unwaived":$unwaived,"failed":$failedGates,"sf":"$sfDir"}"""
    println(summary)
    out.append(summary).append('\n')
    val p = java.nio.file.Paths.get("target/planaudit.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, out.toString)
    spark.listenerManager.unregister(listener)
    spark.stop()
  }

  /** `Exchange SinglePartition` occurrences whose direct child is NOT a
    * partial aggregate / local limit — returns "exchange→childOp" labels
    * for the artifact. Child extraction: the first following tree line,
    * stripped of tree art and the WholeStageCodegen `*(n) ` prefix. */
  private[tools] def singlePartitionViolations(plan: String): Seq[String] = {
    val lines = plan.split('\n')
    // Waived children — operators that bound what crosses the wire:
    //  - partial aggregates: ≤1 row per upstream partition (the classic
    //    final-agg merge);
    //  - local/ordered limits: ≤limit rows total (incl. the backbone's
    //    documented repartition(1) over TakeOrderedAndProject(5000) —
    //    Graph.scala "one compact file" write);
    //  - LocalTableScan: a driver-local literal frame (codebook writes'
    //    repartition(1) — bounded by construction).
    val waivedChildren = Seq("HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "LocalLimit", "CollectLimit",
      "TakeOrderedAndProject", "LocalTableScan", "AggregateInPandas")
    lines.indices.collect {
      // a `ReusedExchange [...], Exchange SinglePartition` line is a
      // REFERENCE to an exchange already checked at its definition site —
      // the next tree line is a sibling, not its child
      case i if lines(i).contains("Exchange SinglePartition") &&
          !lines(i).contains("ReusedExchange") =>
        val childOp = lines.drop(i + 1)
          .map(stripTreeArt)
          .find(_.nonEmpty)
          .getOrElse("<none>")
        (i, childOp)
    }.collect {
      case (_, op) if !waivedChildren.exists(op.startsWith) =>
        s"SinglePartition→$op"
    }.toSeq
  }

  /** Drop leading tree-drawing characters and the codegen `*(n) ` prefix,
    * keeping the operator name that starts the line. */
  private[tools] def stripTreeArt(line: String): String = {
    val noArt = line.dropWhile(c => " :+-|=".contains(c))
    val noStar = if (noArt.startsWith("*("))
      noArt.dropWhile(_ != ')').drop(1).dropWhile(_ == ' ')
    else noArt
    noStar.takeWhile(c => c.isLetterOrDigit || c == '_')
  }
}
