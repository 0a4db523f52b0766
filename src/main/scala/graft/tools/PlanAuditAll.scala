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

  /** The checked-in waiver list with rationale — each UDF names its
    * def-site scaladoc as the waiver record. */
  private val DefaultUdfWaivers: Map[String, String] = Map(
    "dedup_simhash" -> "Dedup.simhashUdf: 64 parallel bit-counters over token hashes; def-site doc",
    "dedup_ngram_jaccard" -> "Dedup.shingleUdf: per-doc shingle set builder; def-site doc",
    "dedup_jaccard_capped" -> "Dedup.shingleUdf (capped twin)",
    "dedup_containment" -> "Dedup.shingleUdf feeds the containment join",
    "dedup_substring" -> "Dedup.gramPosHashUdf: positional gram hashes",
    "sample_ngram_lm" -> "Sampling.ngramHash8Udf: rolling 8-gram hash",
    "sample_chunk" -> "Sampling.chunkUdfFor: stride chunker",
    "text_repetition" -> "TextAnalysis.repetitionStatsUdf",
    "text_fingerprint" -> "TextAnalysis.winnowUdf: winnowing window min",
    "text_novelty" -> "TextAnalysis.winnowUdf (novelty twin)",
    "text_vocab_growth" -> "TextAnalysis.vocabGram3Udf",
    "text_quality_classifier" -> "TextAnalysis.classifierScoreUdf",
    "q_hist_fixed" -> "Bucketing.mkUb: binary-search bucketer over quantile grid",
    "q_bloom_join" -> "broadcast bloom mightContain probe (stat.bloomFilter)"
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
      val spViol = plans.flatMap(singlePartitionViolations)
      val cartesian = plans.count(_.contains("CartesianProduct"))
      val udfHits = plans.count(_.contains("ScalaUDF"))
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
      val row = s"""{"q":"$name","plans":${plans.size},"single_partition":${js(spViol.distinct)},"cartesian":$cartesian,"scala_udf":$udfHits,"udf_waived":$waived,"ok":$ok${err.map(e => s""","error":${js(Seq(e)).drop(1).dropRight(1)}""").getOrElse("")}}"""
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
    val waivedChildren = Seq("HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "LocalLimit", "CollectLimit", "AggregateInPandas")
    lines.indices.collect {
      case i if lines(i).contains("Exchange SinglePartition") =>
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
