package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamGate

/** Scratch probe (round-8 verdict task 2): split each slow replay gate's
  * wall into REPLAY MACHINERY (query planning + WAL'd micro-batches +
  * memory-sink collect, measured by draining a stateless projection of the
  * same source), OPERATOR COST (the identical aggregation run as a plain
  * batch query over the static table), and the residual, which is the
  * state-store path (store setup/commit/delta files + the stateful
  * operator's row path). Targets: `stream_cms` (3.14 s in BENCH_r07 — the
  * surface's slowest gate), `stream_dedup` (1.68× vs r6),
  * `stream_enrich_join` (1.33× vs r6), with `stream_window_counts` as the
  * long-stable control. Interleaved reps, medians — the StreamProbe
  * discipline. */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val ev = graft.operators.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"),
        col("value"))
    ev.count() // warm page cache for the batch twins

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0, "probe variant returned empty — not measuring real work")
      (System.nanoTime() - t0) / 1e9
    }

    // ---- the measured variants --------------------------------------------

    // replay machinery floor: stateless projection through the identical
    // drain (same source, same memory sink, no stateful operator)
    def machinery(): Long =
      StreamGate.runToMemory(spark,
        StreamGate.eventsStream(spark, sfDir)
          .select(col("event_id"), col("user_id"))).count()

    // batch twins: identical logical aggregation, no streaming at all
    def cmsBatch(): Long =
      ev.select(col("ts"), col("user_id"),
          explode(lit((0 until StreamGate.StreamCmsDepth).toArray)).as("r"))
        .withColumn("bucket", StreamGate.streamCmsBucket(col("r"), col("user_id")))
        .groupBy(window(col("ts"), "1 hour"), col("r"), col("bucket"))
        .agg(count(lit(1)).as("cell_n"))
        .count()

    // cms batch twin WITHOUT the depth-explode (half the shuffled rows):
    // isolates what the grid multiplication itself costs
    def cmsBatchNoExplode(): Long =
      ev.withColumn("bucket", StreamGate.streamCmsBucket(lit(0), col("user_id")))
        .groupBy(window(col("ts"), "1 hour"), col("bucket"))
        .agg(count(lit(1)).as("cell_n"))
        .count()

    def dedupBatch(): Long =
      ev.select(col("user_id"), col("event_type")).distinct().count()

    def enrichBatch(): Long = {
      val nation = graft.operators.Tables.nation(spark, sfDir)
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
      ev.select(col("ts"), expr("user_id % 25").as("k"))
        .join(nation, col("k") === col("n_nationkey"))
        .groupBy(window(col("ts"), "1 hour"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .count()
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "machinery_stateless_drain" -> (() => machinery()),
      "stream_cms_full" -> (() => StreamGate.cmsWindows(spark, sfDir).count()),
      "cms_batch_twin" -> (() => cmsBatch()),
      "cms_batch_no_explode" -> (() => cmsBatchNoExplode()),
      "stream_dedup_full" -> (() => StreamGate.dedupKeys(spark, sfDir).count()),
      "dedup_batch_twin" -> (() => dedupBatch()),
      "stream_enrich_full" -> (() => StreamGate.enrichJoin(spark, sfDir).count()),
      "enrich_batch_twin" -> (() => enrichBatch()),
      "stream_windows_full" -> (() => StreamGate.windowCounts(spark, sfDir).count()),
      "stream_qsketch_full" -> (() => StreamGate.qsketchWindows(spark, sfDir).count()),
      "stream_sessionize_full" -> (() => StreamGate.sessionize(spark, sfDir).count()),
      "stream_anomalies_full" -> (() => StreamGate.anomalies(spark, sfDir).count()),
      "stream_ssj_full" -> (() => StreamGate.streamStreamJoin(spark, sfDir).count()),
      "stream_upsert_full" -> (() => StreamGate.upsertSnapshot(spark, sfDir).count()),
    )

    // one warmup each, then interleaved timed reps (VM drift hits all
    // variants equally instead of whichever ran last)
    variants.foreach { case (_, f) => f() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- variants) {
      spark.catalog.clearCache()
      times(name) = times(name) :+ timed(f())
      System.gc()
    }
    println("== StreamCostProbe " + sfDir + " reps=" + reps + " ==")
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"$name%-28s median=${ts(ts.length / 2)}%6.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
