package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: pageRank wall time vs localCheckpoint cadence, plus
  * (round 12, `ab` mode) a same-JVM A/B of the round-12 loop shape vs a
  * replica of the round-11 shape. Per-round checkpointing trades
  * materialization cost for shorter lineage; with a FIXED iteration count
  * the lineage is bounded, so the cadence is a measurable knob rather than
  * a correctness requirement (unlike the unbounded CC loop, which must
  * truncate).
  *
  * `ab` mode exists because cross-round wall comparisons are not a valid
  * instrument here: the round-11 close itself documented ±15% ambient
  * spread between COMPLETE runs, and this VM reboots between sessions
  * (cold page cache, different host neighbors). The only honest measure of
  * the loop-shape change is both shapes interleaved in ONE process: the
  * production `Graph.pageRankOf` (one join + one aggregate per round,
  * damping in the aggregate's projection) against `oldShape` below — a
  * line-for-line replica of the round-11 loop (contribution aggregate,
  * then `nodes LEFT JOIN contrib` re-emission with `coalesce(c, 0)`, plus
  * the cached `distinct` node frame that join needed). Both produce
  * bit-identical ranks (the dropped branch was dead on a symmetrized edge
  * list); the probe asserts result equality each rep. */
object PrProbe {
  private val Scale = 1000000000000L // mirrors Graph.Scale (fixed-point 10^12)

  /** Round-11 loop replica (see git d3b5c02:Graph.scala pageRankOf) —
    * measurement control only, never on a gate path. */
  private def oldShape(edgesIn: DataFrame, iterations: Int, topK: Int,
      checkpointEvery: Int): DataFrame = {
    val parted = edgesIn.repartition(col("src")).persist()
    val deg = parted.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val edges = parted.join(deg, "src").persist()
    val nodes = parted.select(col("src").as("id")).distinct().persist()
    var ranks = nodes.withColumn("r", lit(Scale))
    for (i <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(15L * Scale / 100L) +
            expr("(coalesce(c, 0L) div 100) * 85 + ((coalesce(c, 0L) % 100) * 85) div 100")).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    val out = ranks
      .select(col("id"),
        when(col("id") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        (col("id") / 2).cast("long").as("entity_key"),
        col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("id"))
      .limit(topK)
    graft.operators.Tables.materializeAndRelease(out, parted, edges, nodes)
  }

  /** Candidate: per-round BROADCAST of the node-sized rank frame (size-gated
    * in production if it wins) — the join loses its sort/stream stage; the
    * only per-round exchange is the contribution aggregate's. */
  private def bcastShape(edgesIn: DataFrame, iterations: Int,
      topK: Int): DataFrame = {
    val parted = edgesIn.repartition(col("src")).persist()
    val deg = parted.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val edges = parted.join(deg, "src").persist()
    var ranks = deg.select(col("src").as("id"), lit(Scale).as("r"))
    for (i <- 1 to iterations) {
      ranks = edges
        .join(broadcast(ranks.withColumnRenamed("id", "src")), "src")
        .select(col("dst").as("id"), expr("r div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
        .select(col("id"),
          (lit(15L * Scale / 100L) +
            expr("(c div 100) * 85 + ((c % 100) * 85) div 100")).as("r"))
      if (i < iterations) ranks = ranks.localCheckpoint(true)
    }
    val out = ranks
      .select(col("id"),
        when(col("id") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        (col("id") / 2).cast("long").as("entity_key"),
        col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("id"))
      .limit(topK)
    graft.operators.Tables.materializeAndRelease(out, parted, edges)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "cadence"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (mode == "ab") {
      val tbl = graft.operators.Graph.bipartiteTable(spark, sfDir)
      // variants: prod shape at cadence 1/0, the r11 replica, and the prod
      // shape with AQE off (AQE's partition coalescing can re-plan the
      // contribution aggregate to a different partition count than the
      // cached hash(src) edges, reintroducing a per-round exchange)
      val variants = Seq("new_bcast_noaqe", "new_bcast", "old_cp1", "new_cp1_noaqe")
      def run(v: String): (Double, Seq[String]) = {
        spark.catalog.clearCache()
        System.gc()
        val aqeOff = v.endsWith("noaqe")
        if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val edges = spark.read.parquet(tbl)
          val t0 = System.nanoTime()
          val df = v match {
            case "old_cp1"   => oldShape(edges, 5, 50, 1)
            case "new_cp0"   => graft.operators.Graph.pageRankOf(edges, 5, 50, 0)
            case s if s.startsWith("new_bcast") => bcastShape(edges, 5, 50)
            case _           => graft.operators.Graph.pageRankOf(edges, 5, 50, 1)
          }
          val rows = df.collect().map(_.mkString(",")).toSeq
          ((System.nanoTime() - t0) / 1e9, rows)
        } finally if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      // warmup each variant once, then interleaved timed reps
      val warmRows = variants.map(v => v -> run(v)._2).toMap
      variants.combinations(2).foreach { case Seq(a, b) =>
        require(warmRows(a) == warmRows(b), s"$a and $b disagree")
      }
      println("rank rows identical across all variants: OK")
      val times = scala.collection.mutable.Map(
        variants.map(_ -> Vector.empty[Double]): _*)
      for (i <- 1 to reps; v <- variants) {
        val (t, _) = run(v)
        times(v) :+= t
        println(f"$v rep $i: $t%.2f s")
      }
      def med(v: Vector[Double]) = v.sorted.apply(v.length / 2)
      println(f"== medians over $reps interleaved reps ==")
      variants.foreach(v => println(f"$v%-15s ${med(times(v))}%.2f s"))
      val mo = med(times("old_cp1"))
      variants.filterNot(_ == "old_cp1").foreach { v =>
        println(f"$v%-15s speedup vs old: ${(mo - med(times(v))) / mo * 100}%.1f%%")
      }
    } else {
      // interleave cadences so VM drift hits all variants equally
      for (_ <- 1 to 2; every <- Seq(1, 2, 0)) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = graft.operators.Graph.pageRank(spark, sfDir,
          checkpointEvery = every).count()
        println(f"checkpointEvery=$every: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
