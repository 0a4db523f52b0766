package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamGate

/** Scratch probe (round-11 verdict task 1): decompose the ~0.7-1.0 s fixed
  * cost every replay gate pays, independent of data volume. Variants:
  *
  *  - `trivial_stateless`: 3-row parquet → memory sink, one micro-batch.
  *    The irreducible query start/stop floor (StreamExecution thread, WAL
  *    offset+commit files, planning, memory-sink collect).
  *  - `trivial_stateful`: same 3 rows through a watermarked window count
  *    (8 state partitions). Adds state-store setup + the no-data flush
  *    batch → the stateful floor.
  *  - `trivial_stateful_elide`: the update-mode elision form of the same.
  *  - `real_stateless_drain`: sf events through a projection (machinery at
  *    real volume — StreamCostProbe's `machinery` twin).
  *  - `lc_vs_local`: post-drain cost of localCheckpoint(true) vs copying
  *    the memory-sink rows into a driver LocalRelation.
  *
  * Interleaved reps, medians (StreamProbe discipline). */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // tiny fixture: 3 rows, one parquet file
    val tinyDir = java.nio.file.Files.createTempDirectory("graft-floor").toString
    val tiny = s"$tinyDir/tiny"
    spark.range(3).select(
      timestamp_micros(col("id") * 60000000L).as("ts"),
      col("id").as("k")).coalesce(1).write.mode("overwrite").parquet(tiny)
    val tinySchema = spark.read.parquet(tiny).schema

    def tinyStream(): DataFrame =
      spark.readStream.schema(tinySchema)
        .option("maxFilesPerTrigger", Int.MaxValue).parquet(tiny)

    def timedS(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n >= 0); (System.nanoTime() - t0) / 1e9
    }

    def trivialStateless(): Long =
      StreamGate.runToMemory(spark, tinyStream().select(col("k"))).count()

    def trivialStateful(): Long =
      StreamGate.runToMemory(spark,
        tinyStream().withWatermark("ts", "2 minutes")
          .groupBy(window(col("ts"), "1 minute")).agg(count(lit(1)).as("n"))).count()

    def trivialStatefulElide(): Long =
      StreamGate.runToMemory(spark,
        tinyStream().groupBy(window(col("ts"), "1 minute"))
          .agg(count(lit(1)).as("n")), outputMode = "update").count()

    def realStateless(): Long =
      StreamGate.runToMemory(spark,
        StreamGate.eventsStream(spark, sfDir)
          .select(col("event_id"), col("user_id"))).count()

    // post-drain handling: drain once outside the timer, then time the two
    // detach strategies on the drained memory table
    def postDrain(): (Double, Double) = {
      val name = s"graft_floor_${System.nanoTime()}"
      val q = StreamGate.eventsStream(spark, sfDir)
        .select(col("event_id"), col("user_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val t0 = System.nanoTime()
      val lc = spark.table(name).localCheckpoint(true)
      val nLc = lc.count()
      val t1 = System.nanoTime()
      // eager-analysis pin: Dataset plans resolve at creation, so the
      // reference survives the view drop without any materialization job
      val ref = spark.table(name)
      spark.catalog.dropTempView(name)
      val nRef = ref.count()
      val t2 = System.nanoTime()
      require(nLc == nRef)
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    def trivialStatefulP(p: Int): Long =
      StreamGate.runToMemory(spark,
        tinyStream().withWatermark("ts", "2 minutes")
          .groupBy(window(col("ts"), "1 minute")).agg(count(lit(1)).as("n")),
        stateParts = Some(p)).count()

    val variants: Seq[(String, () => Double)] = Seq(
      "trivial_stateless" -> (() => timedS(trivialStateless())),
      "trivial_stateful" -> (() => timedS(trivialStateful())),
      "trivial_stateful_elide" -> (() => timedS(trivialStatefulElide())),
      "trivial_stateful_p1" -> (() => timedS(trivialStatefulP(1))),
      "trivial_stateful_p2" -> (() => timedS(trivialStatefulP(2))),
      "trivial_stateful_p4" -> (() => timedS(trivialStatefulP(4))),
      "real_stateless_drain" -> (() => timedS(realStateless())),
      "real_windows_p8" -> (() => timedS(
        StreamGate.windowCounts(spark, sfDir, stateParts = Some(8)).count())),
      "real_windows_p2" -> (() => timedS(
        StreamGate.windowCounts(spark, sfDir, stateParts = Some(2)).count())),
      "real_windows_p1" -> (() => timedS(
        StreamGate.windowCounts(spark, sfDir, stateParts = Some(1)).count())),
    )
    variants.foreach { case (_, f) => f() } // warmup
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val lcT = scala.collection.mutable.ArrayBuffer[Double]()
    val locT = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      for ((name, f) <- variants) times(name) = times(name) :+ f()
      val (a, b) = postDrain(); lcT += a; locT += b
    }
    println(s"== StreamFloorProbe $sfDir reps=$reps ==")
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"$name%-24s median=${ts(ts.length / 2)}%6.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val (l1, l2) = (lcT.sorted.apply(lcT.length / 2), locT.sorted.apply(locT.length / 2))
    println(f"post_localCheckpoint     median=$l1%6.3f s  all=${lcT.map(t => f"$t%.3f").mkString(",")}")
    println(f"post_tableref            median=$l2%6.3f s  all=${locT.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
