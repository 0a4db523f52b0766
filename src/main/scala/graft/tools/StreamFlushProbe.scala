package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamGate

/** Round-9 measurement for VERDICT r8 task 7: the replay-machinery floor
  * (~0.74 s × 11 gates) includes a second WAL'd micro-batch — the no-data
  * watermark flush AvailableNow schedules so append-mode windows emit.
  * For the BY-ALGEBRA-parity gates (merge-commutative sums:
  * `stream_red`, `stream_hist`, `stream_cms`) the flush is not needed for
  * agreement with batch: an UPDATE-mode drain with no watermark emits the
  * identical final state in the single data micro-batch, and the
  * append-mode "windows the watermark closed" subset rule is a pure
  * function of the data (`floor(max ts ms) − delay`), so it can be applied
  * as a deterministic batch post-filter.
  *
  * This probe measures both forms per gate (interleaved reps), ASSERTS the
  * outputs are row-identical, and prints per-gate medians — the evidence
  * for either gating the elision behind a config knob or closing the item.
  */
object StreamFlushProbe {

  /** Update-mode twin of [[StreamGate.redWindows]]: no watermark on the
    * stream, the same window filter applied post-drain from a batch
    * max(ts) read. */
  private def redWindowsElided(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamGate.eventsStream(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
    val agg = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 250.0, 1L).otherwise(0L)).as("n_err"),
        sum(col("value").cast("decimal(28,6)")).as("sum_v"))
    val wmMs = watermarkMs(spark, sfDir, StreamGate.WindowDelayMs)
    StreamGate.runToMemory(spark, agg, outputMode = "update")
      .filter(expr(s"unix_micros(window.end) div 1000") <= wmMs)
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("n_err"),
        graft.operators.Tables.portableRound6(
          col("n_err").cast("double") / col("n").cast("double")).as("err_rate"),
        graft.operators.Tables.portableRound6(
          col("sum_v").cast("double") / col("n").cast("double")).as("avg_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** Update-mode twin of [[StreamGate.histWindows]]. */
  private def histWindowsElided(spark: SparkSession, sfDir: String): DataFrame = {
    val bs = graft.operators.OtelQueries.RebucketBounds
    val bucketExpr = bs.zipWithIndex.foldRight(lit(bs.size.toLong)) {
      case ((b, i), acc) => when(col("value") < b.toDouble, i.toLong).otherwise(acc)
    }
    val ev = StreamGate.eventsStream(spark, sfDir)
      .select(col("ts"), bucketExpr.as("bucket"))
    val agg = ev.groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val wmMs = watermarkMs(spark, sfDir, StreamGate.WindowDelayMs)
    StreamGate.runToMemory(spark, agg, outputMode = "update")
      .filter(expr(s"unix_micros(window.end) div 1000") <= wmMs)
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("bucket"), col("n"))
      .orderBy(col("window_start_us"), col("bucket"))
  }

  /** The final-watermark rule AvailableNow applies: floor(max event ms) −
    * delay, from a batch scan (column stats make this a footer read). */
  private def watermarkMs(spark: SparkSession, sfDir: String, delayMs: Long): Long =
    graft.operators.Tables.events(spark, sfDir)
      .agg(max(expr("unix_micros(ts) div 1000"))).head.getLong(0) - delayMs

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
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/events.parquet").count()

    val gates: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("stream_red",
        () => StreamGate.redWindows(spark, sfDir),
        () => redWindowsElided(spark, sfDir)),
      ("stream_hist",
        () => StreamGate.histWindows(spark, sfDir),
        () => histWindowsElided(spark, sfDir)))

    def norm(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted

    // parity first — an elision that changes one row is not an optimization
    gates.foreach { case (name, append, elided) =>
      val (a, b) = (norm(append()), norm(elided()))
      require(a == b, s"$name: elided form diverges\nappend=$a\nelided=$b")
      println(s"$name: parity OK (${a.size} rows)")
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    val results = gates.map { case (name, append, elided) =>
      val pairs = (1 to reps).map { _ => (time(append), time(elided)) }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      (name, med(pairs.map(_._1)), med(pairs.map(_._2)))
    }
    results.foreach { case (name, a, e) =>
      println(f"$name: append+flush med=$a%.3f s, update-elided med=$e%.3f s, saving=${a - e}%.3f s (${100 * (a - e) / a}%.1f%%)")
    }
    spark.stop()
  }
}
