package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe: where does one replay gate's wall go? Phases: schema
  * read, query start (planning + WAL init), per-micro-batch execution
  * (from the progress log), post-drain. Also measures 4 gates started
  * CONCURRENTLY vs the same 4 sequentially — the overlap potential of the
  * driver-side machinery. */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.streaming.StreamGate.windowCounts(spark, sfDir).count() // warm

    def phased(label: String): Unit = {
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"  $name: ${(now - t) / 1e9}%.2f s")
        t = now
      }
      val path = s"$sfDir/events.parquet"
      val schema = spark.read.parquet(path).schema
      lap("schema")
      val raw0 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", Int.MaxValue)
        .parquet(s"$sfDir/event[s].parquet")
      val raw = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw0.withColumn("ts", col("ts").cast("timestamp"))
      }
      val agg = raw.select(col("ts").as("Timestamp"), col("event_type"))
        .withWatermark("Timestamp", "2 minutes")
        .groupBy(window(col("Timestamp"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory").queryName(label)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      lap("start")
      q.awaitTermination()
      lap("await")
      q.recentProgress.foreach(p =>
        println(s"  batch ${p.batchId}: trigger=${p.durationMs}"))
      val n = spark.table(label).count()
      spark.catalog.dropTempView(label)
      lap(s"post ($n rows)")
    }
    println("--- phased run 1 ---"); phased("ph1")
    println("--- phased run 2 ---"); phased("ph2")

    // concurrency: 4 windowCounts-shaped gates at once vs sequential
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t0 = System.nanoTime()
    (1 to 4).foreach(_ => graft.streaming.StreamGate.windowCounts(spark, sfDir).count())
    println(f"sequential x4: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val fs = (1 to 4).map(_ => Future {
      graft.streaming.StreamGate.windowCounts(spark, sfDir).count()
    })
    Await.result(Future.sequence(fs), 10.minutes)
    println(f"concurrent x4: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
