package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamGate

/** Scratch probe: stream-gate wall vs shuffle-partition count (= state
  * stores per stateful operator). Interleaved reps. */
object StreamPartProbe {
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
    StreamGate.windowCounts(spark, sfDir).count() // warm

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (rep <- 1 to 2; p <- Seq("32", "8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      time(s"rep$rep window_counts p=$p") { StreamGate.windowCounts(spark, sfDir).count() }
      time(s"rep$rep sessionize    p=$p") { StreamGate.sessionize(spark, sfDir).count() }
      time(s"rep$rep dedup_keys    p=$p") { StreamGate.dedupKeys(spark, sfDir).count() }
      time(s"rep$rep enrich        p=$p") { StreamGate.enrichJoin(spark, sfDir).count() }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
