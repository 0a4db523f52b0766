package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: stream_stream_join wall time vs shuffle-partition count
  * (state stores per side = partitions; the replay is one micro-batch). */
object SsjProbe {
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
    for (p <- Seq("32", "8", "32", "8")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamGate.streamStreamJoin(spark, sfDir).count()
      println(f"partitions=$p: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
