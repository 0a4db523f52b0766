package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: pageRank wall time vs localCheckpoint cadence. Per-round
  * checkpointing trades materialization cost for shorter lineage; with a
  * FIXED iteration count the lineage is bounded, so the cadence is a
  * measurable knob rather than a correctness requirement (unlike the
  * unbounded CC loop, which must truncate). */
object PrProbe {
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
    // interleave cadences so VM drift hits all variants equally
    for (_ <- 1 to 2; every <- Seq(1, 2, 0)) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.pageRank(spark, sfDir,
        checkpointEvery = every).count()
      println(f"checkpointEvery=$every: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
