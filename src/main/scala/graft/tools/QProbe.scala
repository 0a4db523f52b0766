package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: warm per-query wall time for any named SparkEntry query
  * outside the full Bench sweep — `runMain graft.tools.QProbe <sfDir>
  * <name> [reps]`. Same session conf as Bench; first rep is the cold one,
  * read the later reps. */
object QProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: QProbe <sfDir> <queryName> [reps]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
