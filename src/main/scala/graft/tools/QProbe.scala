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
    // comma-separated names → interleaved reps (VM drift hits all queries
    // equally), per-query medians at the end
    val names = name.split(",").map(_.trim).filter(_.nonEmpty)
    val fns = names.map(n => n -> graft.SparkEntry.queries(n))
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to reps; (n, fn) <- fns) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$n rep $i: $t%.2f s ($rows rows)")
      if (i > 1) times(n) = times(n) :+ t // rep 1 is the cold run
    }
    if (names.length > 1 && reps > 1) {
      println("== medians (warm reps) ==")
      var total = 0.0
      names.foreach { n =>
        val ts = times(n).sorted
        val med = ts(ts.length / 2)
        total += med
        println(f"$n%-28s $med%6.2f s")
      }
      println(f"TOTAL $total%.2f s")
    }
    spark.stop()
  }
}
