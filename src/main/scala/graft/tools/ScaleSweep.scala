package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 scaling probe: runs every `SparkEntry.queries` entry once at two
  * sf directories in one JVM and prints per-query walls + the ratio — the
  * cheapest way to catch hidden super-linearity (anything growing much
  * faster than the data is a scale bug, VM noise notwithstanding; single
  * runs carry this VM's ±50% band, so only large exponents are signal).
  * A per-query timeout cancels the Spark job group and records -1, so one
  * quadratic query cannot wedge the sweep.
  *
  * Usage: ScaleSweep <sfDirA> <sfDirB> [timeoutSecs] [onlyCsv]
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSweep <sfDirA> <sfDirB> [timeoutSecs] [onlyCsv]")
    val (dirA, dirB) = (args(0), args(1))
    val timeoutS = if (args.length >= 3) args(2).toInt else 300
    val only: Option[Set[String]] =
      if (args.length >= 4) Some(args(3).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timedRun(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val group = s"scale-$name-$dir"
      @volatile var elapsed = -1.0
      val t = new Thread(() => {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(name)(spark, dir).count()
          elapsed = (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[$name @ $dir] ${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
      })
      t.setDaemon(true)
      t.start()
      t.join(timeoutS * 1000L)
      if (t.isAlive) {
        spark.sparkContext.cancelJobGroup(group)
        t.join(30000L)
        System.err.println(s"[$name @ $dir] TIMED OUT after $timeoutS s — job group cancelled")
      }
      elapsed
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val a = timedRun(name, dirA)
      val b = timedRun(name, dirB)
      val ratio = if (a > 0 && b > 0) f"${b / a}%.1f" else "NA"
      println(f"""{"q":"$name","a_s":$a%.2f,"b_s":$b%.2f,"ratio":$ratio}""")
    }
    spark.stop()
  }
}
