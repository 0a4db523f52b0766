package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 follow-up to the rank-loop finding: measure ANY gate with
  * adaptive query execution on vs off, interleaved in one JVM (the only
  * valid instrument on this VM — see tools.PrProbe's scaladoc). The rank
  * loops won −10 to −19% end-to-end from disabling AQE inside their
  * bounded fixed-point iterations; this probe asks the same question of
  * the other iterative gates (k-core peel, CC-based ER clustering, label
  * propagation, BFS/SSSP frontier loops) WITHOUT touching their code: the
  * session flag flips around the whole gate. A win here justifies scoping
  * `Graph.withAqeOff` around that operator's loop; a wash means AQE's
  * per-round replanning is already amortized for that shape.
  *
  * Usage: AqeProbe <sfDir> <gate1,gate2,...> [reps]
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AqeProbe <sfDir> <gates> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
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

    def run(name: String, aqe: Boolean): Double = {
      spark.catalog.clearCache()
      System.gc()
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // warmup both settings
    names.foreach { n => run(n, aqe = true); run(n, aqe = false) }
    val times = scala.collection.mutable.Map[(String, Boolean), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to reps; n <- names; aqe <- Seq(true, false)) {
      val t = run(n, aqe)
      times((n, aqe)) :+= t
      println(f"$n aqe=$aqe rep $i: $t%.2f s")
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.length / 2)
    println("== medians ==")
    names.foreach { n =>
      val on = med(times((n, true))); val off = med(times((n, false)))
      println(f"$n%-28s aqe_on $on%.2f s  aqe_off $off%.2f s  delta ${(on - off) / on * 100}%+.1f%%")
    }
    spark.stop()
  }
}
