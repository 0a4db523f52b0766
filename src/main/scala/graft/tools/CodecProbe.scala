package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (r16, verdict task 9): measure named gates under an
  * explicit `spark.io.compression.codec` (shuffle/spill/broadcast codec —
  * a SparkContext-static conf, so each arm is its own JVM). Invoke once
  * with `lz4` and once with `zstd` on the shuffle-heaviest gates at sf1;
  * adopt zstd only on a ≥10% calm-session win (guide §2.3: "there is no
  * universal answer — measure").
  * Usage: `runMain graft.tools.CodecProbe <sfDir> <codec> <names> [reps]`
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: CodecProbe <sfDir> <codec> <names> [reps]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val codec = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.io.compression.codec", codec)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fns = names.map(n => n -> graft.SparkEntry.queries(n))
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to reps; (n, fn) <- fns) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[$codec] $n rep $i: $t%.2f s ($rows rows)")
      times(n) = times(n) :+ t
    }
    println(s"== medians (codec=$codec, warm reps) ==")
    var total = 0.0
    names.foreach { n =>
      val xs = times(n).sorted
      val med = xs(xs.length / 2)
      total += med
      println(f"$n%-30s $med%6.2f s")
    }
    println(f"TOTAL $total%.2f s")
    spark.stop()
  }
}
