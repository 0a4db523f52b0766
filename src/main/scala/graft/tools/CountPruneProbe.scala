package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does `.count()` prune a projected deterministic UDF column? If yes, the
  * bench/sweep walls of pure-map gates price the scan, not the map — a
  * measurement caveat the round-12 UDF audit must account for. Prints the
  * optimized plan of `select(udf(text)).count()` and the timed walls of
  * count() vs a checksum aggregate over the same projection. */
object CountPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val slow = udf { (s: String) =>
      var h = 0L; var r = 0
      while (r < 200) { var i = 0; while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }; r += 1 }
      h
    }
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), slow(col("text")).as("u"))
      .orderBy(col("doc_id"))
    println("=== optimized plan under count() ===")
    println(df.groupBy().count().queryExecution.optimizedPlan.toString.take(2000))
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("count()")(df.count())
    time("checksum agg")(df.agg(sum(pmod(col("u"), lit(1000000007L)))).head())
    time("count() again")(df.count())
    spark.stop()
  }
}
