package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal ingest-throughput probe: the Bench ingest measurement alone
  * (N passes, median/best), without the full query sweep IngestPostProbe
  * interposes — for fast before/after reads when only the flatten path
  * changed. Usage: IngestOnlyProbe [reps] */
object IngestOnlyProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val r = graft.Bench.ingestRowsPerSec(spark)
      val passes = r.passSeconds.map(t => f"$t%.3f").mkString("[", ",", "]")
      println(s"""{"rep":$i,"pass_s":$passes,"median":${r.medianRowsPerSec},"best":${r.bestRowsPerSec}}""")
    }
    spark.stop()
  }
}
