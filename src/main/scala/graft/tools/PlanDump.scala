package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool: write `.explain("formatted")` for named SparkEntry gates
  * to files — the before/after plan evidence the optimization rounds
  * commit under `plans/r{N}/`. Usage:
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>…]`
  * writes `<outDir>/<name>_<suffix>.txt` per gate. Same session conf as
  * Bench so the plans match what the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: PlanDump <sfDir> <outDir> <suffix> <names>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, namesArg) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    namesArg.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
      println(s"wrote $out (${plan.length} B)")
    }
    spark.stop()
  }
}
