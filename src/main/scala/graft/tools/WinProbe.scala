package graft.tools
import org.apache.spark.sql.SparkSession
/** Audit tool: list gates whose executed plan contains BOTH window
  * functions and an `Exchange SinglePartition` — candidates for an
  * empty-key window funnel, for manual eyeballing (a SinglePartition
  * exchange can also be a legitimate 1-row final aggregate, so this
  * over-reports by design; round-9 audit: q_skyline = the deliberate
  * log-sized phase-2 skyline merge, sample_balanced / text_zipf = 1-row
  * broadcast aggregates, zero true funnels). */
object WinProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        // over-reporting signal, by design: ANY window function in a plan
        // that also contains a SinglePartition exchange (which can be a
        // legitimate 1-row final aggregate) — the audit is a short list
        // for manual eyeballing, so false positives beat false negatives
        val specs = "windowspecdefinition\\(".r.findAllIn(plan).toSeq.length
        if (specs > 0 && plan.contains("Exchange SinglePartition"))
          println(s"SUSPECT $name specs=$specs")
      } catch { case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
