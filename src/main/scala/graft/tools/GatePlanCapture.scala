package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool (r16): run ONE SparkEntry gate with a
  * QueryExecutionListener and dump EVERY executed plan the run produces
  * (loop-round pins, foreachBatch writes, checkpoint materializations) to
  * numbered files — the evidence a `PlanDump` of the gate's returned frame
  * cannot show when the gate materializes its result (ExistingRDD root).
  * Usage: `runMain graft.tools.GatePlanCapture <sfDir> <outDir> <name>`
  * writes `<outDir>/<name>_job<i>_<funcName>.txt` per captured execution.
  * Same session conf as Bench. */
object GatePlanCapture {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: GatePlanCapture <sfDir> <outDir> <name>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, name) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val captured =
      new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        try captured.add((funcName, qe.executedPlan.toString))
        catch { case _: Throwable => () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    // the listener bus is asynchronous — poll until stable
    var last = -1
    val deadline = System.currentTimeMillis() + 10000
    while (captured.size != last && System.currentTimeMillis() < deadline) {
      last = captured.size
      Thread.sleep(300)
    }
    import scala.jdk.CollectionConverters._
    captured.asScala.zipWithIndex.foreach { case ((fn, plan), i) =>
      val out = java.nio.file.Paths.get(outDir,
        f"${name}_job$i%03d_$fn.txt")
      java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
    }
    println(s"captured ${captured.size} executed plans for $name in $outDir")
    spark.stop()
  }
}
