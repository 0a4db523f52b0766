package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamGate

/** Scratch probe for the stream-gate replay overhead (round-6 verdict
  * tasks 2 and 7): measures each gate's wall under the knob surface —
  * disk-backed vs tmpfs checkpoint, and for the stream-static enrich join
  * the cached vs re-read static side. Variants are interleaved (A B A B)
  * so a VM drift shows up as disagreement between reps rather than biasing
  * one variant. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warmup: one pass of each gate so JIT/parquet listing are charged here
    StreamGate.windowCounts(spark, sfDir).count()
    StreamGate.enrichJoin(spark, sfDir).count()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      for (ckpt <- Seq("tmpfs", "disk")) {
        if (ckpt == "tmpfs") sys.props -= "graft.stream.ckpt.root"
        else sys.props("graft.stream.ckpt.root") = "none"
        time(s"window_counts   ckpt=$ckpt") {
          StreamGate.windowCounts(spark, sfDir).count()
        }
        time(s"sessionize      ckpt=$ckpt") {
          StreamGate.sessionize(spark, sfDir).count()
        }
        time(s"enrich cached   ckpt=$ckpt") {
          StreamGate.enrichJoin(spark, sfDir, cacheStatic = true).count()
        }
        time(s"enrich uncached ckpt=$ckpt") {
          StreamGate.enrichJoin(spark, sfDir, cacheStatic = false).count()
        }
        time(s"upsert          ckpt=$ckpt") {
          StreamGate.upsertSnapshot(spark, sfDir).count()
        }
        time(s"stream_stream   ckpt=$ckpt") {
          StreamGate.streamStreamJoin(spark, sfDir).count()
        }
      }
    }
    sys.props -= "graft.stream.ckpt.root"
    spark.stop()
  }
}
