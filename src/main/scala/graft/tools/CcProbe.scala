package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the star-contraction hot-center regime (VERDICT r4
  * task 2). Generates long-chain graphs and prints per-round wall times.
  * args: nChains chainLen [cores]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nChains = args(0).toLong
    val chainLen = args(1).toLong
    val cores = if (args.length > 2) args(2) else "32"
    val salt = if (args.length > 3) args(3).toInt else 0
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chainN = nChains * chainLen
    val chain = spark.range(0L, chainN - 1)
      .filter((col("id") + 1L) % chainLen =!= 0L)
      .select(col("id").as("id1"), (col("id") + 1L).as("id2"))
    val edges = chain.localCheckpoint(true)
    println(s"edges: ${edges.count()}")
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.operators.Dedup.starContraction(edges, salt)
    val n = labels.localCheckpoint(true).count()
    println(f"total: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rounds rounds, $n labels")
    spark.stop()
  }
}
