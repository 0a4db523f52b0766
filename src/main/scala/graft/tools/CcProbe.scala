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

    // Marginal cost of the fused convergence+max-degree probe (round-7
    // verdict task 5): every CC round must count the edge frame anyway;
    // the auto-salt signal rides that count as a degree groupBy + one
    //-row sum/max aggregate. The probe's true cost is therefore the
    // DELTA between the fused aggregate and a bare count() on the same
    // cached frame — measured here warm (3 reps each, min).
    def time3(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }.min
    val tCount = time3 { edges.count() }
    val tFused = time3 {
      edges.select(col("id1").as("u"))
        .union(edges.select(col("id2").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("d"))
        .agg(sum(col("d")), max(col("d"))).collect()
    }
    println(f"bare count: $tCount%.2f s, fused count+maxDegree: $tFused%.2f s, probe delta: ${tFused - tCount}%.2f s")

    val roundWalls = scala.collection.mutable.ArrayBuffer[Double]()
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.operators.Dedup.starContraction(edges, salt,
      onRound = (_, s) => roundWalls += s)
    val n = labels.localCheckpoint(true).count()
    val meanRound = if (roundWalls.isEmpty) 0.0 else roundWalls.sum / roundWalls.size
    println(f"total: ${(System.nanoTime() - t0) / 1e9}%.1f s, $rounds rounds, $n labels, mean round ${meanRound}%.2f s, probe delta/round = ${(tFused - tCount) / math.max(meanRound, 1e-9) * 100}%.1f%%")
    spark.stop()
  }
}
