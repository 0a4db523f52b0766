package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r16, verdict task 5): the capped-Jaccard family persists
  * its `kept` (doc_id, h) frame and self-joins it by `h`. Confirm the
  * doc-frequency cap is the binding skew bound AFTER the persist by
  * measuring, at the given sf, the REAL shuffle distribution the self-join
  * sees: rows per shuffle partition under `pmod(hash(h), parts)` (Spark's
  * own Murmur3 HashPartitioning rule), the max per-key document count
  * (must be ≤ maxDocFreq), and the max per-key pair fan-out (≤ C(cap, 2)).
  * Usage: `runMain graft.tools.KeptSkewProbe <sfDir> [parts] [maxDocFreq]`
  */
object KeptSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1).toInt else 32
    val cap = if (args.length > 2) args(2).toLong else 20L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // kept, reconstructed exactly as ngramJaccardCapped builds it
    // (explode → df > cap blacklist → broadcast anti-join)
    val ex = graft.operators.Dedup.docShingleHashes(spark, sfDir)
      .select(col("doc_id"), explode(col("shh")).as("h"))
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select(col("h"))
    val kept = ex.join(broadcast(hot), Seq("h"), "left_anti").persist()
    val total = kept.count()
    val perKey = kept.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val mx = perKey.agg(max(col("df"))).head.getLong(0)
    val perPart = kept.groupBy(pmod(hash(col("h")), lit(parts)).as("p"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), min(col("n")).as("mn"),
        avg(col("n")).as("avg"))
      .head
    val pairs = perKey.select(
        (col("df") * (col("df") - 1) / 2).as("pairs"))
      .agg(sum(col("pairs")).as("total"), max(col("pairs")).as("mx")).head
    println(s"kept rows=$total  maxDocFreq(observed)=$mx (cap=$cap)")
    println(s"shuffle rows/partition over $parts parts: " +
      s"max=${perPart.getLong(0)} min=${perPart.getLong(1)} " +
      f"avg=${perPart.getDouble(2)}%.0f  (max/avg=" +
      f"${perPart.getLong(0) / perPart.getDouble(2)}%.2f)")
    println(s"self-join pair fan-out: total=${pairs.get(0)} " +
      s"max-per-key=${pairs.get(1)} (bound=${cap * (cap - 1) / 2})")
    spark.stop()
  }
}
