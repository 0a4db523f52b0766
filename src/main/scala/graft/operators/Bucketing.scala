package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-layout utilities: the shuffle-elimination story for repeated
  * keyed work at 100 TB.
  *
  * Writing a fact table bucketed (and sorted) by its dominant key makes
  * every later `groupBy`/window/join on that key exchange-free: Catalyst
  * recognizes the bucket spec as a satisfying `HashPartitioning`, so the
  * per-key work pipelines straight out of the scan. For the `events` stream
  * keyed by `user_id` (sessionization, per-user features, user-level joins)
  * that removes the dominant shuffle from every downstream pipeline run —
  * pay one shuffle at landing time, amortized over every consumer.
  */
object Bucketing {

  /** Land `events` bucketed+sorted by user_id as a saved table. */
  def writeEventsBucketed(spark: SparkSession, sfDir: String,
      tableName: String, buckets: Int = 32): Unit = {
    Tables.events(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(buckets, "user_id")
      .sortBy("user_id", "event_id")
      .option("compression", "snappy")
      .saveAsTable(tableName)
  }

  /** Land `embeddings` partitioned by k-means cluster id — the IVF
    * inverted-list layout at rest. An ANN query that probes nProbe clusters
    * then reads only those directories (partition pruning), which is what
    * keeps per-query IO sublinear in corpus size at 100 TB: the probed
    * fraction of the table is the only part scanned. */
  def writeEmbeddingsByCluster(spark: SparkSession, sfDir: String,
      path: String, k: Int = 8, iters: Int = 3): Unit = {
    val assign = Clustering.kmeans(spark, sfDir, k, iters)
      .select(col("vec_id"), col("cluster"))
    Tables.embeddings(spark, sfDir)
      .join(assign, "vec_id")
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("cluster")
      .parquet(path)
  }

  /** Scan only the probed clusters' inverted lists — the filter on the
    * partition column prunes at file-listing time (PartitionFilters, not a
    * data filter). */
  def probeClusters(spark: SparkSession, path: String,
      clusters: Seq[Long]): DataFrame =
    spark.read.parquet(path).filter(col("cluster").isin(clusters: _*))

  /** Per-user session counts over the bucketed table — same logic as
    * QuerySurface.sessionize but reading the bucketed layout; the window's
    * required HashPartitioning(user_id) is satisfied by the bucket spec, so
    * the plan has no Exchange before the windows. */
  def sessionCountsBucketed(spark: SparkSession, tableName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    spark.table(tableName)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs ||
          lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }
}
