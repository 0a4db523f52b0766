package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hive-partitioned Snappy-Parquet sink.
  *
  * Path layout replicates the reference's
  * `{prefix}{signal}[/{metric_type}]/{service}/year=Y/month=MM/day=DD/hour=HH/...`
  * (/root/reference/src/writer/write.rs:93-130) via `partitionBy` on derived
  * columns. The reference's plain `{service}` dir becomes a `service=` k=v
  * partition dir — same pruning semantics, Spark-native layout (documented
  * deviation).
  *
  * Scale notes: dynamic partition insert with one shuffle-free write per
  * input split; callers can `repartition($"service", ...)` first to get one
  * file per (service, hour) instead of one per (task, service, hour).
  * `maxRecordsPerFile` mirrors the reference's 200k-row flush threshold
  * (/root/reference/src/config/mod.rs:53-62).
  */
object OtelWrite {

  /** `/ \ space : * ? " < > |` → `_`; empty → unknown-service
    * (/root/reference/src/writer/write.rs:132-148). */
  def sanitizeService(c: Column): Column = {
    val cleaned = regexp_replace(c, "[/\\\\ :*?\"<>|]", "_")
    when(c.isNull || c === "", lit("unknown-service")).otherwise(cleaned)
  }

  /** Add service/year/month/day/hour partition columns from a timestamp. */
  def withPartitionColumns(df: DataFrame, serviceCol: String = "ServiceName",
      tsCol: String = "Timestamp"): DataFrame =
    df.withColumn("service", sanitizeService(col(serviceCol)))
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", format_string("%02d", month(col(tsCol))))
      .withColumn("day", format_string("%02d", dayofmonth(col(tsCol))))
      .withColumn("hour", format_string("%02d", hour(col(tsCol))))

  /** Write one flat signal table to `{root}/{tableDir}` partitioned by
    * service/year/month/day/hour; snappy parquet, capped file sizes.
    *
    * `rebalance` (default ON, round 12): cluster rows on the partition
    * tuple with a REBALANCE shuffle before the dynamic-partition write.
    * Without it every task writes one file per partition dir it sees —
    * tasks × dirs small files (the measured 2528-request ingest pass wrote
    * ~190 ~1k-row files and the write stage was ~63% of the ingest wall;
    * IngestParseProbe round-12 rows). With it, file count follows the
    * partition-dir count — the reference's own one-file-per-service-flush
    * layout (/root/reference/src/writer/write.rs:93-130) — and the ingest
    * headline gained ~20%. REBALANCE rather than a plain repartition
    * because AQE both merges small shuffle partitions and SPLITS skewed
    * ones, so a hot service cannot bottleneck one writer at scale (plain
    * repartition pins each (service, hour) to exactly one task — that
    * stays the [[graft.io.Compaction]] shape via `coalescePartitions`).
    * Where AQE is off the hint degrades to a plain clustering shuffle —
    * still the small-file fix, minus the skew split. Opt out
    * (`rebalance = false`) for pipelines that pre-arrange their input and
    * cannot afford the extra pass over the batch. */
  def write(df: DataFrame, root: String, tableDir: String,
      maxRecordsPerFile: Long = 200000L,
      coalescePartitions: Boolean = false,
      /** parquet row-group bytes — the reference's ~32k-row tuning knob
        * (scripts/perf_audit.py:229-239); Spark default 128 MiB. */
      rowGroupBytes: Option[Long] = None,
      rebalance: Boolean = true): Unit = {
    val partitioned = withPartitionColumns(df)
    val arranged =
      if (coalescePartitions)
        // one task per (service, hour) → one file per partition dir; use for
        // compaction jobs, not for wide ingest
        partitioned.repartition(col("service"), col("year"), col("month"),
          col("day"), col("hour"))
      else if (rebalance)
        partitioned.hint("rebalance",
          "service", "year", "month", "day", "hour")
      else partitioned
    // dynamic-partition writes default to a per-task sort on the partition
    // tuple; with a bounded number of (service, hour) dirs per task,
    // concurrent writers skip that sort — measured 2× on the write stage.
    // Spark falls back to sort-based automatically past the limit.
    val conf = df.sparkSession.conf
    val key = "spark.sql.maxConcurrentOutputFileWriters"
    val prev = conf.get(key, "0")
    if (prev == "0") conf.set(key, "64")
    try {
      val writer = arranged.write
        .mode("append")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", maxRecordsPerFile)
      rowGroupBytes.foreach(b => writer.option("parquet.block.size", b))
      writer
        .partitionBy("service", "year", "month", "day", "hour")
        .parquet(s"$root/$tableDir")
    } finally if (prev == "0") conf.set(key, prev)
  }

}
