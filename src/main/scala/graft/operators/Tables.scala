package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (`/root/repo/TESTDATA.md`) plus
  * shared cross-engine-determinism helpers.
  *
  * Every query in [[graft.SparkEntry.queries]] is hash-compared against a
  * DuckDB oracle, so results must be bit-identical across engines. The rules
  * encoded here:
  *
  *   - double SUM/AVG go through a decimal cast (exact, order-independent
  *     accumulation) and back to double — FP addition is not associative, so
  *     summing raw doubles in different orders diverges in the last ulps and
  *     can flip a rounded digit. Per-row double arithmetic needs no such
  *     treatment (IEEE ops are deterministic given operand order).
  *   - timestamps are emitted as epoch microseconds (BIGINT): the parquet
  *     testdata carries µs-precision values in ns-typed columns, and engines
  *     disagree on the display/physical type but not on unix_micros.
  *   - every result has a deterministic total ORDER BY (unique key suffix).
  *   - counts are BIGINT on both sides (`count(*)` natively; Spark `size()`
  *     is INT and gets cast).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as three physical types across driver testdata
    * generations: TIMESTAMP(NANOS) (read as a raw ns long under
    * spark.sql.legacy.parquet.nanosAsLong=true — set by Verify/Bench/tests),
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ — the
    * current generation), and TIMESTAMP(MICROS, adjusted) (read as
    * TimestampType). Normalize all three to a µs TimestampType: ns via
    * integer division (the ns epoch value exceeds 2^53, so float division
    * would lose microseconds), NTZ via cast — value-preserving because every
    * graft session pins spark.sql.session.timeZone=UTC, matching DuckDB's
    * epoch_us(ntz) which also reads the wall-clock as UTC. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(table(spark, sfDir, "events"), "ts")

  /** See [[events]]: ns-long / TIMESTAMP_NTZ / TIMESTAMP → µs TimestampType. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, col(c).cast("timestamp"))
      case _ => df
    }
  /** Redistribute a NARROW-SPLIT scan before CPU-heavy per-row work. The
    * testdata corpora are single-row-group parquet files — unsplittable
    * (the gzip problem) — so a heavy map pass (per-shingle/per-token
    * hashing) otherwise runs as ONE task no matter how many cores exist:
    * measured 75 s → 15 s on `text_cdc_chunks` at sf1. No-op whenever the
    * frame already carries at least the session's parallelism in
    * partitions — a fleet-scale corpus written in thousands of splits
    * takes that branch and never pays the exchange. The exchange keys on
    * `key` (doc_id), so the "exchange keys are never text" invariant the
    * dedup plans assert is preserved: text rides as DATA through this one
    * deliberate redistribution, exactly like a production re-spread of
    * unsplittable inputs. */
  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val have = df.rdd.getNumPartitions
    val want = df.sparkSession.sparkContext.defaultParallelism
    // the partition count is EXPLICIT: a bare repartition(key) is a
    // REPARTITION_BY_COL exchange that AQE may coalesce back to one
    // partition when the frame is small in BYTES — defeating the whole
    // point when the downstream work is per-row CPU (a 3 MB frame about
    // to fan out 32 hash evaluations per row coalesced to ONE task:
    // measured 8 s → <2 s on q_bootstrap_ci at sf0.1). An explicit count
    // is exempt from AQE coalescing.
    if (have < want) df.repartition(want, key) else df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")

  /** Time-range scan of `events` with the predicate pushed to the parquet
    * scan. Filtering the *derived* µs timestamp (`timestamp_micros(ts div
    * 1000)`) would defeat pushdown — the scan would read every row group.
    * Instead the bounds are translated to raw ns and applied to the physical
    * column (`ts_us ≥ F ⟺ ts_ns ≥ F·1000` under truncating division), which
    * `.explain` confirms lands in PushedFilters → row-group stats pruning at
    * scale. */
  def eventsTimeRange(spark: SparkSession, sfDir: String,
      fromIso: String, untilIso: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    val fromUs = java.time.Instant.parse(fromIso).toEpochMilli * 1000L
    val untilUs = java.time.Instant.parse(untilIso).toEpochMilli * 1000L
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.filter(col("ts") >= lit(fromUs * 1000L) && col("ts") < lit(untilUs * 1000L))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // filter on the RAW NTZ column with NTZ literals (constant-folded),
        // so the predicate stays pushable; normalize the type only after
        val fromNtz = timestamp_micros(lit(fromUs)).cast("timestamp_ntz")
        val untilNtz = timestamp_micros(lit(untilUs)).cast("timestamp_ntz")
        df.filter(col("ts") >= fromNtz && col("ts") < untilNtz)
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        df.filter(col("ts") >= timestamp_micros(lit(fromUs)) &&
          col("ts") < timestamp_micros(lit(untilUs)))
    }
  }

  /** Exact sum of a double column: decimal accumulation, rounded, back to
    * double. DuckDB twin: `CAST(ROUND(SUM(CAST(x AS DECIMAL(28,S))), R) AS DOUBLE)`.
    * The final decimal→double cast is exact for |v| < 2^53 / 10^R. */
  def exactSum(c: Column, scale: Int = 4, roundTo: Int = 2): Column =
    round(sum(c.cast(s"decimal(28,$scale)")), roundTo).cast("double")

  /** Round a DOUBLE to 6 decimals with pure IEEE arithmetic:
    * `floor(x·10⁶ + 0.5) / 10⁶`. Engines disagree on `round(double, n)` —
    * Java/Spark round the shortest decimal *string* (BigDecimal.valueOf,
    * HALF_UP) while DuckDB rounds the exact *binary* value, so e.g.
    * 0.5000005 (binary 0.50000049999…) rounds to 0.500001 on the JVM but
    * 0.5 in DuckDB. The floor formula is three IEEE ops with one defined
    * result on every engine (Spark's floor yields LONG, DuckDB's DOUBLE —
    * both exact integers < 2^53, so the final division is identical).
    * Callers guarantee |x| < 2^53/10⁶ and non-NaN (Spark's long-floor maps
    * NaN to 0). DuckDB twin: [[portableRound6Sql]]. */
  def portableRound6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** DuckDB twin of [[portableRound6]]. */
  def portableRound6Sql(expr: String): String =
    s"floor(($expr) * 1000000 + 0.5) / 1000000"

  /** Exact average: decimal sum cast to double, divided by the BIGINT count,
    * portably rounded to 6 decimals. Decimal summation is order-independent,
    * the decimal→double cast is a single correctly-rounded step (sums stay
    * < 2^53/10⁶), and the rounding is [[portableRound6]]. DuckDB twin:
    * `floor((CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)) * 1000000 + 0.5) / 1000000`. */
  def exactAvg(c: Column): Column =
    portableRound6(sum(c.cast("decimal(28,6)")).cast("double") / count(c))

  /** DuckDB twin of [[exactAvg]] as a SQL fragment over column `x`. */
  def exactAvgSql(x: String): String =
    portableRound6Sql(s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE) / COUNT($x)")

  /** Eagerly materialize `out` and release the intermediate caches it was
    * built from. Operators that `persist()` a mid-pipeline frame (self-join
    * inputs, signature tables) must not return a lazy plan that still
    * depends on that cache: the caller can never release it (Spark's
    * CacheManager holds entries until an explicit unpersist). Instead the
    * small *result* is localCheckpoint-ed — its blocks belong to the RDD and
    * are reclaimed by the ContextCleaner once the returned frame is
    * unreferenced — and the big intermediates are unpersisted before
    * returning, so a Verify/Bench run leaves no cached blocks behind. */
  def materializeAndRelease(out: DataFrame, caches: DataFrame*): DataFrame = {
    val materialized = out.localCheckpoint(true)
    caches.foreach(_.unpersist(false))
    materialized
  }
}
