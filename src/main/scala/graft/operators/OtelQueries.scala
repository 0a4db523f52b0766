package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's documented query set over the produced OTLP flat tables
  * (/root/reference/docs/querying.md — the canonical promises, SURVEY §2.4),
  * expressed against `otel_logs` / `otel_traces` directories written by
  * [[graft.io.OtelWrite]].
  *
  * These run on the engine's own output (not the driver's sf tables), so
  * they are verified by OtelQueriesSpec over ingested golden fixtures rather
  * than the DuckDB sf-gate. The TraceId join resolves the reference's
  * glossed type mismatch (SURVEY §7.4#3): logs carry 16-byte binary ids,
  * traces carry 32-char lowercase hex — the join key is `hex(logs.TraceId)`
  * lower-cased, and all-zero ids (no trace context) are excluded.
  */
object OtelQueries {

  def logs(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/otel_logs")

  def traces(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/otel_traces")

  /** Recent error/fatal logs (docs/querying.md:52-58): IN-list + time order,
    * partition pruning via the service/year/…/hour layout when filtered. */
  def recentErrors(spark: SparkSession, root: String, limit: Int = 100): DataFrame =
    logs(spark, root)
      .filter(col("SeverityText").isin("ERROR", "FATAL"))
      .select(col("Timestamp"), col("ServiceName"), col("SeverityText"), col("Body"))
      .orderBy(col("Timestamp").desc)
      .limit(limit)

  /** Log volume per service (docs/querying.md:43-48). */
  def logVolumeByService(spark: SparkSession, root: String): DataFrame =
    logs(spark, root)
      .groupBy(col("ServiceName"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ServiceName"))

  /** Slowest traces (docs/querying.md:63-82): top-k by Duration (ns),
    * seconds projected out. */
  def slowestTraces(spark: SparkSession, root: String, k: Int = 10): DataFrame =
    traces(spark, root)
      .filter(col("ParentSpanId").isNull) // root spans = whole traces
      .select(col("TraceId"), col("ServiceName"), col("SpanName"),
        (col("Duration") / lit(1e9)).as("duration_s"))
      .orderBy(col("Duration").desc, col("TraceId"))
      .limit(k)

  /** Logs for errored traces (docs/querying.md:110-124): the documented
    * logs ⋈ traces equi-join on TraceId. Binary→hex normalization on the
    * logs side; zero ids (no trace context) dropped pre-join so they can't
    * fan out. The traces side (filtered to errors) is broadcast — at fleet
    * scale errored root spans are a small fraction of log volume. */
  def logsForErroredTraces(spark: SparkSession, root: String,
      statusCodes: Seq[String] = Seq("STATUS_CODE_ERROR")): DataFrame = {
    val l = logs(spark, root)
      .filter(hex(col("TraceId")) =!= lit("0" * 32))
      .withColumn("trace_hex", lower(hex(col("TraceId"))))
    val t = traces(spark, root)
      .filter(col("StatusCode").isin(statusCodes: _*))
      .select(col("TraceId").as("trace_hex"), col("SpanName"), col("StatusCode"))
      .distinct()
    l.join(broadcast(t), "trace_hex")
      .select(col("trace_hex"), col("Timestamp"), col("ServiceName"),
        col("SeverityText"), col("Body"), col("SpanName"), col("StatusCode"))
      .orderBy(col("Timestamp"), col("trace_hex"))
  }

  /** Span throughput per hour (docs/querying.md:87-95 shape over traces). */
  def spansPerHour(spark: SparkSession, root: String): DataFrame =
    traces(spark, root)
      .groupBy(date_trunc("hour", col("Timestamp")).as("hour"),
        col("ServiceName"))
      .agg(count(lit(1)).as("n_spans"),
        Tables.exactAvg(col("Duration").cast("double")).as("avg_duration_ns"))
      .orderBy(col("hour"), col("ServiceName"))

  /** Span-tree assembly: BFS depth labeling over the (TraceId, SpanId,
    * ParentSpanId) hierarchy, then a per-trace summary — the trace-waterfall
    * primitive (how deep did the call tree go, how many spans, which root).
    * The reference stores the parent linkage but offers no assembly query;
    * this is the natural next question a trace UI asks of the table.
    *
    * Algorithm: iterative frontier joins (roots at depth 1, then children
    * of the frontier at depth+1), each level `localCheckpoint`ed so the
    * lineage stays flat — the bounded-iteration BFS sibling of the
    * [[Dedup]] connected-components loop. Iterations = tree depth (call
    * trees are shallow — tens, not thousands), each a hash join keyed on
    * (TraceId, SpanId): at fleet scale, pre-partitioning the span table by
    * TraceId co-locates every level's probe side. Spans whose parent id
    * never resolves within the trace (truncated ingest, sampled-out
    * parents) are reported per-trace as `n_orphans` rather than silently
    * dropped — on real telemetry, partial traces are the common case.
    *
    * Output (one row per trace, TraceId-ordered): `n_spans`, `max_depth`
    * (0 if the trace has no null-parent root at all), `n_roots`,
    * `n_orphans`, and the earliest root's name + duration. */
  /** BFS depth cap shared by [[traceDepth]] and its recursive-CTE oracle:
    * spans deeper than this are reported as orphans BY CONTRACT (both
    * engines apply the same cap, so the gate cannot silently diverge on
    * pathologically deep traces). 64 is far beyond real call trees. */
  val TraceMaxDepth = 64

  def traceDepth(traces: DataFrame, maxDepth: Int = TraceMaxDepth): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = traces.select(col("TraceId"), col("SpanId"),
      col("ParentSpanId"), col("SpanName"), col("Timestamp"), col("Duration"))
    // materialize each BFS level AND detach it from its origin plan:
    // localCheckpoint alone keeps the origin plan's constraints (with
    // pre-checkpoint attribute ids), and Union's constraint rewrite throws
    // a missing-attribute lookup when two related-lineage checkpoints meet.
    // Rebuilding from the checkpointed RDD + schema yields a constraint-free
    // LogicalRDD with fresh ids — safe to union and re-join arbitrarily.
    def level(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      c.sparkSession.createDataFrame(c.rdd, c.schema)
    }
    var frontier = level(spans.filter(col("ParentSpanId").isNull)
      .select(col("TraceId"), col("SpanId"), lit(1).as("depth")))
    var reached = frontier
    var d = 1
    while (d < maxDepth && !frontier.isEmpty) {
      frontier = level(spans.as("s").join(frontier.as("f"),
          col("s.TraceId") === col("f.TraceId") &&
            col("s.ParentSpanId") === col("f.SpanId"))
        .select(col("s.TraceId").as("TraceId"), col("s.SpanId").as("SpanId"),
          (col("f.depth") + 1).as("depth")))
      reached = reached.union(frontier)
      d += 1
    }
    val labeled = spans.join(reached, Seq("TraceId", "SpanId"), "left")
    val rootW = Window.partitionBy(col("TraceId"))
      .orderBy(col("Timestamp"), col("SpanId"))
    val firstRoot = spans.filter(col("ParentSpanId").isNull)
      .withColumn("rn", row_number().over(rootW))
      .filter(col("rn") === 1)
      .select(col("TraceId"), col("SpanName").as("root_name"),
        col("Duration").as("root_duration_ns"))
    labeled.groupBy(col("TraceId"))
      .agg(count(lit(1)).as("n_spans"),
        coalesce(max(col("depth")), lit(0)).cast("long").as("max_depth"),
        sum(when(col("depth") === 1, 1L).otherwise(0L)).as("n_roots"),
        sum(when(col("depth").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .join(firstRoot, Seq("TraceId"), "left")
      .orderBy(col("TraceId"))
  }

  // ---- gate-verified variants over the reference's golden parquet ----------
  // The sfDir argument is ignored: these read the reference's own golden
  // tables (read-only), so the documented telemetry query surface is
  // DuckDB-hash-verified on REAL otel data, not only spec-checked on
  // engine output.

  // Overridable so the gate queries run on any machine with a checkout of
  // the golden fixtures — the oracle SQL strings below are generated with
  // the same resolved path, so Spark and DuckDB always read the same files.
  private val GoldenDir =
    sys.env.getOrElse("GRAFT_GOLDEN_DIR", "/root/reference/testdata/parquet")

  /** Per-(service, severity) log counts over golden logs
    * (docs/querying.md:43-58 shape). */
  def goldenSevCounts(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/logs.parquet")
      .groupBy(col("ServiceName"), col("SeverityText"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ServiceName"), col("SeverityText"))

  /** Slowest root spans over golden traces (docs/querying.md:63-82). */
  def goldenSlowSpans(spark: SparkSession, sfDirIgnored: String,
      k: Int = 10): DataFrame =
    spark.read.parquet(s"$GoldenDir/traces.parquet")
      .filter(col("ParentSpanId").isNull)
      .select(col("TraceId"), col("SpanName"), col("Duration"),
        (col("Duration") / lit(1e9)).as("duration_s"))
      .orderBy(col("Duration").desc, col("TraceId"))
      .limit(k)

  /** logs ⋈ traces correlation on TraceId over the goldens
    * (docs/querying.md:110-124): binary→lower-hex normalization on the logs
    * side, zero ids excluded, per-trace log/span counts. */
  def goldenTraceLogJoin(spark: SparkSession, sfDirIgnored: String): DataFrame = {
    val l = spark.read.parquet(s"$GoldenDir/logs.parquet")
      .filter(hex(col("TraceId")) =!= lit("0" * 32))
      .groupBy(lower(hex(col("TraceId"))).as("trace_hex"))
      .agg(count(lit(1)).as("n_logs"))
    val t = spark.read.parquet(s"$GoldenDir/traces.parquet")
      .groupBy(col("TraceId").as("trace_hex"))
      .agg(countDistinct(col("SpanId")).as("n_spans"))
    l.join(t, "trace_hex").orderBy(col("trace_hex"))
  }

  /** Histogram p95 over the golden `metrics_histogram` table — the
    * reference's documented histogram-percentile query in its native array
    * shape (docs/querying.md:97-108; schema docs/reference.md:94-162).
    *
    * Per row: cumulative-sum the `BucketCounts` list until it covers 95% of
    * the total, then report the 1-based bucket index and its upper
    * `ExplicitBounds` bound (NULL when p95 lands in the +Inf overflow bucket
    * — BucketCounts has one more entry than ExplicitBounds). The threshold
    * test is pure integer arithmetic (`20*cum >= 19*total`), so Spark and
    * DuckDB agree bit-for-bit. A pure per-row map — no shuffle, no state:
    * at 100 TB this is a scan + project that parallelizes perfectly.
    */
  def goldenHistP95(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/metrics_histogram.parquet")
      .select(
        unix_micros(col("Timestamp")).as("ts_us"),
        col("MetricName").as("metric_name"),
        col("BucketCounts"), col("ExplicitBounds"))
      .withColumn("total_count",
        expr("aggregate(BucketCounts, 0L, (acc, x) -> acc + x)"))
      // empty-array guard: sequence(1, 0) yields the DESCENDING [1, 0] in
      // Spark (inferred step -1) while DuckDB's generate_series(1, 0) is
      // empty — NULL on both engines instead
      .withColumn("p95_idx",
        expr("""IF(size(BucketCounts) = 0, CAST(NULL AS BIGINT),
               |CAST(filter(sequence(1, size(BucketCounts)),
               |  i -> 20 * aggregate(slice(BucketCounts, 1, i), 0L,
               |         (acc, x) -> acc + x) >= 19 * total_count)[0]
               |AS BIGINT))""".stripMargin))
      .withColumn("p95_bound",
        expr("""IF(p95_idx <= size(ExplicitBounds),
               |   try_element_at(ExplicitBounds, CAST(p95_idx AS INT)),
               |   CAST(NULL AS DOUBLE))""".stripMargin))
      .select(col("ts_us"), col("metric_name"), col("total_count"),
        col("p95_idx"), col("p95_bound"))
      .orderBy(col("ts_us"), col("metric_name"), col("total_count"))

  /** [[goldenHistP95]]'s per-row array-p95, at sf scale: the same
    * cumulative-threshold rule (`20·cum ≥ 19·total`, pure integer — the
    * engines agree bit-for-bit) over the 10⁴-row generated histogram table
    * ([[graft.TestDataGen.histograms]]) whose layouts rotate through 1–8
    * buckets, empty arrays, all-zero counts, and overflow-heavy rows. The
    * golden table proved the operator on 3 real rows; this entry proves it
    * per-row across every layout class at 10³× that volume. Still a pure
    * scan+project map — no shuffle, the 100 TB shape. */
  def histP95AtScale(spark: SparkSession, sfDirIgnored: String,
      n: Long = 10000L): DataFrame =
    graft.TestDataGen.histograms(spark, n)
      .withColumn("total_count",
        expr("aggregate(BucketCounts, 0L, (acc, x) -> acc + x)"))
      .withColumn("p95_idx",
        expr("""IF(size(BucketCounts) = 0, CAST(NULL AS BIGINT),
               |CAST(filter(sequence(1, size(BucketCounts)),
               |  i -> 20 * aggregate(slice(BucketCounts, 1, i), 0L,
               |         (acc, x) -> acc + x) >= 19 * total_count)[0]
               |AS BIGINT))""".stripMargin))
      .withColumn("p95_bound",
        expr("""IF(p95_idx <= size(ExplicitBounds),
               |   try_element_at(ExplicitBounds, CAST(p95_idx AS INT)),
               |   CAST(NULL AS DOUBLE))""".stripMargin))
      .select(col("hist_id"), col("total_count"), col("p95_idx"), col("p95_bound"))
      .orderBy(col("hist_id"))

  /** DuckDB twin of [[histP95AtScale]]: the shared generation CTE + the
    * golden oracle's list-cumulative rule. */
  def histP95AtScaleOracleSql(n: Long = 10000L): String =
    s"""WITH ${graft.TestDataGen.histogramsSqlCte(n)}
       |SELECT hist_id,
       |  CAST(coalesce(list_aggregate(BucketCounts, 'sum'), 0) AS BIGINT) AS total_count,
       |  CAST(list_filter(generate_series(1, len(BucketCounts)),
       |    i -> 20 * list_aggregate(BucketCounts[1:i], 'sum')
       |         >= 19 * coalesce(list_aggregate(BucketCounts, 'sum'), 0))[1] AS BIGINT) AS p95_idx,
       |  CASE WHEN list_filter(generate_series(1, len(BucketCounts)),
       |         i -> 20 * list_aggregate(BucketCounts[1:i], 'sum')
       |              >= 19 * coalesce(list_aggregate(BucketCounts, 'sum'), 0))[1]
       |       <= len(ExplicitBounds)
       |    THEN ExplicitBounds[CAST(list_filter(generate_series(1, len(BucketCounts)),
       |           i -> 20 * list_aggregate(BucketCounts[1:i], 'sum')
       |                >= 19 * coalesce(list_aggregate(BucketCounts, 'sum'), 0))[1] AS INT)]
       |    ELSE CAST(NULL AS DOUBLE) END AS p95_bound
       |FROM hist
       |ORDER BY hist_id""".stripMargin

  /** HISTOGRAM MERGE — the metrics-rollup primitive every TSDB backend
    * runs: re-aggregate many explicit-bucket histogram datapoints into ONE
    * histogram per bucket LAYOUT (same `ExplicitBounds` ⇒ buckets are
    * addition-compatible; merging across layouts requires re-bucketing and
    * is a different, lossy operation — this gate merges only what is exact).
    * Output per layout: bucket count, the layout's bound step, datapoint
    * count, grand total, and the merged per-bucket counts (CSV-canonical —
    * BIGINT rendering agrees across engines where double rendering of an
    * array key would not). Runs over the generated 10⁴-row histogram
    * corpus ([[graft.TestDataGen.histograms]]) — the goldens hold too few
    * layouts to exercise the merge.
    *
    * Scale shape: one posexplode (rows × ≤8 buckets), a map-side-combined
    * SUM keyed on (layout, bucket-index) — the key space is
    * |layouts|·buckets, never row-scale — then a per-layout assembly of at
    * most 8 cells. Element-wise addition is commutative/associative, so
    * partial aggregation and any partitioning give the identical result;
    * the n_points count rides the idx-0 cell, so no second pass over the
    * data and no array-keyed join. */
  def histMerge(spark: SparkSession, sfDirIgnored: String,
      n: Long = 10000L): DataFrame = {
    val h = histCorpus(spark, n)
      .filter(size(col("BucketCounts")) > 0)
    val ex = h.select(col("ExplicitBounds"),
      posexplode(col("BucketCounts")).as(Seq("idx", "c")))
    val cells = ex.groupBy(col("ExplicitBounds"), col("idx"))
      .agg(sum(col("c")).as("csum"), count(lit(1)).as("nrows"))
    cells.groupBy(col("ExplicitBounds"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(idx, csum))), " +
          "x -> CAST(x.csum AS STRING)), ',')").as("merged_csv"),
        sum(col("csum")).as("total_count"),
        max(when(col("idx") === 0, col("nrows"))).as("n_points"))
      .select((size(col("ExplicitBounds")) + 1).cast("long").as("n_buckets"),
        coalesce(expr("try_element_at(ExplicitBounds, 1)"), lit(0.0))
          .as("bound_step"),
        col("n_points"), col("total_count"), col("merged_csv"))
      .orderBy(col("n_buckets"), col("bound_step"))
  }

  /** DuckDB twin of [[histMerge]] — shared generator CTE; 1-based
    * generate_series indexing mirrors Spark's 0-based posexplode
    * (order-consistent within each engine, which is all the CSV
    * canonicalization needs). */
  def histMergeOracleSql(n: Long = 10000L): String =
    s"""WITH ${graft.TestDataGen.histogramsSqlCte(n)},
       |nz AS (
       |  SELECT ExplicitBounds, BucketCounts FROM hist
       |  WHERE len(BucketCounts) > 0
       |), ex AS (
       |  SELECT ExplicitBounds, r.i AS idx, BucketCounts[r.i] AS c
       |  FROM nz, unnest(generate_series(1, len(BucketCounts))) AS r(i)
       |), cells AS (
       |  SELECT ExplicitBounds, idx, CAST(sum(c) AS BIGINT) AS csum,
       |    count(*) AS nrows
       |  FROM ex GROUP BY 1, 2
       |), m AS (
       |  SELECT ExplicitBounds,
       |    string_agg(CAST(csum AS VARCHAR), ',' ORDER BY idx) AS merged_csv,
       |    CAST(sum(csum) AS BIGINT) AS total_count,
       |    CAST(max(CASE WHEN idx = 1 THEN nrows END) AS BIGINT) AS n_points
       |  FROM cells GROUP BY 1
       |)
       |SELECT CAST(len(ExplicitBounds) + 1 AS BIGINT) AS n_buckets,
       |  coalesce(ExplicitBounds[1], 0.0) AS bound_step,
       |  n_points, total_count, merged_csv
       |FROM m
       |ORDER BY n_buckets, bound_step""".stripMargin

  /** Target analysis grid for [[histRebucket]] — 5 buckets:
    * [0,25), [25,50), [50,100), [100,200), [200,∞). */
  val RebucketBounds: Seq[Long] = Seq(25L, 50L, 100L, 200L)

  /** HISTOGRAM REBUCKETING — the LOSSY half of the rollup primitive that
    * [[histMerge]] deliberately excludes: histograms with DIFFERENT bucket
    * layouts cannot be added exactly, so cross-layout aggregation
    * redistributes each source bucket's count onto one fixed analysis grid
    * under the standard uniform-within-bucket assumption. The lossiness is
    * made DETERMINISTIC and count-conserving: integer floor splits
    * proportional to interval overlap, with each source bucket's remainder
    * assigned to its LAST overlapping target bucket (so every engine, and
    * every partitioning, produces the identical grid and
    * Σ target = Σ source exactly — spec-asserted). Unbounded source
    * buckets (+∞ overflow, and layout-less single-bucket rows) map wholly
    * to the grid's overflow bucket — no uniform assumption exists for an
    * infinite interval.
    *
    * Scale shape: one explode (rows × ≤8 buckets) cross-joined against
    * the broadcast 5-row grid, two per-source-bucket window passes over
    * ≤5-row partitions, then a 5-key final aggregate. Nothing global.
    *
    * PRECONDITION (enforced in-plan, fail-loud): any row WITH a layout
    * must have a positive-integer first explicit bound — the uniform-step
    * rule derives every interval from it, and a fractional or non-positive
    * bound would yield zero-width source intervals whose counts the
    * `ov > 0` filter silently drops, breaking the count-conservation
    * guarantee. Layout-less rows (empty bounds) are exempt — they map
    * wholly to overflow. */
  def histRebucket(spark: SparkSession, sfDirIgnored: String,
      n: Long = 10000L): DataFrame =
    histRebucketOf(histCorpus(spark, n))

  /** The rebucket core of [[histRebucket]] over an arbitrary
    * (hist_id, ExplicitBounds, BucketCounts) frame — exposed for the
    * negative-fixture spec (fractional/non-positive first bound must
    * raise, not silently drop counts). */
  private[graft] def histRebucketOf(h: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = h.sparkSession
    import spark.implicits._
    val bs = RebucketBounds
    val targets: Seq[(Long, Long, Option[Long])] =
      bs.zipWithIndex.map { case (b, i) =>
        (i.toLong, if (i == 0) 0L else bs(i - 1), Some(b): Option[Long])
      } :+ ((bs.size.toLong, bs.last, None: Option[Long]))
    val tdf = targets.toDF("tj", "tlo", "thi")
    // integer-positive-step guard: raise instead of silently conserving
    // nothing (see scaladoc precondition)
    val rawStep = expr("try_element_at(ExplicitBounds, 1)")
    val checkedStep =
      when(size(col("ExplicitBounds")) === 0, lit(null).cast("bigint"))
        .otherwise(when(rawStep > 0 && rawStep === floor(rawStep),
            rawStep.cast("bigint"))
          .otherwise(raise_error(concat(
            lit("histRebucket: first explicit bound must be a positive " +
              "integer (uniform-step layout), got "),
            rawStep.cast("string"))).cast("bigint")))
    val src = h
      .filter(size(col("BucketCounts")) > 0)
      .select(col("hist_id"),
        checkedStep.as("step"),
        size(col("ExplicitBounds")).cast("long").as("m"),
        posexplode(col("BucketCounts")).as(Seq("idx", "c")))
      .withColumn("lo", col("idx") * col("step"))
      .withColumn("hi",
        when(col("idx") < col("m"), (col("idx") + 1) * col("step")))
    val pairs = src.crossJoin(broadcast(tdf))
      .withColumn("ov",
        when(col("hi").isNull,
          when(col("thi").isNull, lit(1L)).otherwise(lit(0L)))
          .otherwise(greatest(lit(0L),
            least(coalesce(col("thi"), col("hi")), col("hi")) -
              greatest(col("lo"), col("tlo")))))
      .filter(col("ov") > 0)
      .withColumn("floor_p",
        when(col("hi").isNull, col("c"))
          .otherwise(expr("c * ov div (hi - lo)")))
    val w = Window.partitionBy(col("hist_id"), col("idx"))
    pairs
      .withColumn("max_tj", max(col("tj")).over(w))
      .withColumn("sum_floor", sum(col("floor_p")).over(w))
      .withColumn("portion",
        when(col("tj") === col("max_tj"),
          col("c") - (col("sum_floor") - col("floor_p")))
          .otherwise(col("floor_p")))
      .groupBy(col("tj"))
      .agg(sum(col("portion")).as("n"))
      .join(broadcast(tdf), Seq("tj"))
      .select(col("tj").as("bucket"), col("tlo").as("lo_bound"),
        col("thi").as("hi_bound"), col("n"))
      .orderBy(col("bucket"))
  }

  /** DuckDB twin of [[histRebucket]] — identical overlap arithmetic,
    * floor-split + last-bucket-remainder rule. */
  def histRebucketOracleSql(n: Long = 10000L): String = {
    val bs = RebucketBounds
    val vals = (bs.zipWithIndex.map { case (b, i) =>
      s"(${i}, ${if (i == 0) 0L else bs(i - 1)}, $b)"
    } :+ s"(${bs.size}, ${bs.last}, NULL)").mkString(", ")
    s"""WITH ${graft.TestDataGen.histogramsSqlCte(n)},
       |src AS (
       |  SELECT hist_id, CAST(ExplicitBounds[1] AS BIGINT) AS step,
       |    len(ExplicitBounds) AS m, r.i - 1 AS idx, BucketCounts[r.i] AS c
       |  FROM hist, unnest(generate_series(1, len(BucketCounts))) AS r(i)
       |  WHERE len(BucketCounts) > 0
       |), sb AS (
       |  SELECT hist_id, idx, c, idx * step AS lo,
       |    CASE WHEN idx < m THEN (idx + 1) * step END AS hi
       |  FROM src
       |), t(tj, tlo, thi) AS (
       |  SELECT * FROM (VALUES $vals) v(tj, tlo, thi)
       |), pairs AS (
       |  SELECT sb.hist_id, sb.idx, sb.c, sb.lo, sb.hi, t.tj,
       |    CASE WHEN sb.hi IS NULL
       |         THEN CASE WHEN t.thi IS NULL THEN 1 ELSE 0 END
       |         ELSE greatest(0, least(coalesce(t.thi, sb.hi), sb.hi)
       |                          - greatest(sb.lo, t.tlo)) END AS ov
       |  FROM sb CROSS JOIN t
       |), fp AS (
       |  SELECT *, CASE WHEN hi IS NULL THEN c
       |                 ELSE c * ov // (hi - lo) END AS floor_p
       |  FROM pairs WHERE ov > 0
       |), par AS (
       |  SELECT *, max(tj) OVER (PARTITION BY hist_id, idx) AS max_tj,
       |    sum(floor_p) OVER (PARTITION BY hist_id, idx) AS sum_floor
       |  FROM fp
       |), portions AS (
       |  SELECT tj,
       |    CASE WHEN tj = max_tj THEN c - (sum_floor - floor_p)
       |         ELSE floor_p END AS portion
       |  FROM par
       |)
       |SELECT CAST(p.tj AS BIGINT) AS bucket, CAST(t.tlo AS BIGINT) AS lo_bound,
       |  CAST(t.thi AS BIGINT) AS hi_bound, CAST(sum(p.portion) AS BIGINT) AS n
       |FROM portions p JOIN t ON p.tj = t.tj
       |GROUP BY 1, 2, 3 ORDER BY bucket""".stripMargin
  }

  /** [[goldenExpHistP95]]'s integer p95 rule at sf scale, over the
    * generated 10⁴-row exponential-histogram table
    * ([[graft.TestDataGen.expHistograms]]): scales −2..5, zero-bucket-only
    * rows, empty rows, tail-heavy rows, varying offsets. Same pure-integer
    * per-row map as the golden form. */
  def expHistP95AtScale(spark: SparkSession, sfDirIgnored: String,
      n: Long = 10000L): DataFrame =
    expHistCorpus(spark, n)
      .select(col("hist_id"), col("Scale").as("scale"),
        col("ZeroCount").as("zc"), col("PositiveOffset").as("pos_off"),
        col("PositiveBucketCounts").as("pbc"))
      .withColumn("total_count",
        expr("zc + aggregate(pbc, 0L, (acc, x) -> acc + x)"))
      .withColumn("p95_idx",
        expr("""CAST(coalesce(
               |  try_element_at(filter(sequence(0, size(pbc)),
               |    i -> 20 * (zc + aggregate(slice(pbc, 1, i), 0L,
               |           (acc, x) -> acc + x)) >= 19 * total_count), 1),
               |  -1L) AS BIGINT)""".stripMargin))
      .withColumn("p95_log2_scaled",
        expr("IF(p95_idx > 0, pos_off + p95_idx, CAST(NULL AS BIGINT))"))
      .select(col("hist_id"), col("scale"), col("total_count"),
        col("p95_idx"), col("p95_log2_scaled"))
      .orderBy(col("hist_id"))

  /** DuckDB twin of [[expHistP95AtScale]]: shared generation CTE + the
    * golden exp-hist oracle's list rule. */
  def expHistP95AtScaleOracleSql(n: Long = 10000L): String =
    s"""WITH ${graft.TestDataGen.expHistogramsSqlCte(n)}
       |SELECT hist_id, Scale AS scale,
       |  CAST(ZeroCount + coalesce(list_aggregate(PositiveBucketCounts, 'sum'), 0) AS BIGINT) AS total_count,
       |  CAST(coalesce(list_filter(generate_series(0, len(PositiveBucketCounts)),
       |    i -> 20 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts[1:i], 'sum'), 0))
       |         >= 19 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts, 'sum'), 0)))[1],
       |    -1) AS BIGINT) AS p95_idx,
       |  CASE WHEN coalesce(list_filter(generate_series(0, len(PositiveBucketCounts)),
       |    i -> 20 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts[1:i], 'sum'), 0))
       |         >= 19 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts, 'sum'), 0)))[1],
       |    -1) > 0
       |    THEN PositiveOffset + coalesce(list_filter(generate_series(0, len(PositiveBucketCounts)),
       |      i -> 20 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts[1:i], 'sum'), 0))
       |           >= 19 * (ZeroCount + coalesce(list_aggregate(PositiveBucketCounts, 'sum'), 0)))[1], -1)
       |    ELSE CAST(NULL AS BIGINT) END AS p95_log2_scaled
       |FROM ehist
       |ORDER BY hist_id""".stripMargin

  /** p95 over the golden `metrics_exponential_histogram` table — the
    * exponential-bucket sibling of [[goldenHistP95]] (schema
    * docs/reference.md:94-162: `Scale`, `ZeroCount`, `PositiveOffset`,
    * `PositiveBucketCounts`; bucket i covers (2^((off+i)·2⁻ˢᶜ), 2^((off+i+1)·2⁻ˢᶜ)]).
    *
    * The bound itself (`2^(x·2⁻ˢᶜ)`) is transcendental — `pow` is not
    * bit-identical across engines — so the query reports the EXACT integer
    * `p95_log2_scaled = PositiveOffset + idx + 1` (= log₂(upper bound) ×
    * 2^Scale) next to `Scale`, from which any consumer derives the bound.
    * Ranking covers the non-negative domain (duration metrics: the golden
    * rows have empty negative buckets, asserted by the total check): the
    * zero bucket first, then positive buckets ascending; NULL
    * `p95_log2_scaled` means p95 falls in the zero bucket. Pure integer
    * per-row map — same 100 TB shape as [[goldenHistP95]]. */
  def goldenExpHistP95(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/metrics_exponential_histogram.parquet")
      .select(
        unix_micros(col("Timestamp")).as("ts_us"),
        col("MetricName").as("metric_name"),
        col("Scale").cast("int").as("scale"),
        col("ZeroCount").as("zc"),
        col("PositiveOffset").cast("long").as("pos_off"),
        col("PositiveBucketCounts").as("pbc"),
        col("NegativeBucketCounts").as("nbc"))
      .withColumn("total_count",
        expr("zc + aggregate(pbc, 0L, (acc, x) -> acc + x)" +
          " + aggregate(nbc, 0L, (acc, x) -> acc + x)"))
      // first 1-based positive-bucket index whose cumulative (zero bucket
      // included) covers 95%; 0 = the zero bucket already covers it
      .withColumn("p95_idx",
        expr("""CAST(coalesce(
               |  try_element_at(filter(sequence(0, size(pbc)),
               |    i -> 20 * (zc + aggregate(slice(pbc, 1, i), 0L,
               |           (acc, x) -> acc + x)) >= 19 * total_count), 1),
               |  -1L) AS BIGINT)""".stripMargin))
      .withColumn("p95_log2_scaled",
        expr("IF(p95_idx > 0, pos_off + p95_idx, CAST(NULL AS BIGINT))"))
      .select(col("ts_us"), col("metric_name"), col("scale"),
        col("total_count"), col("p95_idx"), col("p95_log2_scaled"))
      .orderBy(col("ts_us"), col("metric_name"), col("total_count"))

  /** Hourly gauge averages over the golden gauge table — the documented
    * metrics roll-up (docs/querying.md:84-95) in its native shape:
    * date_trunc('hour') × MetricName, decimal-exact average
    * ([[Tables.exactAvg]] — order-independent, bit-identical in DuckDB).
    * One small-key groupBy; partial aggregation makes it a map-side
    * combine at any scale.
    *
    * Magnitude note: for averages past portableRound6's exact-rounding
    * bound (|x| > 2⁵³/10⁶ ≈ 9.0e9 — the golden memory.available average
    * sits at 8.59e9, inside it), the floor/multiply formula remains a pure
    * IEEE map computed identically by both engines, so the CROSS-ENGINE
    * hash equality the gate needs still holds; only the "exactly 6
    * decimals" reading degrades. */
  def goldenGaugeHourly(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/metrics_gauge.parquet")
      .groupBy(
        unix_micros(date_trunc("hour", col("Timestamp"))).as("hour_us"),
        col("MetricName").as("metric_name"))
      .agg(count(lit(1)).as("n"), Tables.exactAvg(col("Value")).as("avg_value"))
      .orderBy(col("hour_us"), col("metric_name"))

  /** Per-(service, metric) totals over the golden sum table with the
    * temporality/monotonic dimensions surfaced — the counter-table
    * aggregation shape (docs/reference.md sum schema). Decimal-exact
    * totals. */
  def goldenSumTotals(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/metrics_sum.parquet")
      .groupBy(col("ServiceName").as("service_name"),
        col("MetricName").as("metric_name"),
        col("AggregationTemporality").cast("int").as("temporality"),
        col("IsMonotonic").as("is_monotonic"))
      .agg(count(lit(1)).as("n_points"),
        Tables.exactSum(col("Value"), scale = 6, roundTo = 6).as("total"))
      // full grouping key in the sort — a non-unique ORDER BY is exactly
      // the nondeterminism the gate's row-by-row compare cannot tolerate
      .orderBy(col("service_name"), col("metric_name"), col("temporality"),
        col("is_monotonic"))

  /** [[traceDepth]] over the golden traces, gate-shaped: hex trace id,
    * per-trace assembly summary. The goldens are 19 single-span traces —
    * 6 true roots and 13 partial traces whose parent never arrived — so
    * the row exercises exactly the orphan-accounting path a trace UI needs
    * on sampled/truncated real telemetry. (The depth-3 assembly itself is
    * closed-form-verified on a generated corpus in TraceAssemblySpec; the
    * DuckDB twin recomputes depth with a recursive CTE.) */
  def goldenTraceDepth(spark: SparkSession, sfDirIgnored: String): DataFrame =
    traceDepth(spark.read.parquet(s"$GoldenDir/traces.parquet"))
      .select(lower(hex(col("TraceId"))).as("trace_hex"),
        col("n_spans"), col("max_depth"), col("n_roots"), col("n_orphans"),
        col("root_name"), col("root_duration_ns"))
      .orderBy(col("trace_hex"))

  def goldenTraceDepthOracleSql: String =
    s"""WITH RECURSIVE t AS (
       |  SELECT TraceId, SpanId, ParentSpanId, SpanName, Timestamp, Duration
       |  FROM read_parquet('$GoldenDir/traces.parquet')
       |), d(TraceId, SpanId, depth) AS (
       |  SELECT TraceId, SpanId, 1 FROM t WHERE ParentSpanId IS NULL
       |  UNION ALL
       |  SELECT s.TraceId, s.SpanId, b.depth + 1
       |  FROM t s JOIN d b
       |    ON s.TraceId = b.TraceId AND s.ParentSpanId = b.SpanId
       |  WHERE b.depth < $TraceMaxDepth
       |), roots AS (
       |  SELECT TraceId, SpanName AS root_name, Duration AS root_duration_ns,
       |    row_number() OVER (PARTITION BY TraceId ORDER BY Timestamp, SpanId) AS rn
       |  FROM t WHERE ParentSpanId IS NULL
       |)
       |SELECT lower(hex(t.TraceId)) AS trace_hex,
       |  count(*) AS n_spans,
       |  CAST(coalesce(max(d.depth), 0) AS BIGINT) AS max_depth,
       |  CAST(sum(CASE WHEN d.depth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_roots,
       |  CAST(sum(CASE WHEN d.depth IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       |  any_value(r.root_name) AS root_name,
       |  any_value(r.root_duration_ns) AS root_duration_ns
       |FROM t
       |LEFT JOIN d ON t.TraceId = d.TraceId AND t.SpanId = d.SpanId
       |LEFT JOIN (SELECT * FROM roots WHERE rn = 1) r ON t.TraceId = r.TraceId
       |GROUP BY t.TraceId
       |ORDER BY trace_hex""".stripMargin

  /** DuckDB twins over the same golden files. */
  def goldenSevCountsOracleSql: String =
    s"""SELECT ServiceName, SeverityText, count(*) AS n
       |FROM read_parquet('$GoldenDir/logs.parquet')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def goldenSlowSpansOracleSql: String =
    s"""SELECT TraceId, SpanName, Duration, Duration / 1e9 AS duration_s
       |FROM read_parquet('$GoldenDir/traces.parquet')
       |WHERE ParentSpanId IS NULL
       |ORDER BY Duration DESC, TraceId LIMIT 10""".stripMargin

  def goldenHistP95OracleSql: String =
    s"""SELECT epoch_us(Timestamp) AS ts_us, MetricName AS metric_name,
       |  CAST(coalesce(list_aggregate(BucketCounts, 'sum'), 0) AS BIGINT) AS total_count,
       |  CAST(list_filter(generate_series(1, len(BucketCounts)),
       |    i -> 20*list_aggregate(BucketCounts[1:i], 'sum')
       |         >= 19*list_aggregate(BucketCounts, 'sum'))[1] AS BIGINT) AS p95_idx,
       |  CASE WHEN list_filter(generate_series(1, len(BucketCounts)),
       |         i -> 20*list_aggregate(BucketCounts[1:i], 'sum')
       |              >= 19*list_aggregate(BucketCounts, 'sum'))[1]
       |       <= len(ExplicitBounds)
       |    THEN ExplicitBounds[CAST(list_filter(generate_series(1, len(BucketCounts)),
       |      i -> 20*list_aggregate(BucketCounts[1:i], 'sum')
       |           >= 19*list_aggregate(BucketCounts, 'sum'))[1] AS INT)]
       |    ELSE NULL END AS p95_bound
       |FROM read_parquet('$GoldenDir/metrics_histogram.parquet')
       |ORDER BY ts_us, metric_name, total_count""".stripMargin

  // `AT TIME ZONE 'UTC'` first: the golden Timestamp is TIMESTAMPTZ and
  // DuckDB's date_trunc on TIMESTAMPTZ truncates in the SESSION time zone
  // (a half-hour-offset host would shift hour_us by 30 min); converting to
  // naive UTC makes the truncation host-independent, matching Spark's
  // UTC-pinned session.
  def goldenGaugeHourlyOracleSql: String =
    s"""SELECT epoch_us(date_trunc('hour', Timestamp AT TIME ZONE 'UTC')) AS hour_us,
       |  MetricName AS metric_name, count(*) AS n,
       |  ${Tables.portableRound6Sql(
            "CAST(SUM(CAST(Value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(Value)")} AS avg_value
       |FROM read_parquet('$GoldenDir/metrics_gauge.parquet')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def goldenSumTotalsOracleSql: String =
    s"""SELECT ServiceName AS service_name, MetricName AS metric_name,
       |  CAST(AggregationTemporality AS INT) AS temporality,
       |  IsMonotonic AS is_monotonic, count(*) AS n_points,
       |  CAST(round(SUM(CAST(Value AS DECIMAL(28,6))), 6) AS DOUBLE) AS total
       |FROM read_parquet('$GoldenDir/metrics_sum.parquet')
       |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin

  def goldenExpHistP95OracleSql: String =
    s"""WITH b AS (
       |  SELECT epoch_us(Timestamp) AS ts_us, MetricName AS metric_name,
       |    CAST(Scale AS INT) AS scale, ZeroCount AS zc,
       |    CAST(PositiveOffset AS BIGINT) AS pos_off,
       |    PositiveBucketCounts AS pbc,
       |    CAST(ZeroCount + coalesce(list_aggregate(PositiveBucketCounts, 'sum'), 0)
       |      + coalesce(list_aggregate(NegativeBucketCounts, 'sum'), 0) AS BIGINT) AS total_count
       |  FROM read_parquet('$GoldenDir/metrics_exponential_histogram.parquet')
       |), idx AS (
       |  SELECT *, CAST(coalesce(
       |    list_filter(generate_series(0, len(pbc)),
       |      i -> 20*(zc + coalesce(list_aggregate(pbc[1:i], 'sum'), 0))
       |           >= 19*total_count)[1],
       |    -1) AS BIGINT) AS p95_idx
       |  FROM b
       |)
       |SELECT ts_us, metric_name, scale, total_count, p95_idx,
       |  CASE WHEN p95_idx > 0 THEN pos_off + p95_idx
       |       ELSE NULL END AS p95_log2_scaled
       |FROM idx ORDER BY ts_us, metric_name, total_count""".stripMargin

  def goldenTraceLogJoinOracleSql: String =
    s"""WITH l AS (
       |  SELECT lower(hex(TraceId)) AS trace_hex, count(*) AS n_logs
       |  FROM read_parquet('$GoldenDir/logs.parquet')
       |  WHERE hex(TraceId) <> repeat('0', 32)
       |  GROUP BY 1
       |), t AS (
       |  SELECT TraceId AS trace_hex, count(DISTINCT SpanId) AS n_spans
       |  FROM read_parquet('$GoldenDir/traces.parquet')
       |  GROUP BY 1
       |)
       |SELECT l.trace_hex, l.n_logs, t.n_spans
       |FROM l JOIN t USING (trace_hex)
       |ORDER BY trace_hex""".stripMargin

  // ---- materialized synthetic corpora (derive once, scan per gate) --------

  /** The span forest as a TABLE: [[graft.TestDataGen.spanTrees]] written
    * once per (JVM, n) and read back per gate (the
    * [[Graph.backboneTable]] memo pattern), so the six span-forest gates
    * exercise the parquet scan path exactly like production instead of
    * regenerating the corpus in-plan — and the repeated generation cost
    * leaves the bench. The corpus is a deterministic function of `n`, so
    * the oracle CTEs (which regenerate it) stay hash-identical. */
  private def spanForest(spark: SparkSession, n: Long): DataFrame =
    spark.read.parquet(
      MemoTables.dir(s"spanforest|$n", "graft-spanforest") { dir =>
        graft.TestDataGen.spanTrees(spark, n).write.mode("overwrite").parquet(dir)
      })

  /** [[graft.TestDataGen.histograms]] materialized the same way for the
    * merge/rebucket rollup gates. */
  private def histCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.read.parquet(
      MemoTables.dir(s"histcorpus|$n", "graft-histcorpus") { dir =>
        graft.TestDataGen.histograms(spark, n).write.mode("overwrite").parquet(dir)
      })

  /** [[graft.TestDataGen.expHistograms]] materialized the same way. */
  private def expHistCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.read.parquet(
      MemoTables.dir(s"exphistcorpus|$n", "graft-exphistcorpus") { dir =>
        graft.TestDataGen.expHistograms(spark, n).write.mode("overwrite").parquet(dir)
      })

  // ---- critical path over span trees --------------------------------------

  /** Shared depth cap for [[criticalPath]] and its recursive-CTE oracle —
    * same contract as [[TraceMaxDepth]]: both engines stop at the same
    * level, so pathological depth cannot silently diverge the gate. */
  val CriticalPathMaxDepth = 64

  /** Per-trace CRITICAL PATH — the root→leaf chain with the largest summed
    * `Duration` (the span a latency investigation should open first; the
    * reference materializes the parent link for exactly this navigation,
    * `/root/reference/docs/reference.md` traces schema `ParentSpanId`).
    * Runs over the generated [[graft.TestDataGen.spanTrees]] corpus (the
    * goldens are single-span traces — no tree to walk; the orphan side of
    * real goldens is covered by `otel_trace_depth`).
    *
    * Spark-first shape: BFS level iteration exactly like [[traceDepth]] —
    * each level is ONE equi-join `(trace_id, parent_idx)=(trace_id,
    * span_idx)` carrying the accumulated `path_ns`, localCheckpoint-ed so
    * the plan does not grow with depth; iterations = actual tree depth
    * (≤4 here, capped at [[CriticalPathMaxDepth]]), NOT a driver loop over
    * rows. The final argmax is one `row_number` window per trace. At 100 TB
    * the joins shuffle on `trace_id` every level — co-partitioned after the
    * first exchange, and AQE coalesces the tail levels as frontiers
    * shrink. */
  def criticalPath(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pin the corpus scan: the level loop reads `spans` once per BFS level
    // plus the root filter and the n_spans aggregate — six parquet
    // re-scans after the round-9 table materialization (measured 0.59 →
    // 1.30 s in the bench); one eager materialization restores the
    // scan-once shape the in-plan generator used to give for free
    val spans = spanForest(spark, n).localCheckpoint(true)
    def level(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      c.sparkSession.createDataFrame(c.rdd, c.schema)
    }
    var frontier = level(spans.filter(col("parent_idx").isNull)
      .select(col("trace_id"), col("span_idx"), col("span_name"),
        lit(1L).as("depth"), col("duration_ns").as("path_ns")))
    var reached = frontier
    var d = 1
    while (d < CriticalPathMaxDepth && !frontier.isEmpty) {
      frontier = level(spans.as("s").join(frontier.as("f"),
          col("s.trace_id") === col("f.trace_id") &&
            col("s.parent_idx") === col("f.span_idx"))
        .select(col("s.trace_id").as("trace_id"),
          col("s.span_idx").as("span_idx"), col("s.span_name").as("span_name"),
          (col("f.depth") + 1L).as("depth"),
          (col("f.path_ns") + col("s.duration_ns")).as("path_ns")))
      reached = reached.union(frontier)
      d += 1
    }
    val w = Window.partitionBy(col("trace_id"))
      .orderBy(col("path_ns").desc, col("span_idx"))
    val nSpans = spans.groupBy(col("trace_id")).agg(count(lit(1)).as("n_spans"))
    reached.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(nSpans, Seq("trace_id"))
      .select(col("trace_id"), col("n_spans"), col("path_ns").as("crit_ns"),
        col("span_name").as("crit_name"), col("depth").as("crit_depth"),
        col("span_idx").as("crit_leaf_idx"))
      .orderBy(col("trace_id"))
  }

  /** DuckDB twin of [[criticalPath]]: shared generation CTE + recursive
    * path accumulation with the identical depth cap and argmax tiebreak. */
  def criticalPathOracleSql(n: Long = 2000L): String =
    s"""WITH RECURSIVE ${graft.TestDataGen.spanTreesSqlCte(n)},
       |p AS (
       |  SELECT trace_id, span_idx, span_name, CAST(1 AS BIGINT) AS depth,
       |    duration_ns AS path_ns
       |  FROM spant WHERE parent_idx IS NULL
       |  UNION ALL
       |  SELECT s.trace_id, s.span_idx, s.span_name, p.depth + 1,
       |    p.path_ns + s.duration_ns
       |  FROM spant s JOIN p
       |    ON s.trace_id = p.trace_id AND s.parent_idx = p.span_idx
       |  WHERE p.depth < $CriticalPathMaxDepth
       |), best AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY trace_id ORDER BY path_ns DESC, span_idx) AS rn
       |  FROM p
       |), ns AS (
       |  SELECT trace_id, count(*) AS n_spans FROM spant GROUP BY 1
       |)
       |SELECT b.trace_id, ns.n_spans, b.path_ns AS crit_ns,
       |  b.span_name AS crit_name, b.depth AS crit_depth,
       |  b.span_idx AS crit_leaf_idx
       |FROM best b JOIN ns ON b.trace_id = ns.trace_id
       |WHERE b.rn = 1
       |ORDER BY b.trace_id""".stripMargin

  /** Per-OPERATION duration percentiles over the generated span-tree
    * corpus — "which span name is slow at p95", the per-operation latency
    * breakdown a trace UI puts next to [[criticalPath]]. Same discrete
    * integer-threshold percentile rule as `q_percentile_ts`, partitioned
    * by span name (7 operations here; thousands at fleet scale — still
    * embarrassingly parallel across names). */
  def spanDurationPct(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = spanForest(spark, n)
      .select(col("span_name"), col("trace_id"), col("span_idx"),
        col("duration_ns"))
    val w = Window.partitionBy(col("span_name"))
      .orderBy(col("duration_ns"), col("trace_id"), col("span_idx"))
    spans.withColumn("rn", row_number().over(w))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("span_name"))))
      .groupBy(col("span_name"))
      .agg(max(col("cnt")).as("n_spans"),
        min(col("duration_ns")).as("min_ns"),
        min(when(col("rn") * 2 >= col("cnt"), col("duration_ns"))).as("p50_ns"),
        min(when(col("rn") * 20 >= col("cnt") * 19, col("duration_ns"))).as("p95_ns"),
        max(col("duration_ns")).as("max_ns"))
      .orderBy(col("span_name"))
  }

  /** DuckDB twin of [[spanDurationPct]] — shared generator CTE, identical
    * threshold rule and tiebreaks. */
  def spanDurationPctOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |r AS (
       |  SELECT span_name, duration_ns,
       |    row_number() OVER (PARTITION BY span_name
       |      ORDER BY duration_ns, trace_id, span_idx) AS rn,
       |    count(*) OVER (PARTITION BY span_name) AS cnt
       |  FROM spant
       |)
       |SELECT span_name, CAST(max(cnt) AS BIGINT) AS n_spans,
       |  min(duration_ns) AS min_ns,
       |  min(CASE WHEN rn * 2 >= cnt THEN duration_ns END) AS p50_ns,
       |  min(CASE WHEN rn * 20 >= cnt * 19 THEN duration_ns END) AS p95_ns,
       |  max(duration_ns) AS max_ns
       |FROM r GROUP BY 1 ORDER BY span_name""".stripMargin

  // ---- log template mining ------------------------------------------------

  /** Token-mask rule shared by [[goldenLogTemplates]] and its oracle: any
    * alphanumeric run containing at least one digit collapses to `<*>` —
    * the Drain-style first pass that turns ids, counts, timestamps, and
    * hex tokens into wildcards while leaving pure words intact. One regex,
    * no alternation, so Java (Spark) and RE2 (DuckDB) agree on every
    * match: both take the maximal alnum run at the leftmost position whose
    * run contains a digit. */
  val LogTemplateMaskRegex = "[A-Za-z0-9]*[0-9][A-Za-z0-9]*"

  /** Per-service ERROR-RATE vs a 1% SLO over the golden logs — the
    * alert/burn arithmetic of docs/querying.md's severity queries, with
    * the breach decision INTEGER-EXACT (`100·n_errors > n_logs` — no FP
    * comparison at the policy boundary) and the displayed rate portably
    * rounded. One map-side-combined conditional aggregate. */
  def goldenErrorRateSlo(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/logs.parquet")
      .groupBy(col("ServiceName"))
      .agg(count(lit(1)).as("n_logs"),
        sum(when(col("SeverityText").isin("ERROR", "FATAL"), 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("ServiceName"), col("n_logs"), col("n_errors"),
        graft.operators.Tables.portableRound6(
          col("n_errors").cast("double") / col("n_logs").cast("double"))
          .as("err_rate"),
        (col("n_errors") * 100 > col("n_logs")).as("slo_breach"))
      .orderBy(col("ServiceName"))

  /** DuckDB twin of [[goldenErrorRateSlo]]. */
  def goldenErrorRateSloOracleSql: String =
    s"""WITH a AS (
       |  SELECT ServiceName, count(*) AS n_logs,
       |    CAST(sum(CASE WHEN SeverityText IN ('ERROR', 'FATAL') THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
       |  FROM read_parquet('$GoldenDir/logs.parquet')
       |  GROUP BY 1
       |)
       |SELECT ServiceName, n_logs, n_errors,
       |  ${graft.operators.Tables.portableRound6Sql(
           "CAST(n_errors AS DOUBLE) / CAST(n_logs AS DOUBLE)")} AS err_rate,
       |  n_errors * 100 > n_logs AS slo_breach
       |FROM a ORDER BY ServiceName""".stripMargin

  /** Log TEMPLATE mining over the golden logs — the log-clustering first
    * step of every observability pipeline (group the firehose by message
    * shape, not raw body): mask digit-bearing tokens, then count bodies
    * per (service, template) with a deterministic example (min Body).
    *
    * Scale shape: one narrow regex projection + one map-side-combined
    * count whose key space is the template vocabulary (thousands at fleet
    * scale, not row-scale) — the same shape as `text_top_terms`. */
  def goldenLogTemplates(spark: SparkSession, sfDirIgnored: String): DataFrame =
    spark.read.parquet(s"$GoldenDir/logs.parquet")
      .withColumn("template",
        regexp_replace(col("Body"), LogTemplateMaskRegex, "<*>"))
      .groupBy(col("ServiceName"), col("template"))
      .agg(count(lit(1)).as("n"), min(col("Body")).as("example"))
      .orderBy(col("ServiceName"), col("n").desc, col("template"))

  /** DuckDB twin of [[goldenLogTemplates]] (global-replace flag spelled
    * explicitly — DuckDB replaces first-only by default). */
  def goldenLogTemplatesOracleSql: String =
    s"""SELECT ServiceName,
       |  regexp_replace(Body, '$LogTemplateMaskRegex', '<*>', 'g') AS template,
       |  count(*) AS n, min(Body) AS example
       |FROM read_parquet('$GoldenDir/logs.parquet')
       |GROUP BY 1, 2
       |ORDER BY ServiceName, n DESC, template""".stripMargin

  // ---- service graph / tail sampling / RED over span forests --------------

  /** Deterministic per-span service + error enrichment shared by
    * [[serviceGraph]] / [[tailSampling]] / [[redMetrics]] and their oracle
    * CTEs — the [[graft.TestDataGen.spanTrees]] corpus carries no service
    * column (the goldens are single-span traces, no call edges at all), so
    * the three gates derive one with pure integer congruences both engines
    * compute bit-identically: 6 services keyed by `(trace_id + 5·span_idx)
    * mod 6`, an error flag on `(13·trace_id + 7·span_idx) mod 37 = 0`
    * (~2.7% of spans), and an hour-of-day on `(7·trace_id + span_idx) mod
    * 24`. Production swaps this projection for the real `ServiceName` /
    * `StatusCode` / `Timestamp` columns — the aggregation shapes are
    * unchanged. */
  private def enrichedSpans(spark: SparkSession, n: Long): DataFrame =
    spanForest(spark, n)
      .withColumn("svc",
        concat(lit("svc-"), (col("trace_id") + col("span_idx") * 5) % 6))
      .withColumn("is_err",
        (col("trace_id") * 13 + col("span_idx") * 7) % 37 === 0)
      .withColumn("hour", (col("trace_id") * 7 + col("span_idx")) % 24)

  /** The shared enrichment as a DuckDB CTE over `spant` (which
    * [[graft.TestDataGen.spanTreesSqlCte]] must define first). */
  private def enrichedSpansSqlCte: String =
    """espan AS (
      |  SELECT trace_id, span_idx, parent_idx, span_name, duration_ns,
      |    'svc-' || CAST((trace_id + span_idx * 5) % 6 AS VARCHAR) AS svc,
      |    (trace_id * 13 + span_idx * 7) % 37 = 0 AS is_err,
      |    (trace_id * 7 + span_idx) % 24 AS hour
      |  FROM spant
      |)""".stripMargin

  /** SERVICE DEPENDENCY GRAPH — the caller→callee edge list every tracing
    * backend derives from the `ParentSpanId` linkage (the reference
    * materializes exactly that column for this navigation,
    * `/root/reference/docs/reference.md` traces schema): one row per
    * (parent service, child service) pair with call count, distinct
    * traces, callee error count/rate, and exact mean callee latency.
    *
    * Spark-first shape: ONE self-equi-join of the span table with itself
    * on `(trace_id, parent_idx)=(trace_id, span_idx)` — both sides shuffle
    * on `trace_id`, so at fleet scale a span table pre-partitioned (or
    * bucketed) by `trace_id` makes the join co-located and exchange-free —
    * then a map-side-combined aggregate whose key space is |services|²
    * (dozens², never row-scale). No window, no iteration: unlike
    * [[traceDepth]]/[[criticalPath]] the service graph only needs ONE
    * parent hop, so it stays a single join at any depth. */
  def serviceGraph(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    val spans = enrichedSpans(spark, n)
    val child = spans.filter(col("parent_idx").isNotNull)
      .select(col("trace_id").as("c_trace_id"), col("parent_idx"),
        col("svc").as("child_svc"), col("is_err").as("child_err"),
        col("duration_ns"))
    val parent = spans.select(col("trace_id").as("p_trace_id"),
      col("span_idx"), col("svc").as("parent_svc"))
    child.join(parent,
        col("c_trace_id") === col("p_trace_id") &&
          col("parent_idx") === col("span_idx"))
      .groupBy(col("parent_svc"), col("child_svc"))
      .agg(count(lit(1)).as("n_calls"),
        countDistinct(col("c_trace_id")).as("n_traces"),
        sum(when(col("child_err"), 1L).otherwise(0L)).as("n_errors"),
        Tables.exactAvg(col("duration_ns").cast("double")).as("avg_child_ns"))
      .withColumn("err_rate", Tables.portableRound6(
        col("n_errors").cast("double") / col("n_calls").cast("double")))
      .orderBy(col("parent_svc"), col("child_svc"))
  }

  /** DuckDB twin of [[serviceGraph]] — shared generator + enrichment CTEs,
    * identical join keys and portable rounding. */
  def serviceGraphOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |$enrichedSpansSqlCte,
       |e AS (
       |  SELECT p.svc AS parent_svc, c.svc AS child_svc,
       |    c.trace_id, c.is_err AS child_err, c.duration_ns
       |  FROM espan c JOIN espan p
       |    ON c.trace_id = p.trace_id AND c.parent_idx = p.span_idx
       |  WHERE c.parent_idx IS NOT NULL
       |)
       |SELECT parent_svc, child_svc, count(*) AS n_calls,
       |  count(DISTINCT trace_id) AS n_traces,
       |  CAST(sum(CASE WHEN child_err THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       |  ${Tables.exactAvgSql("duration_ns")} AS avg_child_ns,
       |  ${Tables.portableRound6Sql(
            "CAST(sum(CASE WHEN child_err THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")}
       |    AS err_rate
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Latency threshold (ns) for [[tailSampling]]'s `latency` policy —
    * shared with the oracle so both engines apply the identical cut. */
  val TailSamplingSlowNs = 22000L

  /** TAIL-BASED TRACE SAMPLING decision — the keep/drop verdict an OTel
    * tail-sampling processor computes once a trace is complete: keep every
    * errored trace, keep every slow trace (total duration ≥
    * [[TailSamplingSlowNs]]), and keep a deterministic 5% of the
    * remainder, labeled by WHICH policy fired (first match wins:
    * error > latency > probabilistic). Dropped traces produce no row.
    *
    * The probabilistic arm here is a plain `trace_id mod 20` congruence —
    * deterministic and oracle-portable; production substitutes a salted
    * hash of the trace id (same shape, still one integer test per trace).
    *
    * Scale shape: one groupBy(trace_id) — map-side-combined sums/bool_or,
    * shuffle keyed on the 16-byte trace id, then pure per-row policy
    * arithmetic. Nothing global: the decision for each trace never sees
    * another trace. */
  def tailSampling(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame =
    enrichedSpans(spark, n)
      .groupBy(col("trace_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("duration_ns")).as("total_ns"),
        max(when(col("is_err"), 1L).otherwise(0L)).as("err_flag"))
      .withColumn("has_error", col("err_flag") === 1L)
      .withColumn("policy",
        when(col("has_error"), "error")
          .when(col("total_ns") >= TailSamplingSlowNs, "latency")
          .when(col("trace_id") % 20 === 0, "probabilistic"))
      .filter(col("policy").isNotNull)
      .select(col("trace_id"), col("n_spans"), col("total_ns"),
        col("has_error"), col("policy"))
      .orderBy(col("trace_id"))

  /** DuckDB twin of [[tailSampling]] — same policy order and threshold. */
  def tailSamplingOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |$enrichedSpansSqlCte,
       |t AS (
       |  SELECT trace_id, count(*) AS n_spans,
       |    CAST(sum(duration_ns) AS BIGINT) AS total_ns,
       |    bool_or(is_err) AS has_error
       |  FROM espan GROUP BY 1
       |)
       |SELECT trace_id, n_spans, total_ns, has_error,
       |  CASE WHEN has_error THEN 'error'
       |       WHEN total_ns >= $TailSamplingSlowNs THEN 'latency'
       |       WHEN trace_id % 20 = 0 THEN 'probabilistic' END AS policy
       |FROM t
       |WHERE has_error OR total_ns >= $TailSamplingSlowNs OR trace_id % 20 = 0
       |ORDER BY trace_id""".stripMargin

  /** RED METRICS (Rate, Errors, Duration) per service per hour-of-day —
    * the standard service-health rollup every observability stack derives
    * from spans: request count, error count + portably-rounded error
    * rate, and EXACT p50/p95 latency via the same integer-threshold
    * discrete-percentile rule as [[spanDurationPct]]/`q_percentile_ts`.
    *
    * Scale shape: the rank window is partitioned by (svc, hour) — 144
    * groups here, |services|·24 at fleet scale — never an empty-key
    * window, so no SinglePartition exchange (the scale-killer class
    * PlanSpec guards against); then one map-side-combined aggregate per
    * group. At 100 TB the percentile arm would swap to the `q_equi_depth`
    * sketch; this exact form is its reference, same as
    * `text_quality_ntile`. */
  def redMetrics(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = enrichedSpans(spark, n)
      .select(col("svc"), col("hour"), col("trace_id"), col("span_idx"),
        col("is_err"), col("duration_ns"))
    val w = Window.partitionBy(col("svc"), col("hour"))
      .orderBy(col("duration_ns"), col("trace_id"), col("span_idx"))
    spans.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1))
        .over(Window.partitionBy(col("svc"), col("hour"))))
      .groupBy(col("svc"), col("hour"))
      .agg(max(col("cnt")).as("n_calls"),
        sum(when(col("is_err"), 1L).otherwise(0L)).as("n_errors"),
        min(when(col("rn") * 2 >= col("cnt"), col("duration_ns"))).as("p50_ns"),
        min(when(col("rn") * 20 >= col("cnt") * 19, col("duration_ns"))).as("p95_ns"),
        Tables.exactAvg(col("duration_ns").cast("double")).as("avg_ns"))
      .withColumn("err_rate", Tables.portableRound6(
        col("n_errors").cast("double") / col("n_calls").cast("double")))
      .orderBy(col("svc"), col("hour"))
  }

  /** Error cut and budget for [[burnRate]] — shared with the oracle and
    * the streaming RED panel's severity rule (`value ≥ 250`). */
  val BurnErrValue = 250.0
  /** Alert when the error rate exceeds 2× a 1% SLO budget, i.e. 20000 ppm,
    * on BOTH windows. */
  val BurnAlertPpm = 20000L

  /** SLO BURN-RATE ALERTS — the multiwindow, multi-burn-rate rule an SRE
    * error budget policy pages on (short window confirms the burn is
    * CURRENT, long window that it is SUSTAINED): per 1-hour bucket, the
    * error rate in ppm over that hour AND over its enclosing 6-hour
    * block, with `alert` set when both exceed [[BurnAlertPpm]] (2× a 1%
    * budget). All integer arithmetic — `errs·10⁶ div n` — so the gate is
    * hash-exact on both engines.
    *
    * Scale shape: two map-side-combined aggregates (hour key, 6-hour
    * key) and one equi-join of hour rows onto the 36× smaller block
    * frame — key spaces scale with TIME SPAN, not event volume. The
    * tumbling-block form of the sliding-window policy: at fleet scale the
    * same two aggregates run per (service, hour), and a sliding long
    * window would swap the block join for a range join over block
    * aggregates (still never row-scale). */
  def burnRate(spark: SparkSession, sfDir: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(expr(s"(unix_micros(ts) div $HourUs) * $HourUs").as("hour_us"),
        when(col("value") >= BurnErrValue, 1L).otherwise(0L).as("is_err"))
    val hours = ev.groupBy(col("hour_us"))
      .agg(count(lit(1)).as("n_1h"), sum(col("is_err")).as("err_1h"))
      .withColumn("err_ppm_1h", expr("err_1h * 1000000L div n_1h"))
      .withColumn("block_us", expr(s"(hour_us div ${6 * HourUs}) * ${6 * HourUs}"))
    val blocks = ev
      .groupBy(expr(s"(hour_us div ${6 * HourUs}) * ${6 * HourUs}").as("block_us"))
      .agg(count(lit(1)).as("n_6h"), sum(col("is_err")).as("err_6h"))
      .withColumn("err_ppm_6h", expr("err_6h * 1000000L div n_6h"))
    hours.join(blocks, Seq("block_us"))
      .select(col("hour_us"), col("n_1h"), col("err_1h"), col("err_ppm_1h"),
        col("err_ppm_6h"),
        (col("err_ppm_1h") > BurnAlertPpm && col("err_ppm_6h") > BurnAlertPpm)
          .as("alert"))
      .orderBy(col("hour_us"))
  }

  /** DuckDB twin of [[burnRate]] — identical integer ppm and block rule. */
  def burnRateOracleSql: String = {
    val h = 3600000000L
    s"""WITH e AS (
       |  SELECT (epoch_us(ts) // $h) * $h AS hour_us,
       |    CASE WHEN value >= $BurnErrValue THEN 1 ELSE 0 END AS is_err
       |  FROM events
       |), hours AS (
       |  SELECT hour_us, count(*) AS n_1h, CAST(sum(is_err) AS BIGINT) AS err_1h,
       |    CAST(sum(is_err) * 1000000 // count(*) AS BIGINT) AS err_ppm_1h,
       |    (hour_us // ${6 * h}) * ${6 * h} AS block_us
       |  FROM e GROUP BY hour_us
       |), blocks AS (
       |  SELECT (hour_us // ${6 * h}) * ${6 * h} AS block_us,
       |    CAST(sum(is_err) * 1000000 // count(*) AS BIGINT) AS err_ppm_6h
       |  FROM e GROUP BY 1
       |)
       |SELECT h.hour_us, h.n_1h, h.err_1h, h.err_ppm_1h, b.err_ppm_6h,
       |  h.err_ppm_1h > $BurnAlertPpm AND b.err_ppm_6h > $BurnAlertPpm AS alert
       |FROM hours h JOIN blocks b USING (block_us)
       |ORDER BY h.hour_us""".stripMargin
  }

  /** Satisfied threshold T for [[apdex]] (ns of total trace duration);
    * the tolerating bound is the standard 4T. */
  val ApdexTNs = 4000L

  /** APDEX SCORE per root service — the standard user-satisfaction index
    * ((satisfied + tolerating/2) / total with tolerating = (T, 4T]) that
    * every APM product reports, computed over TRACE duration (the
    * user-perceived transaction time, i.e. the sum of the trace's span
    * durations in this corpus) and attributed to the trace's ROOT span's
    * service. Emitted in ppm via `(2·sat + tol)·500000 div n` — pure
    * integer arithmetic, hash-exact on both engines.
    *
    * Scale shape: one map-side-combined aggregate keyed by `trace_id`
    * (the same co-partitioning every other trace-level gate shuffles on —
    * a span table bucketed by trace_id makes it exchange-free), then a
    * second aggregate over |services| keys. The root-service attribution
    * is a projection, not a join: the root's service is a function of
    * `trace_id` alone in this corpus; production would broadcast-join the
    * |traces|-keyed root frame or carry the root service denormalized on
    * every span (the reference's flat span table carries ServiceName per
    * row already — /root/reference/docs/reference.md traces schema). */
  def apdex(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    val t = ApdexTNs
    spanForest(spark, n)
      .groupBy(col("trace_id"))
      .agg(sum(col("duration_ns")).as("total_ns"))
      .withColumn("root_svc", concat(lit("svc-"), col("trace_id") % 6))
      .groupBy(col("root_svc"))
      .agg(count(lit(1)).as("n_traces"),
        sum(when(col("total_ns") <= t, 1L).otherwise(0L)).as("n_satisfied"),
        sum(when(col("total_ns") > t && col("total_ns") <= t * 4, 1L)
          .otherwise(0L)).as("n_tolerating"),
        sum(when(col("total_ns") > t * 4, 1L).otherwise(0L)).as("n_frustrated"))
      .withColumn("apdex_ppm",
        expr("(2 * n_satisfied + n_tolerating) * 500000 div n_traces"))
      .orderBy(col("root_svc"))
  }

  /** DuckDB twin of [[apdex]] — identical T/4T classes and integer ppm. */
  def apdexOracleSql(n: Long = 2000L): String = {
    val t = ApdexTNs
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |tr AS (
       |  SELECT trace_id, CAST(sum(duration_ns) AS BIGINT) AS total_ns
       |  FROM spant GROUP BY 1
       |)
       |SELECT 'svc-' || CAST(trace_id % 6 AS VARCHAR) AS root_svc,
       |  count(*) AS n_traces,
       |  CAST(sum(CASE WHEN total_ns <= $t THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
       |  CAST(sum(CASE WHEN total_ns > $t AND total_ns <= ${t * 4} THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
       |  CAST(sum(CASE WHEN total_ns > ${t * 4} THEN 1 ELSE 0 END) AS BIGINT) AS n_frustrated,
       |  (2 * CAST(sum(CASE WHEN total_ns <= $t THEN 1 ELSE 0 END) AS BIGINT)
       |     + CAST(sum(CASE WHEN total_ns > $t AND total_ns <= ${t * 4} THEN 1 ELSE 0 END) AS BIGINT))
       |    * 500000 // count(*) AS apdex_ppm
       |FROM tr GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB twin of [[redMetrics]] — identical threshold rule, tiebreaks,
    * and portable rounding. */
  def redMetricsOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |$enrichedSpansSqlCte,
       |r AS (
       |  SELECT svc, hour, is_err, duration_ns,
       |    row_number() OVER (PARTITION BY svc, hour
       |      ORDER BY duration_ns, trace_id, span_idx) AS rn,
       |    count(*) OVER (PARTITION BY svc, hour) AS cnt
       |  FROM espan
       |)
       |SELECT svc, hour, CAST(max(cnt) AS BIGINT) AS n_calls,
       |  CAST(sum(CASE WHEN is_err THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       |  min(CASE WHEN rn * 2 >= cnt THEN duration_ns END) AS p50_ns,
       |  min(CASE WHEN rn * 20 >= cnt * 19 THEN duration_ns END) AS p95_ns,
       |  ${Tables.exactAvgSql("duration_ns")} AS avg_ns,
       |  ${Tables.portableRound6Sql(
            "CAST(sum(CASE WHEN is_err THEN 1 ELSE 0 END) AS DOUBLE) / max(cnt)")}
       |    AS err_rate
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- error root-cause attribution ---------------------------------------

  /** Heap depth of `span_idx` in the binary-heap layout of
    * [[graft.TestDataGen.spanTrees]] (indices 0..14 → depths 0..3), shared
    * verbatim with the oracle so attribution tie-breaks agree bit-for-bit. */
  private val SpanDepthCaseSql: String =
    "CASE WHEN span_idx = 0 THEN 0 WHEN span_idx <= 2 THEN 1 " +
      "WHEN span_idx <= 6 THEN 2 ELSE 3 END"

  /** ERROR ROOT-CAUSE ATTRIBUTION — for every trace containing at least one
    * error span, attribute the trace to its DEEPEST erroring span (ties →
    * larger span_idx): the span an on-call engineer should open first,
    * because in a propagating failure the deepest error is the origin and
    * the ancestors' errors are echoes. Aggregated per (service, span_name)
    * with the trace count, the total error-span count those traces carried
    * (echo volume), and the attributed spans' summed duration.
    *
    * Spark-first shape: one filter to the ~2.7% error subset, ONE
    * `trace_id`-keyed window picking the argmax span (row_number over
    * (depth, span_idx) desc — never empty-key; co-partitioned with every
    * other trace-level gate, exchange-free on a trace-bucketed table), then
    * a map-side-combined aggregate over |services|·|ops| keys. At 100 TB
    * the window input is only the error subset — the filter cuts 97% of
    * rows before the shuffle. */
  def errorRootCause(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val errs = enrichedSpans(spark, n)
      .filter(col("is_err"))
      .withColumn("depth", expr(SpanDepthCaseSql))
    val w = Window.partitionBy(col("trace_id"))
      .orderBy(col("depth").desc, col("span_idx").desc)
    val wAll = Window.partitionBy(col("trace_id"))
    errs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_err", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .groupBy(col("svc"), col("span_name"))
      .agg(count(lit(1)).as("n_traces"),
        sum(col("n_err")).as("n_err_spans"),
        sum(col("duration_ns")).as("dur_ns_total"),
        sum(col("depth").cast("long")).as("depth_total"))
      .orderBy(col("svc"), col("span_name"))
  }

  /** DuckDB twin of [[errorRootCause]] — identical error rule, shared depth
    * CASE, and the same argmax tie-break. */
  def errorRootCauseOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |$enrichedSpansSqlCte,
       |e AS (
       |  SELECT *, $SpanDepthCaseSql AS depth FROM espan WHERE is_err
       |), r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY trace_id
       |      ORDER BY depth DESC, span_idx DESC) AS rn,
       |    count(*) OVER (PARTITION BY trace_id) AS n_err
       |  FROM e
       |)
       |SELECT svc, span_name, count(*) AS n_traces,
       |  CAST(sum(n_err) AS BIGINT) AS n_err_spans,
       |  CAST(sum(duration_ns) AS BIGINT) AS dur_ns_total,
       |  CAST(sum(depth) AS BIGINT) AS depth_total
       |FROM r WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- self-time (exclusive duration) -------------------------------------

  /** SELF-TIME per operation — the flamegraph "exclusive" metric: each
    * span's duration minus the summed durations of its DIRECT children,
    * aggregated per span_name (which op burns its own CPU vs merely waits
    * on callees — the first column a profiler shows). In this synthetic
    * corpus durations are independent draws, so per-span self time may be
    * negative (children "overlap" the parent); the SUM is still the
    * operator's exact exclusive-vs-inclusive algebra, and real nested
    * corpora make it non-negative. Emitted per span_name with inclusive
    * total, child total, self total, and the integer-ppm self share.
    *
    * Spark-first shape: ONE aggregation of children keyed by (trace_id,
    * parent_idx) + ONE left join back on (trace_id, span_idx) — the same
    * trace-co-partitioned single-hop join as [[serviceGraph]]; a
    * trace-bucketed table makes both exchange-free. Final key space is
    * |ops|, map-side combined. */
  def selfTime(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L): DataFrame = {
    val spans = spanForest(spark, n)
    val childSums = spans.filter(col("parent_idx").isNotNull)
      .groupBy(col("trace_id"), col("parent_idx"))
      .agg(sum(col("duration_ns")).as("child_ns"))
    spans.as("s")
      .join(childSums.as("c"),
        col("s.trace_id") === col("c.trace_id") &&
          col("s.span_idx") === col("c.parent_idx"), "left")
      .select(col("s.span_name").as("span_name"),
        col("s.duration_ns").as("dur_ns"),
        coalesce(col("c.child_ns"), lit(0L)).as("child_ns"))
      .groupBy(col("span_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("dur_ns")).as("incl_ns"),
        sum(col("child_ns")).as("child_ns"),
        sum(col("dur_ns") - col("child_ns")).as("self_ns"))
      .withColumn("self_ppm", expr("(self_ns * 1000000) div incl_ns"))
      .orderBy(col("span_name"))
  }

  /** DuckDB twin of [[selfTime]] — identical child-sum join and integer
    * ppm. */
  def selfTimeOracleSql(n: Long = 2000L): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |cs AS (
       |  SELECT trace_id, parent_idx, CAST(sum(duration_ns) AS BIGINT) AS child_ns
       |  FROM spant WHERE parent_idx IS NOT NULL GROUP BY 1, 2
       |), j AS (
       |  SELECT s.span_name, s.duration_ns AS dur_ns,
       |    COALESCE(cs.child_ns, 0) AS child_ns
       |  FROM spant s LEFT JOIN cs
       |    ON s.trace_id = cs.trace_id AND s.span_idx = cs.parent_idx
       |)
       |SELECT span_name, count(*) AS n_spans,
       |  CAST(sum(dur_ns) AS BIGINT) AS incl_ns,
       |  CAST(sum(child_ns) AS BIGINT) AS child_ns,
       |  CAST(sum(dur_ns - child_ns) AS BIGINT) AS self_ns,
       |  CAST(sum(dur_ns - child_ns) AS BIGINT) * 1000000
       |    // CAST(sum(dur_ns) AS BIGINT) AS self_ppm
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- exemplars ------------------------------------------------------------

  /** EXEMPLAR SELECTION per operation — the metrics→traces link OTLP
    * exemplars exist for (`/root/reference/docs/reference.md` metrics
    * schema carries exemplar arrays): for each span_name, the 3 SLOWEST
    * spans with their trace ids, so a latency dashboard's p99 panel can
    * deep-link straight into representative traces. Deterministic
    * tie-break (duration desc, trace_id, span_idx) makes the selection
    * hash-exact; [[goldenSlowSpans]] is the global-top-k sibling — this is
    * the PER-GROUP form a per-op dashboard needs.
    *
    * Spark-first shape: one span_name-keyed rank window (|ops| keys, never
    * empty-key). At fleet scale the window input can be pre-pruned by a
    * per-partition top-k (the TakeOrderedAndProject trick per group via
    * groupBy + slice aggregation) — at this corpus the single window IS
    * the plan a 100 TB job would run per (op, hour) partition. */
  def exemplars(spark: SparkSession, sfDirIgnored: String,
      n: Long = 2000L, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("span_name"))
      .orderBy(col("duration_ns").desc, col("trace_id"), col("span_idx"))
    spanForest(spark, n)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("span_name"), col("rk"), col("trace_id"),
        col("span_idx"), col("duration_ns"))
      .orderBy(col("span_name"), col("rk"))
  }

  /** DuckDB twin of [[exemplars]] — identical tie-break. */
  def exemplarsOracleSql(n: Long = 2000L, k: Int = 3): String =
    s"""WITH ${graft.TestDataGen.spanTreesSqlCte(n)},
       |r AS (
       |  SELECT span_name, trace_id, span_idx, duration_ns,
       |    row_number() OVER (PARTITION BY span_name
       |      ORDER BY duration_ns DESC, trace_id, span_idx) AS rk
       |  FROM spant
       |)
       |SELECT span_name, CAST(rk AS BIGINT) AS rk, trace_id, span_idx,
       |  duration_ns
       |FROM r WHERE rk <= $k ORDER BY span_name, rk""".stripMargin
}
