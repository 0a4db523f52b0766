package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** The reference's documented query surface (SURVEY §2.4,
  * /root/reference/docs/querying.md) re-expressed over the driver's synthetic
  * tables. `events` (ts / event_type / value / user_id / props) plays the role
  * of the telemetry table; the TPC-H-ish star schema exercises the join/agg
  * shapes at benchmarkable scale.
  *
  * Scale design notes (target: 1000-executor cluster, 100 TB):
  *   - filters and projections sit directly on the parquet scan so Catalyst
  *     pushes them down (verify via `.explain`: PushedFilters / ReadSchema);
  *   - dimension tables (nation/region/customer at these SFs) are explicitly
  *     `broadcast()` so the big fact-table side never shuffles for the join;
  *   - top-k is orderBy+limit, which Spark plans as TakeOrderedAndProject
  *     (per-partition heap + driver merge of k rows — no global sort);
  *   - group-bys are partial-aggregated map-side before the single shuffle.
  */
object QuerySurface {

  /** q-scan-project: scan + projection + deterministic LIMIT
    * (docs/querying.md:11-16). The ORDER BY on the unique key makes LIMIT
    * reproducible; Spark plans it as TakeOrderedAndProject. */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .limit(100)

  /** q-filter-time: time-range predicate, pushed to the parquet scan
    * (docs/querying.md:33-37) — see [[Tables.eventsTimeRange]] for why the
    * bounds are applied to the physical ns column. Timestamps emitted as
    * epoch µs. */
  def filterTime(spark: SparkSession, sfDir: String): DataFrame =
    eventsTimeRange(spark, sfDir, "2024-01-10T00:00:00Z", "2024-01-11T00:00:00Z")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** q-filter-in: IN-list + numeric predicate (docs/querying.md:52-58). */
  def filterIn(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .filter(col("event_type").isin("error", "purchase") && col("value") > lit(150.0))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** q-topk: order by + limit (docs/querying.md:63-82). Unique-key tiebreak. */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(25)

  /** q-groupby-count: hash aggregate + sort (docs/querying.md:43-48). */
  def groupByCount(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))

  /** q-time-bucket-agg: date_trunc bucketing + AVG (docs/querying.md:87-95).
    * Day buckets; exact decimal accumulation (see [[Tables.exactAvg]]). */
  def timeBucketAgg(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), exactAvg(col("value")).as("avg_value"))
      .orderBy(col("day_us"), col("event_type"))

  /** q-scalar-arith: per-row arithmetic projection (docs/querying.md:74-82).
    * Raw double ops are bit-identical across engines given identical
    * association, so no rounding is needed. */
  def scalarArith(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .filter(col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_extendedprice") * col("l_discount")).as("discount_amt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q-join-equi: inner equi-join + group agg (docs/querying.md:110-124).
    * orders ⋈ customer ⋈ nation: the two dimension sides are broadcast so the
    * fact scan never shuffles for the join — only the final group-by does. */
  def joinEqui(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .join(broadcast(customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("total_revenue"))
      .orderBy(col("n_name"))

  /** q-hist-buckets: percentile estimation from histogram bucket counts
    * (docs/querying.md:97-108) — the OTLP-histogram p95 pattern: bucketize,
    * cumulative-sum, first bucket crossing 0.95·total. Fixed bounds
    * 0,50,...,500 mirror ExplicitBounds. */
  def histBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketed = events(spark, sfDir)
      .select(col("event_type"),
        least(floor(col("value") / lit(50.0)), lit(9.0)).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("event_type"))
    bucketed
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wt))
      .filter(col("cum") >= lit(0.95) * col("total"))
      .groupBy(col("event_type"))
      .agg(min(col("bucket")).as("p95_bucket"))
      .withColumn("p95_lower_bound", col("p95_bucket") * lit(50.0))
      .orderBy(col("event_type"))
  }

  /** q-partition-prune: the day-partition pruning pattern
    * (docs/querying.md:154-164) — predicates on year/month/day derived
    * columns; on a partitioned layout these prune directories before the
    * scan. */
  def partitionPrune(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
        dayofmonth(col("ts")) === 15)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  /** q-json-extract: JSON property extraction from the `props` payload column
    * — the LogAttributes/SpanAttributes access pattern (attributes are stored
    * as JSON strings, SURVEY §1.3). */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") >= 90)
      .orderBy(col("event_id"))

  /** q-agg-distinct: distinct-count per hot key. `countDistinct` plans as a
    * two-phase aggregate (partial by (event_type, user_id), then merge) —
    * the skew-safe shape: the heavy first phase spreads over the full
    * composite key space, so 5 hot event_type keys don't bottleneck one
    * reducer. AQE skew-join handles the join-side analog automatically. */
  def aggDistinct(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** q-sessionize: gap-based sessionization of the event stream (30-min
    * inactivity gap) — the canonical windowed pipeline op. One shuffle keyed
    * by user_id; session ids are a running sum over the ordered window
    * (ties broken by event_id so the order is total). */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000000
    events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs ||
          lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q-asof-join (§2.5 gap — Spark has no native AS-OF join operator): for
    * each purchase, the most recent click by the same user at or before it
    * — the classic attribution join. Composed scalably instead of
    * per-row subqueries or a range join: union the two tagged event sets
    * and carry the latest click forward with `last(_, ignoreNulls)` over a
    * per-user ordered window — ONE shuffle keyed by user_id, work linear in
    * events, no candidate-pair explosion regardless of how many clicks
    * precede a purchase. Ties are impossible on this data (µs timestamps,
    * verified no duplicate (user, ts) click pairs); at-equal-ts clicks sort
    * before purchases so the inclusive `click.ts ≤ purchase.ts` semantics
    * match DuckDB's native ASOF JOIN, which the oracle uses. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val tagged = e.filter(col("event_type").isin("click", "purchase"))
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("click_id", when(col("kind") === 0, col("event_id")))
      .withColumn("click_ts", when(col("kind") === 0, col("ts_us")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_click_id").as("click_event_id"),
        col("last_click_ts").as("click_ts_us"),
        (col("ts_us") - col("last_click_ts")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q-range-join (§2.5 gap): clicks within ±`windowUs` of each error event
    * by the same user — the "activity around an incident" band join.
    * Composed as a BUCKETED equi-join: clicks key on
    * `(user_id, ts div W)`, each error replicates to its 3 adjacent buckets,
    * and the band predicate filters after the hash join — every matching
    * pair meets exactly one replicated row (a click's bucket is unique), so
    * no dedup is needed. Spark plans a naive `abs(a.ts−b.ts) ≤ W` condition
    * as a broadcast-nested-loop join (quadratic, OOM at scale); the bucket
    * form is a plain shuffled hash join with 3× replication of the anchor
    * side only. */
  def rangeJoin(spark: SparkSession, sfDir: String,
      windowUs: Long = 5L * 60 * 1000000): DataFrame = {
    val e = events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    // `div` = true integer division: float division + cast would round the
    // double quotient before truncating and can mis-bucket near boundaries
    val clk = e.filter(col("event_type") === "click")
      .select(col("user_id"), expr(s"ts_us div $windowUs").as("bucket"),
        col("ts_us").as("click_ts"))
    val errRep = err.withColumn("b0", expr(s"ts_us div $windowUs"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    val matched = errRep.join(clk, Seq("user_id", "bucket"))
      .filter(abs(col("ts_us") - col("click_ts")) <= windowUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_near_clicks"),
        min(abs(col("ts_us") - col("click_ts"))).as("min_abs_gap_us"))
    err.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_near_clicks"), lit(0L)).as("n_near_clicks"),
        col("min_abs_gap_us"))
      .orderBy(col("event_id"))
  }

  // ---- TPC-H-style headliners (bench workhorses over lineitem) ----

  /** Pricing-summary aggregate (TPC-H Q1 shape): wide multi-aggregate scan. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    {
      val li = lineitem(spark, sfDir)
      // cast the LITERAL to the column's physical type (TIMESTAMP or
      // TIMESTAMP_NTZ depending on testdata generation) so the predicate
      // lands on the raw column and stays pushable to the parquet scan
      li.filter(col("l_shipdate") <=
        lit("1998-09-02 00:00:00").cast(li.schema("l_shipdate").dataType))
    }
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8, 2)
          .as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")), 8, 2).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-k revenue orders (TPC-H Q3 shape): fact ⋈ fact ⋈ broadcast dim,
    * aggregate, top-10. */
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .join(orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Regional revenue (TPC-H Q5 shape): the full star join —
    * lineitem ⋈ orders (shuffle on orderkey) ⋈ broadcast(customer ⋈ supplier
    * ⋈ nation ⋈ region). Same-nation customer/supplier condition kept. */
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val nr = nation(spark, sfDir)
      .join(region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
    val li = lineitem(spark, sfDir)
      .join(orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
    li.groupBy(col("r_name"), col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8, 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // ---- SURVEY §2.5 category completions (beyond the reference's surface) --

  /** Ranking window: top-3 users per event type by event count (rank with
    * deterministic count-desc/user-asc tiebreak). The reference has no
    * window functions (§2.5 ❌); this closes the category. */
  def windowRank(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= k)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"),
        col("user_id"), col("n"))
      .orderBy(col("event_type"), col("rnk"), col("user_id"))
  }

  /** Set operations: high-value purchasers who also hit high-value errors,
    * minus users with large signup events — INTERSECT + EXCEPT (distinct set
    * semantics, standard precedence: INTERSECT binds tighter). §2.5 lists
    * only implicit union in the reference. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    def users(t: String, minValue: Double) =
      e.filter(col("event_type") === t && col("value") > minValue)
        .select(col("user_id")).distinct()
    users("purchase", 200.0).intersect(users("error", 200.0))
      .except(users("signup", 300.0))
      .orderBy(col("user_id"))
  }

  /** ROLLUP over (event_type, day): subtotal rows coalesced to sentinels so
    * both engines order identically. §2.5: the reference has no grouping
    * sets/rollup/cube anywhere. */
  def rollupCounts(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("day_us",
        unix_micros(date_trunc("day", col("ts"))))
      .rollup(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day_us"), lit(-1L)).as("day_us"), col("n"))
      .orderBy(col("event_type"), col("day_us"))

  /** CUBE grouping sets: counts + decimal-exact value sums over every
    * subset of (event_type, day) — the full 2^k grouping-set lattice where
    * [[rollupCounts]] computes only the hierarchy prefix. Spark expands
    * CUBE into one Expand + one partial-aggregatable hash aggregate (rows
    * ×4 at the map side, NOT four scans) — the right trade at 100 TB when
    * the alternative is re-reading the fact table per grouping set.
    * Sentinel-coalesced like the rollup so every output cell is non-null
    * and totally ordered. */
  def cubeCounts(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("day_us",
        unix_micros(date_trunc("day", col("ts"))))
      .cube(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day_us"), lit(-1L)).as("day_us"),
        col("n"), col("sum_value"))
      .orderBy(col("event_type"), col("day_us"))

  def cubeCountsOracleSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(epoch_us(date_trunc('day', ts)), -1) AS day_us,
      |  count(*) AS n,
      |  CAST(round(SUM(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY CUBE (event_type, date_trunc('day', ts))
      |ORDER BY event_type, day_us""".stripMargin

  /** Running (cumulative) totals: per event_type, day-by-day event counts
    * with a running sum over days — the analytic-frame (ROWS UNBOUNDED
    * PRECEDING) surface. The window partitions by event_type and orders by
    * day, so the cumulative pass shuffles once on the group key and runs
    * linearly per partition; counts are integers, so the running sum is
    * exact on any engine. At scale the trap is the frame without a
    * PARTITION BY — a single global cumulative order serializes the table
    * through one task. */
  def runningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("running_n", sum(col("n")).over(w))
      .orderBy(col("event_type"), col("day_us"))
  }

  def runningTotalOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, day_us, n,
      |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS running_n
      |FROM daily ORDER BY event_type, day_us""".stripMargin

  /** Per-series rate (the PromQL `rate()` shape): for each user ordered by
    * event time, the value delta and per-second rate against the previous
    * event — windowed `lag` + per-row IEEE arithmetic (deterministic given
    * operand order, no accumulation). One shuffle on the series key;
    * state per row is O(1). Zero-gap pairs (same µs timestamp) are
    * excluded rather than emitting engine-dependent ±Infinity. */
  def eventRate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_ts_us").isNotNull && col("ts_us") =!= col("prev_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        (col("value") - col("prev_value")).as("delta"),
        ((col("value") - col("prev_value")) /
          ((col("ts_us") - col("prev_ts_us")).cast("double") / lit(1e6)))
          .as("rate_per_s"))
      .orderBy(col("event_id"))
  }

  def eventRateOracleSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
      |), l AS (
      |  SELECT event_id, user_id, ts_us, value,
      |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts_us,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_value
      |  FROM e
      |)
      |SELECT event_id, user_id, ts_us,
      |  value - prev_value AS delta,
      |  (value - prev_value) / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1e6) AS rate_per_s
      |FROM l WHERE prev_ts_us IS NOT NULL AND ts_us <> prev_ts_us
      |ORDER BY event_id""".stripMargin

  /** FULL OUTER join: per-day purchase volume vs error volume — days where
    * either side is absent survive with nulls coalesced to zero. Join keys
    * are day buckets (bounded cardinality); at fleet scale both sides are
    * pre-aggregated before the join, so the outer join shuffles day-level
    * rows, not events. */
  def outerJoinDaily(spark: SparkSession, sfDir: String): DataFrame = {
    def side(t: String, as: String): DataFrame =
      events(spark, sfDir).filter(col("event_type") === t)
        .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .agg(count(lit(1)).as(as))
    side("purchase", "n_purchases").as("p")
      .join(side("error", "n_errors").as("e"), Seq("day_us"), "full_outer")
      .select(col("day_us"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"))
      .orderBy(col("day_us"))
  }

  def outerJoinDailyOracleSql: String =
    """WITH p AS (
      |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS n_purchases
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), e AS (
      |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS n_errors
      |  FROM events WHERE event_type = 'error' GROUP BY 1
      |)
      |SELECT coalesce(p.day_us, e.day_us) AS day_us,
      |  coalesce(n_purchases, 0) AS n_purchases,
      |  coalesce(n_errors, 0) AS n_errors
      |FROM p FULL OUTER JOIN e ON p.day_us = e.day_us
      |ORDER BY day_us""".stripMargin

  /** Pivot (cross-tab): quantity totals per line-status × return-flag.
    * Explicit pivot values keep the plan static (no extra distinct-values
    * job, and at 100 TB an unbounded pivot column set is an anti-pattern
    * anyway); the aggregation is one partial-aggregatable groupBy —
    * Spark compiles pivot to exactly the conditional-aggregation form the
    * oracle spells out. Decimal-exact sums per [[Tables.exactSum]]. */
  def pivotReturns(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(Tables.exactSum(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  /** Wide→long melt (the inverse reshaping of [[pivotReturns]]): unpivot
    * lineitem's four numeric measures into `(measure, value)` rows, then
    * aggregate per (returnflag, measure). The melt itself is a NARROW
    * per-row transform — Spark plans `Dataset.unpivot` as an Expand (no
    * shuffle, no UDF), so at 100 TB the 4× row growth streams through the
    * scan stage; the only exchange is the 12-group aggregate, map-side
    * combined to almost nothing. */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(Tables.exactSum(col("value"), 8, 2).as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("measure"))

  def unpivotMeasuresOracleSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
      |)
      |SELECT l_returnflag, measure,
      |  CAST(round(SUM(CAST(value AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_value,
      |  count(*) AS n
      |FROM m GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  def pivotReturnsOracleSql: String = {
    def arm(v: String) =
      s"""CAST(round(SUM(CASE WHEN l_returnflag = '$v'
         |  THEN CAST(l_quantity AS DECIMAL(28,4)) END), 2) AS DOUBLE) AS "$v""""
        .stripMargin.replace("\n", " ")
    s"""SELECT l_linestatus, ${arm("A")}, ${arm("N")}, ${arm("R")}
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** ANTI join — customers with no URGENT orders, summarized per nation
    * (the TPC-H Q22 family; the retention/garbage-collection query shape:
    * "which entities have no qualifying activity" — the predicate on the
    * filter side keeps the result non-degenerate at every sf: every
    * customer has SOME order, ~2% have no urgent one). `left_anti` keeps
    * the probe side streaming: Spark broadcasts the filtered side when
    * small and degrades to a shuffled anti-join on the key otherwise —
    * never a subquery re-scan per row. Decimal-exact balance sum per
    * [[Tables.exactSum]]. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir)
      .join(orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        exactSum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("c_nationkey"))

  /** DuckDB twin of [[antiJoin]] (NOT EXISTS ≡ left anti join). */
  def antiJoinOracleSql: String =
    """SELECT c_nationkey, count(*) AS n_customers,
      |  CAST(round(SUM(CAST(c_acctbal AS DECIMAL(28,4))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Correlated-aggregate filter — lineitems whose quantity is below 20%
    * of their part's average (the TPC-H Q17 shape: "small-quantity order
    * revenue"). The correlated scalar subquery is DECORRELATED by hand
    * into one per-part aggregate + an equi-join — the plan Catalyst's
    * subquery rewrite produces, written explicitly so the join is visibly
    * partial-aggregatable and key-partitioned (at 100 TB the per-part
    * aggregate is map-side-combined and the join shuffles on the same
    * key). The 20%-of-average predicate is evaluated in DECIMAL
    * (`5·n·qty < sum_qty` — all-positive integer-scaled arithmetic, no
    * division), so both engines decide every row identically; a raw
    * `avg()` comparison would hinge on FP summation order. */
  def corrSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select(col("l_partkey"),
      col("l_quantity").cast("decimal(28,4)").as("qty"),
      col("l_extendedprice"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_items"))
    li.join(perPart, "l_partkey")
      .filter(lit(5L) * col("qty") * col("n_items") < col("sum_qty"))
      .agg(count(lit(1)).as("n_below"),
        exactSum(col("l_extendedprice")).as("revenue_below"))
  }

  /** DuckDB twin of [[corrSubquery]] — the same hand-decorrelated form
    * with the identical decimal predicate. */
  def corrSubqueryOracleSql: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(28,4)) AS qty,
      |    l_extendedprice
      |  FROM lineitem
      |), pp AS (
      |  SELECT l_partkey, SUM(qty) AS sum_qty, count(*) AS n_items
      |  FROM li GROUP BY l_partkey
      |)
      |SELECT count(*) AS n_below,
      |  CAST(round(SUM(CAST(li.l_extendedprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS revenue_below
      |FROM li JOIN pp USING (l_partkey)
      |WHERE 5 * li.qty * pp.n_items < pp.sum_qty""".stripMargin

  private val HourUs = 3600000000L

  /** Time-series gap fill — the resample/densify operator every monitoring
    * and feature pipeline needs: per event type, a COMPLETE hourly grid
    * from the series' first to last hour (missing hours materialized, not
    * skipped), each gap row carrying n=0, a gap flag, and the last
    * observed hourly average carried FORWARD (the step-interpolation a
    * dashboard or a training-feature join expects).
    *
    * Scale shape: the aggregate is an ordinary partial-combining groupBy;
    * the grid is generated per KEY with `sequence` (grid size = time span
    * ÷ bucket, independent of row count — generating it never touches the
    * fact table); the fill is one window per series ordered by the grid.
    * The forward-fill COPIES already-rounded decimal-exact averages
    * (`last(..., ignoreNulls)` ≡ DuckDB `last_value(... IGNORE NULLS)`),
    * so no new arithmetic is introduced and the result stays
    * engine-portable. The first grid row per series is by construction an
    * observed hour (the grid starts at min observed), so `last_avg` is
    * never NULL. */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val series = events(spark, sfDir)
      .groupBy(col("event_type"),
        (expr(s"unix_micros(ts) div $HourUs") * lit(HourUs)).as("hour_us"))
      .agg(count(lit(1)).as("n"), exactAvg(col("value")).as("avg_value"))
    val grid = series.groupBy(col("event_type"))
      .agg(min(col("hour_us")).as("mn"), max(col("hour_us")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(HourUs))).as("hour_us"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
    grid.join(series, Seq("event_type", "hour_us"), "left")
      .select(col("event_type"), col("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("is_gap"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("last_avg"))
      .orderBy(col("event_type"), col("hour_us"))
  }

  /** SEMI join — orders with at least one heavy lineitem (>48 qty),
    * summarized per priority. `left_semi` is the EXISTS shape that
    * returns each left row at most once with no right-side columns: the
    * probe never duplicates rows (an inner join + distinct would shuffle
    * the duplicates first), and the filtered build side broadcasts when
    * small. Complements [[antiJoin]] (NOT EXISTS) and the bloom-pruned
    * variant ([[Sketches.bloomJoin]], which adds the pre-shuffle runtime
    * filter on top of this exact shape). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .join(lineitem(spark, sfDir)
          .filter(col("l_quantity") > lit(48.0)).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))

  /** DuckDB twin of [[semiJoin]] (EXISTS ≡ left semi join). */
  def semiJoinOracleSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS total_price
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48.0)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val DayUs = 86400000000L

  /** Explicit GROUPING SETS — the chosen-subset lattice between
    * [[rollupCounts]] (prefix sets) and [[cubeCounts]] (all 2^k sets):
    * per (type, day), per type, and the grand total — skipping the
    * per-day-across-types set a CUBE would also pay for. Spark compiles
    * it to the same single-scan Expand + partial hash aggregate; grouping
    * flags disambiguate the NULL meaning ("aggregated over" vs a null
    * value). Issued through `spark.sql` over the normalized events view —
    * GROUPING SETS has no DataFrame-API form, and the SQL front end IS
    * part of the engine's surface (SqlApiSpec). */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir).createOrReplaceTempView("graft_gs_events")
    spark.sql(
      s"""SELECT event_type,
         |  (unix_micros(ts) div $DayUs) * $DayUs AS day_us,
         |  CAST(grouping(event_type) AS INT) AS g_type,
         |  CAST(grouping((unix_micros(ts) div $DayUs) * $DayUs) AS INT) AS g_day,
         |  count(*) AS n
         |FROM graft_gs_events
         |GROUP BY GROUPING SETS (
         |  (event_type, (unix_micros(ts) div $DayUs) * $DayUs),
         |  (event_type), ())
         |ORDER BY g_type, g_day, event_type, day_us""".stripMargin)
  }

  /** DuckDB twin of [[groupingSets]]. */
  def groupingSetsOracleSql: String =
    s"""SELECT event_type,
       |  (epoch_us(ts) // $DayUs) * $DayUs AS day_us,
       |  CAST(GROUPING(event_type) AS INT) AS g_type,
       |  CAST(GROUPING((epoch_us(ts) // $DayUs) * $DayUs) AS INT) AS g_day,
       |  count(*) AS n
       |FROM events
       |GROUP BY GROUPING SETS (
       |  (event_type, (epoch_us(ts) // $DayUs) * $DayUs),
       |  (event_type), ())
       |ORDER BY g_type, g_day, event_type, day_us""".stripMargin

  /** Native `session_window` aggregation — Spark's own sessionization
    * operator (one groupBy over a dynamic-gap window, merged internally)
    * instead of the gaps-and-islands window formulation ([[sessionize]]):
    * per (user, session) event counts with the session's [start, end+gap)
    * bounds. One shuffle on the session key, sessions merge in the
    * aggregate — no per-user global sort, which is exactly why the native
    * operator is the 100 TB form of this query. The oracle recomputes the
    * same sessions longhand (lag > gap ⇒ new island). */
  def sessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** DuckDB twin of [[sessionWindow]]: gaps-and-islands with
    * end = last event + gap (Spark's session_window end bound). The gap
    * test is `>=`, not `>`: session windows are HALF-OPEN [start,
    * ts+gap), so an event exactly `gap` after its predecessor starts a
    * NEW session — the off-by-one every hand-rolled sessionizer gets
    * wrong on exact-boundary data. */
  def sessionWindowOracleSql: String = {
    val gapUs = 30L * 60 * 1000000
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
       |), s AS (
       |  SELECT user_id, ts_us,
       |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) >= $gapUs
       |         OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e
       |), sid AS (
       |  SELECT user_id, ts_us,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM s
       |)
       |SELECT user_id, min(ts_us) AS session_start_us,
       |  max(ts_us) + $gapUs AS session_end_us,
       |  count(*) AS n_events
       |FROM sid GROUP BY user_id, session_id
       |ORDER BY user_id, session_start_us""".stripMargin
  }

  /** RANGE-frame moving average — the 7-day rolling mean of daily totals
    * per event type, the smoothing window every metrics dashboard and
    * trend feature computes. The frame is a RANGE (value-based: all days
    * within 6 days before the current row), not ROWS: on a series with
    * missing days the ROWS form silently averages over a *wider* time
    * span, which is the classic moving-average bug — RANGE keeps the
    * window anchored to time.
    *
    * Scale shape: the daily aggregate is an ordinary partial-combining
    * groupBy; the window then runs over the AGGREGATED series (days ×
    * types, orders of magnitude smaller than the events). The frame sum
    * re-casts the day totals to DECIMAL so a frame's sum is
    * order-independent — a double frame-sum's association order is
    * engine-internal. */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = events(spark, sfDir)
      .groupBy(col("event_type"),
        (expr(s"unix_micros(ts) div $DayUs") * lit(DayUs)).as("day_us"))
      .agg(exactSum(col("value")).as("day_total"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_us"))
      .rangeBetween(-6L * DayUs, 0L)
    // both frame aggregates expressed over the SAME window spec, so
    // Catalyst fuses them into one Window node (one sort, one pass) —
    // deriving ma7 from a previously-projected n_days column would
    // force a second Window over the first's output
    daily
      .select(col("event_type"), col("day_us"), col("day_total"),
        count(lit(1)).over(w).as("n_days"),
        Tables.portableRound6(
          sum(col("day_total").cast("decimal(28,6)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("ma7"))
      .orderBy(col("event_type"), col("day_us"))
  }

  /** DuckDB twin of [[movingAvg]] — identical RANGE frame over µs longs,
    * identical decimal frame sum. */
  def movingAvgOracleSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, (epoch_us(ts) // $DayUs) * $DayUs AS day_us,
       |    CAST(round(SUM(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE) AS day_total
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_type, day_us, day_total,
       |  COUNT(*) OVER w AS n_days,
       |  ${Tables.portableRound6Sql(
            "CAST(SUM(CAST(day_total AS DECIMAL(28,6))) OVER w AS DOUBLE) / (COUNT(*) OVER w)")} AS ma7
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY day_us
       |  RANGE BETWEEN ${6L * DayUs} PRECEDING AND CURRENT ROW)
       |ORDER BY event_type, day_us""".stripMargin

  /** DuckDB twin of [[gapFill]] (`generate_series` grid + `last_value
    * IGNORE NULLS` forward fill — both engines copy the same rounded
    * values). */
  def gapFillOracleSql: String =
    s"""WITH s AS (
       |  SELECT event_type, (epoch_us(ts) // $HourUs) * $HourUs AS hour_us,
       |    count(*) AS n,
       |    ${Tables.exactAvgSql("value")} AS avg_value
       |  FROM events GROUP BY 1, 2
       |), b AS (
       |  SELECT event_type, min(hour_us) AS mn, max(hour_us) AS mx
       |  FROM s GROUP BY 1
       |), g AS (
       |  SELECT event_type, unnest(generate_series(mn, mx, $HourUs)) AS hour_us
       |  FROM b
       |)
       |SELECT g.event_type, g.hour_us, coalesce(s.n, 0) AS n,
       |  (s.n IS NULL) AS is_gap,
       |  last_value(s.avg_value IGNORE NULLS)
       |    OVER (PARTITION BY g.event_type ORDER BY g.hour_us) AS last_avg
       |FROM g LEFT JOIN s USING (event_type, hour_us)
       |ORDER BY g.event_type, g.hour_us""".stripMargin

  // ---- Multiple DISTINCT aggregates ----

  /** Several COUNT(DISTINCT …) over different columns in one aggregate —
    * Catalyst plans this with one Expand (row replicated per distinct
    * group) + two-phase aggregation, NOT one scan per distinct column;
    * the single-pass multi-distinct shape matters at 100 TB where each
    * extra scan is a table read. Also carries a plain count and an exact
    * decimal sum to show mixed distinct/non-distinct planning. */
  def multiDistinct(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(get_json_object(col("props"), "$.k").cast("long")).as("n_k"),
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  /** DuckDB twin of [[multiDistinct]]. */
  def multiDistinctOracleSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
      |  count(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- Distribution window functions ----

  /** percent_rank / cume_dist / ntile over a UNIQUE total order per group
    * — the distribution-analytic window family. The unique (value,
    * event_id) ordering is what makes all three engine-deterministic:
    * with ties unbroken, cume_dist and ntile assignments are
    * implementation-defined. Output restricted to each type's top-20 by
    * the same order so the gate stays small; the rank columns are
    * computed over the FULL group before the cut. */
  def windowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("pct_rank", Tables.portableRound6(percent_rank().over(w)))
      .withColumn("cume", Tables.portableRound6(cume_dist().over(w)))
      .withColumn("tile", ntile(10).over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("event_type"), col("rn").cast("long").as("rn"),
        col("event_id"), col("value"), col("pct_rank"), col("cume"), col("tile"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** DuckDB twin of [[windowStats]]. */
  def windowStatsOracleSql: String =
    s"""WITH r AS (
       |  SELECT event_type, event_id, value,
       |    row_number() OVER w AS rn,
       |    ${Tables.portableRound6Sql("percent_rank() OVER w")} AS pct_rank,
       |    ${Tables.portableRound6Sql("cume_dist() OVER w")} AS cume,
       |    CAST(ntile(10) OVER w AS BIGINT) AS tile
       |  FROM events
       |  WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
       |)
       |SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id, value,
       |  pct_rank, cume, tile
       |FROM r WHERE rn <= 20
       |ORDER BY event_type, rn""".stripMargin

  // ---- SCD2 intervalization ----

  /** Slowly-changing-dimension (type 2) history from an event log: per
    * user, consecutive events with the SAME type collapse to one state
    * row, and each surviving state gets a half-open validity interval
    * [valid_from, valid_to) closed by the next state change (NULL = still
    * current). The standard changelog→dimension-history build, as two
    * window passes over one `user_id` shuffle: a lag to detect changes, a
    * lead over the survivors to close intervals. Timestamps are epoch-µs
    * integers; the (ts, event_id) tiebreak makes the sequence — and hence
    * the intervals — engine-exact.
    */
  def scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val changes = events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_id").as("change_event_id"),
        col("event_type"), col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("change_event_id"))
  }

  /** DuckDB twin of [[scd2]]. */
  def scd2OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
      |), c AS (
      |  SELECT *, lag(event_type) OVER w AS prev_type
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), ch AS (
      |  SELECT user_id, event_id, event_type, ts_us FROM c
      |  WHERE prev_type IS NULL OR prev_type <> event_type
      |)
      |SELECT user_id, event_id AS change_event_id, event_type,
      |  ts_us AS valid_from_us,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
      |FROM ch ORDER BY user_id, valid_from_us, change_event_id""".stripMargin

  // ---- Funnel analysis (ordered multi-stage conversion) ----

  /** Per-user ordered funnel signup → click → purchase: a user converts a
    * stage only if that stage's event happens AT OR AFTER their previous
    * stage's conversion time (min-qualifying-timestamp semantics). Reports
    * per-stage user counts and conversion rates.
    *
    * Scale shape: three per-user aggregates chained by joins, every one
    * map-side combined and keyed on `user_id` — after the first shuffle
    * the key partitioning is reused (no new exchange per stage, AQE plans
    * the three aggs over one layout), and nothing is ever ordered
    * globally. The window-free formulation matters: a per-user sort-based
    * funnel (collect events, walk the array) carries the full event list
    * per user through the shuffle; this carries one timestamp per stage.
    * Timestamps compare as epoch-µs integers.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts_us") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts_us") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n_signup"))
    val n2 = s2.agg(count(lit(1)).as("n_click_after"))
    val n3 = s3.agg(count(lit(1)).as("n_purchase_after"))
    // empty upstream stages yield NULL rates, not NaN/Infinity — NaN cells
    // are a fragile surface for the hash gate and for downstream consumers,
    // and the oracle mirrors the rule with NULLIF
    n1.crossJoin(n2).crossJoin(n3)
      .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
        when(col("n_signup") > 0,
          col("n_click_after").cast("double") / col("n_signup").cast("double"))
          .as("rate_click"),
        when(col("n_click_after") > 0,
          col("n_purchase_after").cast("double") / col("n_click_after").cast("double"))
          .as("rate_purchase"))
  }

  /** DuckDB twin of [[funnel]]. */
  def funnelOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      |), s1 AS (
      |  SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT ev.user_id, min(ts_us) AS t2
      |  FROM ev JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND ts_us >= t1 GROUP BY 1
      |), s3 AS (
      |  SELECT ev.user_id, min(ts_us) AS t3
      |  FROM ev JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts_us >= t2 GROUP BY 1
      |)
      |SELECT (SELECT count(*) FROM s1) AS n_signup,
      |  (SELECT count(*) FROM s2) AS n_click_after,
      |  (SELECT count(*) FROM s3) AS n_purchase_after,
      |  CAST((SELECT count(*) FROM s2) AS DOUBLE)
      |    / NULLIF(CAST((SELECT count(*) FROM s1) AS DOUBLE), 0) AS rate_click,
      |  CAST((SELECT count(*) FROM s3) AS DOUBLE)
      |    / NULLIF(CAST((SELECT count(*) FROM s2) AS DOUBLE), 0) AS rate_purchase""".stripMargin

  /** Step window for [[funnelWindowed]] (µs): 1 hour. */
  val FunnelWindowUs = 3600000000L

  /** TIME-CONSTRAINED funnel — signup → click → purchase where each step
    * must land within [[FunnelWindowUs]] of the PREVIOUS step's time (the
    * product-analytics form: "converted within the hour", not "ever").
    * First-qualifying-event semantics, same as [[funnel]]: each stage
    * anchors on the user's earliest qualifying event (`min` per user), and
    * the next stage measures from that anchor — the standard greedy rule
    * (a later anchor could in principle rescue a downstream step; greedy
    * is what every funnel product computes and is deterministic).
    *
    * Scale shape identical to [[funnel]]: three per-user min-aggregates
    * chained by equi-joins on `user_id` — co-partitioned after the first
    * shuffle, no windows, no sort. */
  def funnelWindowed(spark: SparkSession, sfDir: String,
      windowUs: Long = FunnelWindowUs): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts_us") >= col("t1") && col("ts_us") <= col("t1") + lit(windowUs))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts_us") >= col("t2") && col("ts_us") <= col("t2") + lit(windowUs))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n_signup"))
    val n2 = s2.agg(count(lit(1)).as("n_click_1h"))
    val n3 = s3.agg(count(lit(1)).as("n_purchase_1h"))
    n1.crossJoin(n2).crossJoin(n3)
      .select(col("n_signup"), col("n_click_1h"), col("n_purchase_1h"),
        when(col("n_signup") > 0,
          col("n_click_1h").cast("double") / col("n_signup").cast("double"))
          .as("rate_click_1h"),
        when(col("n_click_1h") > 0,
          col("n_purchase_1h").cast("double") / col("n_click_1h").cast("double"))
          .as("rate_purchase_1h"))
  }

  /** DuckDB twin of [[funnelWindowed]]. */
  def funnelWindowedOracleSql(windowUs: Long = FunnelWindowUs): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
       |), s1 AS (
       |  SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1
       |), s2 AS (
       |  SELECT ev.user_id, min(ts_us) AS t2
       |  FROM ev JOIN s1 USING (user_id)
       |  WHERE event_type = 'click' AND ts_us >= t1 AND ts_us <= t1 + $windowUs
       |  GROUP BY 1
       |), s3 AS (
       |  SELECT ev.user_id, min(ts_us) AS t3
       |  FROM ev JOIN s2 USING (user_id)
       |  WHERE event_type = 'purchase' AND ts_us >= t2 AND ts_us <= t2 + $windowUs
       |  GROUP BY 1
       |)
       |SELECT (SELECT count(*) FROM s1) AS n_signup,
       |  (SELECT count(*) FROM s2) AS n_click_1h,
       |  (SELECT count(*) FROM s3) AS n_purchase_1h,
       |  CAST((SELECT count(*) FROM s2) AS DOUBLE)
       |    / NULLIF(CAST((SELECT count(*) FROM s1) AS DOUBLE), 0) AS rate_click_1h,
       |  CAST((SELECT count(*) FROM s3) AS DOUBLE)
       |    / NULLIF(CAST((SELECT count(*) FROM s2) AS DOUBLE), 0) AS rate_purchase_1h""".stripMargin

  // ---- Cohort retention ----

  /** Weekly cohort retention matrix: users are cohorted by their first
    * active epoch-week (integer `ts_us div week_µs` — no calendar
    * dependence, identical on any engine), and each (cohort_week, offset)
    * cell counts the cohort's users active `offset` weeks later.
    *
    * Scale shape: distinct (user, week) activity → per-user min for the
    * cohort (both map-side combined, keyed on user) → count per
    * (cohort, offset) cell. The matrix is |weeks|² rows regardless of user
    * count — aggregation output, never raw rows.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val act = events(spark, sfDir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${weekUs}L").as("week"))
      .distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** DuckDB twin of [[retention]]. */
  def retentionOracleSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
      |), cohort AS (
      |  SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1
      |)
      |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
      |FROM act JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ---- 2D skyline (Pareto frontier) ----

  /** Pareto frontier of a (maximize benefit, minimize cost) point set —
    * keep the rows no other row strictly dominates. The data-selection
    * primitive for "best quality at every budget" curves (quality-vs-length
    * corpus filtering, cost-vs-coverage source picks).
    *
    * Distributed in TWO PHASES via the skyline decomposition identity
    * `sky(A ∪ B) = sky(sky(A) ∪ sky(B))`: phase 1 computes a local frontier
    * inside each of 16 salt partitions (per-partition window — parallel,
    * bounded memory), phase 2 re-applies the same rule to the survivors
    * (≤ the union of 16 frontiers — tiny). A direct global-window skyline
    * would sort everything into ONE partition; the salted form is
    * result-identical (any split works for the identity) and keeps every
    * stage partition-parallel.
    *
    * Dominance test per partition, windowed: sort by benefit DESC; a row is
    * dominated iff some strictly-higher-benefit row has cost ≤ its own
    * (RANGE-framed running min excludes benefit-ties) or some equal-benefit
    * row has strictly smaller cost. Both columns are BIGINT so the RANGE
    * frame and every comparison are exact on both engines.
    */
  def skyline2D(df: DataFrame, idCol: String, benefitCol: String,
      costCol: String, salts: Int = 16): DataFrame = {
    def localSkyline(in: DataFrame, parts: Seq[String]): DataFrame = {
      val pcols = parts.map(col)
      val wStrict = Window.partitionBy(pcols: _*).orderBy(col(benefitCol).desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val wTies = Window.partitionBy((pcols :+ col(benefitCol)): _*)
      in.withColumn("mn_higher", min(col(costCol)).over(wStrict))
        .withColumn("mn_tie", min(col(costCol)).over(wTies))
        .filter((col("mn_higher").isNull || col(costCol) < col("mn_higher")) &&
          col(costCol) === col("mn_tie"))
        .drop("mn_higher", "mn_tie")
    }
    val salted = df.withColumn("_salt", pmod(col(idCol), lit(salts.toLong)))
    val local = localSkyline(salted, Seq("_salt")).drop("_salt")
    // phase 2 IS an empty-key window (the bench's only WindowExec
    // single-partition warnings, 2 specs × reps) — deliberately: its input
    // is the union of the per-salt LOCAL skylines, and a 2D skyline of a
    // random partition has expected size O(log n), so the global merge
    // moves O(salts · log n) rows at ANY data scale — the classic
    // two-phase skyline shape, not a data funnel
    localSkyline(local, Nil)
  }

  /** Gate query: the per-user (total purchase value in cents — maximize,
    * event count — minimize) frontier over `events`. Cents keep the
    * benefit axis integral (exact decimal→long, exact RANGE frame). */
  def skyline(spark: SparkSession, sfDir: String): DataFrame = {
    // explicit floor before the long cast: Spark's decimal→long CAST
    // truncates but DuckDB's rounds half-up, so a bare cast diverges the
    // moment a value carries sub-cent precision; floor-then-cast is the
    // same one rule on both engines
    val perUser = events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(floor(sum(col("value").cast("decimal(28,4)")) * 100)
          .cast("long").as("total_cents"),
        count(lit(1)).as("n_events"))
    skyline2D(perUser, "user_id", "total_cents", "n_events")
      .orderBy(col("total_cents").desc, col("user_id"))
  }

  /** DuckDB twin of [[skyline]] — the frontier written as the direct
    * NOT EXISTS dominance test (obviously correct; the salted two-phase
    * form is the execution strategy, not the semantics). */
  def skylineOracleSql: String =
    """WITH agg AS (
      |  SELECT user_id,
      |    CAST(floor(SUM(CAST(value AS DECIMAL(28,4))) * 100) AS BIGINT) AS total_cents,
      |    count(*) AS n_events
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id, total_cents, n_events FROM agg u
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM agg v
      |  WHERE (v.total_cents > u.total_cents AND v.n_events <= u.n_events)
      |     OR (v.total_cents >= u.total_cents AND v.n_events < u.n_events)
      |)
      |ORDER BY total_cents DESC, user_id""".stripMargin

  // ---- recency-decayed aggregation ----------------------------------------

  /** Per-user recency-weighted engagement score: each event contributes
    * `value · 2^(-age_hours)` with age measured back from the corpus' newest
    * event and the exponent capped at 40 (2⁻⁴⁰ ≈ 10⁻¹² is already below the
    * 10⁻⁶ fixed-point resolution; the cap also keeps the shift in BIGINT
    * range). The decayed-sum-by-key shape is the standard freshness prior of
    * feed ranking and training-data recency weighting; the usual `exp(-Δt/τ)`
    * is deliberately a power of two here — `2^(-n)` for integer `n` is one
    * exact right-shift, so the whole aggregate is integer arithmetic
    * (`⌊value·10⁶⌋ div 2ⁿ`, summed exactly) and cross-engine reproducible,
    * where `exp` would hit libm divergence (the [[TextAnalysis.lmScore]]
    * rule). A τ-parameterized half-life is the same query with
    * `age div τ_hours` as the exponent.
    *
    * Scale shape: one tiny max-ts aggregate broadcast back (no window over
    * the full table), then a map pass + one partial-combined sum keyed on
    * user_id — the minimal two-job plan; no skew surface beyond the keyed
    * agg itself. Overflow: `⌊value·10⁶⌋ ≤ 5·10⁸` per row; 2⁶³/5·10⁸ ≈
    * 1.8·10¹⁰ rows per USER before the sum could wrap — not reachable. */
  def decayAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val maxTs = ev.agg(max(col("ts_us")).as("max_us"))
    ev.crossJoin(broadcast(maxTs))
      .withColumn("age_h",
        least(expr("(max_us - ts_us) div 3600000000"), lit(40L)))
      .withColumn("decayed_fp",
        expr("floor(value * 1000000) div shiftleft(1L, cast(age_h as int))"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("decayed_fp")).as("decayed_fp_sum"))
      .withColumn("decayed_score",
        col("decayed_fp_sum").cast("double") / lit(1000000.0))
      .orderBy(col("user_id"))
  }

  /** DuckDB twin of [[decayAgg]] — same hour bucketing, same exact
    * shift-divide fixed point (`//` ≡ Spark `div`: operands non-negative). */
  def decayAggOracleSql: String =
    """WITH m AS (
      |  SELECT max(epoch_us(ts)) AS max_us FROM events
      |), e AS (
      |  SELECT user_id,
      |    CAST(floor(value * 1000000) AS BIGINT) //
      |      (CAST(1 AS BIGINT) << CAST(least((m.max_us - epoch_us(ts)) // 3600000000, 40) AS INT))
      |      AS decayed_fp
      |  FROM events, m
      |)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(decayed_fp) AS BIGINT) AS decayed_fp_sum,
      |  CAST(sum(decayed_fp) AS DOUBLE) / 1000000.0 AS decayed_score
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- fuzzy (approximate-string) join ------------------------------------

  /** Block size cap for [[fuzzyJoin]]: at most this many names per block
    * enter the pairwise edit-distance kernel. */
  val FuzzyBlockCap = 300

  /** Approximate-string self-join of part names — the record-linkage /
    * entity-resolution primitive: find name pairs within Levenshtein
    * distance `maxDist` (near-misses only; distance 0 is [[Dedup.exact]]'s
    * job). The classic blocking strategy bounds the quadratic kernel: pairs
    * are generated only within a blocking key (here the name's first token
    * — production uses phonetic codes or sorted-neighbourhood windows), and
    * each block is capped at [[FuzzyBlockCap]] members under the
    * deterministic p_partkey order before the self-join, so a hot block
    * emits at most C(cap, 2) candidate pairs instead of C(|block|, 2) —
    * the same bound-the-blowup-BEFORE-the-join rule as
    * [[Graph.cappedSuppliers]] and [[Dedup]]'s capped Jaccard. Levenshtein
    * is pure integer DP, identical on both engines.
    *
    * Scale shape: one window (shuffle on the block key) for the cap, one
    * equi-join on the block key for the pairs; candidate count is
    * ≤ C(cap,2)·|blocks| by construction. Skewed block keys are exactly
    * what the cap absorbs. */
  def fuzzyJoin(spark: SparkSession, sfDir: String,
      maxDist: Int = 3, blockCap: Int = FuzzyBlockCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
    val capped = p
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("blk")).orderBy(col("p_partkey"))))
      .filter(col("_rn") <= blockCap)
      .drop("_rn")
    capped.as("a").join(capped.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") >= 1 && col("dist") <= maxDist)
      .select(col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"),
        col("a.p_name").as("a_name"), col("b.p_name").as("b_name"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** The blocking + cap + Levenshtein-filter CTEs of [[fuzzyJoinOracleSql]]
    * — shared with [[erClustersOracleSql]], which clusters the same pair
    * list. */
  private def fuzzyPairsSqlCtes(maxDist: Int, blockCap: Int): String =
    s"""p AS (
       |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
       |  FROM part
       |), capped AS (
       |  SELECT p_partkey, p_name, blk FROM (
       |    SELECT p_partkey, p_name, blk,
       |      row_number() OVER (PARTITION BY blk ORDER BY p_partkey) AS rn
       |    FROM p
       |  ) WHERE rn <= $blockCap
       |), fpairs AS (
       |  SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       |    a.p_name AS a_name, b.p_name AS b_name,
       |    CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
       |  FROM capped a JOIN capped b
       |    ON a.blk = b.blk AND a.p_partkey < b.p_partkey
       |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $maxDist
       |)""".stripMargin

  /** DuckDB twin of [[fuzzyJoin]] — same blocking key, cap, and edit
    * distance (both engines implement unweighted Levenshtein). */
  def fuzzyJoinOracleSql(maxDist: Int = 3, blockCap: Int = FuzzyBlockCap): String =
    s"""WITH ${fuzzyPairsSqlCtes(maxDist, blockCap)}
       |SELECT a_key, b_key, a_name, b_name, dist
       |FROM fpairs ORDER BY a_key, b_key""".stripMargin

  // ---- entity resolution (fuzzy pairs → clusters → canonical records) -----

  /** End-to-end entity resolution over part names — the composition the
    * record-linkage literature calls blocking → pairwise matching →
    * clustering → survivorship, built from this library's own pieces:
    * [[fuzzyJoin]]'s capped blocked Levenshtein pairs become an undirected
    * match graph, [[Dedup.componentLabels]] labels its connected components
    * (min-id label, the size-gated union-find/star-contraction machinery),
    * and each cluster's lowest-key member is the canonical (survivor)
    * record. Emits one row per part that matched anything; singletons are
    * absent by CC convention (they need no resolution).
    *
    * Scale shape: inherits the pieces' — the pair kernel is blocked and
    * capped BEFORE the quadratic step, CC auto-switches between driver
    * union-find (bounded edges) and the salted star-contraction loop, and
    * the final size join keys on the cluster label. */
  def erClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = fuzzyJoin(spark, sfDir).select(col("a_key"), col("b_key"))
    val labels = graft.operators.Dedup.componentLabels(pairs)
      .select(col("doc_id").as("p_partkey"), col("label").as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("p_partkey"), col("cluster_id"), col("cluster_size"),
        (col("p_partkey") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("p_partkey"))
  }

  /** DuckDB twin of [[erClusters]] — the fuzzy pair CTEs plus recursive
    * min-label reachability (the [[Dedup.nearDupGroupsOracleSql]] pattern). */
  def erClustersOracleSql(maxDist: Int = 3, blockCap: Int = FuzzyBlockCap): String =
    s"""WITH RECURSIVE ${fuzzyPairsSqlCtes(maxDist, blockCap)},
       |edges AS (
       |  SELECT a_key AS a, b_key AS b FROM fpairs
       |  UNION
       |  SELECT b_key, a_key FROM fpairs
       |), reach(a, b) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), grp AS (
       |  SELECT a AS p_partkey, min(b) AS cluster_id FROM reach GROUP BY a
       |), gs AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM grp GROUP BY cluster_id
       |)
       |SELECT grp.p_partkey, grp.cluster_id, gs.cluster_size,
       |  grp.p_partkey = grp.cluster_id AS is_canonical
       |FROM grp JOIN gs USING (cluster_id)
       |ORDER BY grp.p_partkey""".stripMargin

  // ---- k-anonymity audit ---------------------------------------------------

  /** Anonymity threshold / balance-bucket width for [[kAnonymity]]. */
  val KAnonK = 5L
  val KAnonBalBucket = 1000L

  /** K-anonymity audit over the customer table — the privacy-governance
    * primitive for training-data release: customers group by their
    * quasi-identifier tuple (nation, market segment, account-balance
    * bucket), and any group smaller than k = [[KAnonK]] is a
    * re-identification risk (its members are distinguishable by attributes
    * an adversary can plausibly know). Emits the risky groups with their
    * sizes plus the affected-row count per group — the report a release
    * gate thresholds on; the remediation (suppress or widen buckets) is a
    * re-run with coarser quasi-identifiers.
    *
    * Scale shape: ONE map-side-combined aggregate on the QI tuple; the
    * risky subset is a filter on the aggregate, never a second scan. */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Long = KAnonK): DataFrame =
    customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr(s"CAST(floor(c_acctbal / $KAnonBalBucket) AS BIGINT)").as("bal_bucket"))
      .groupBy(col("nationkey"), col("mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .orderBy(col("nationkey"), col("mktsegment"), col("bal_bucket"))

  /** DuckDB twin of [[kAnonymity]]. */
  def kAnonymityOracleSql(k: Long = KAnonK): String =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       |  c_mktsegment AS mktsegment,
       |  CAST(floor(c_acctbal / $KAnonBalBucket) AS BIGINT) AS bal_bucket,
       |  count(*) AS group_size
       |FROM customer
       |GROUP BY 1, 2, 3
       |HAVING count(*) < $k
       |ORDER BY nationkey, mktsegment, bal_bucket""".stripMargin

  // ---- grouped trend fitting (OLS) ----------------------------------------

  /** Per-series linear trend over hourly event counts — ordinary least
    * squares in EXACT integer arithmetic: for each event_type, hours are
    * re-indexed from the series' own first hour (t = hour − min_hour, so
    * every moment sum stays far inside BIGINT at any sf), y = events in
    * that hour, and the closed-form slope `(nΣty − ΣtΣy)/(nΣt² − (Σt)²)`
    * is emitted as a 10⁻⁶ fixed-point truncating division plus its exact
    * integer numerator/denominator (the rational answer itself, for
    * consumers that refuse rounding). The slope-over-buckets shape is the
    * capacity-planning / drift-trend primitive on metric streams.
    *
    * Scale shape: one time-bucket aggregate (map-side combined), one
    * per-series min join (broadcast-scale — |series| keys), one moment
    * aggregate per series. No windows, no sorts beyond the final tiny
    * ORDER BY. */
  def trendFit(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("y"))
    val h0 = hourly.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
    hourly.join(broadcast(h0), "event_type")
      .withColumn("t", col("h") - col("h0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("t")).as("st"), sum(col("y")).as("sy"),
        sum(col("t") * col("y")).as("sty"), sum(col("t") * col("t")).as("stt"))
      .filter(col("n_buckets") >= 2)
      .withColumn("num", expr("n_buckets * sty - st * sy"))
      .withColumn("den", expr("n_buckets * stt - st * st"))
      .withColumn("slope_fp", expr("(num * 1000000L) div den"))
      .select(col("event_type"), col("n_buckets"), col("sy").as("total_events"),
        col("num"), col("den"), col("slope_fp"),
        (col("slope_fp").cast("double") / lit(1000000.0)).as("slope_per_hour"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[trendFit]] — identical re-indexed moments and
    * truncating fixed-point slope. */
  def trendFitOracleSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS y
      |  FROM events GROUP BY 1, 2
      |), h0 AS (
      |  SELECT event_type, min(h) AS h0 FROM hourly GROUP BY 1
      |), m AS (
      |  SELECT hourly.event_type,
      |    count(*) AS n_buckets,
      |    CAST(sum(h - h0) AS BIGINT) AS st,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum((h - h0) * y) AS BIGINT) AS sty,
      |    CAST(sum((h - h0) * (h - h0)) AS BIGINT) AS stt
      |  FROM hourly JOIN h0 USING (event_type) GROUP BY 1
      |)
      |SELECT event_type, n_buckets, sy AS total_events,
      |  CAST(n_buckets * sty - st * sy AS BIGINT) AS num,
      |  CAST(n_buckets * stt - st * st AS BIGINT) AS den,
      |  CAST(((n_buckets * sty - st * sy) * 1000000)
      |    // (n_buckets * stt - st * st) AS BIGINT) AS slope_fp,
      |  CAST(CAST(((n_buckets * sty - st * sy) * 1000000)
      |    // (n_buckets * stt - st * st) AS BIGINT) AS DOUBLE) / 1000000.0
      |    AS slope_per_hour
      |FROM m WHERE n_buckets >= 2
      |ORDER BY event_type""".stripMargin

  // ---- two-cohort A/B comparison ------------------------------------------

  /** Squared z threshold for [[abTest]] (1.96² at 95%). */
  val AbZsq = 3.841459

  /** The z² expression shared verbatim by the Spark `expr` and the DuckDB
    * twin — identical IEEE op sequence over exact integer inputs. */
  private val AbZsqExprSql: String = {
    val diff = "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
    val va = "((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na AS DOUBLE)))"
    val vb = "((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))"
    s"($diff * $diff) / ($va + $vb)"
  }

  /** Per-event-type two-cohort (A/B) comparison of `value`: cohorts are a
    * deterministic user split (even/odd user_id — the RNG-free assignment
    * rule, like [[graft.operators.Sampling.sampleSplit]]), and the Welch z
    * statistic is computed from EXACT integer moment sums (n, Σv, Σv² per
    * cohort in 10⁻⁶ fixed point, DECIMAL-exact) so the only floating-point
    * work is the final closed-form expression over identical exact
    * integers — both engines run the same IEEE sequence and round6 sees
    * bit-identical values (the [[graft.operators.TextAnalysis.tfidfPairs]]
    * cast argument). Emits means, the z², and the significance flag — the
    * experimentation-analysis primitive.
    *
    * Scale shape: ONE map-side-combined aggregate keyed on (event_type,
    * cohort) — six numbers per key — then a self-merge of the two cohort
    * rows per type. No row ever leaves the aggregate. */
  def abTest(spark: SparkSession, sfDir: String): DataFrame = {
    val moments = events(spark, sfDir)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("is_a"),
        expr("CAST(floor(value * 1000000) AS DECIMAL(38,0))").as("v_fp"))
      .groupBy(col("event_type"), col("is_a"))
      .agg(count(lit(1)).as("n"),
        sum(col("v_fp")).cast("decimal(38,0)").as("s"),
        sum(expr("v_fp * v_fp")).cast("decimal(38,0)").as("q"))
    val a = moments.filter(col("is_a"))
      .select(col("event_type"), col("n").as("na"), col("s").as("sa"), col("q").as("qa"))
    val b = moments.filter(!col("is_a"))
      .select(col("event_type"), col("n").as("nb"), col("s").as("sb"), col("q").as("qb"))
    a.join(b, "event_type")
      .withColumn("mean_a", Tables.portableRound6(
        col("sa").cast("double") / col("na") / lit(1000000.0)))
      .withColumn("mean_b", Tables.portableRound6(
        col("sb").cast("double") / col("nb") / lit(1000000.0)))
      // Welch: z² = (μa−μb)² / (va/na + vb/nb), variances population-form;
      // every input is an exact integer cast to double, the square is an
      // explicit self-multiply (pow(x, 2) may route through libm — not
      // guaranteed correctly rounded on every engine), and the 10⁶ moment
      // scaling cancels between numerator (10¹²) and variance sum (10¹²)
      .withColumn("z_sq", Tables.portableRound6(expr(AbZsqExprSql)))
      .withColumn("significant", col("z_sq") > lit(AbZsq))
      .select(col("event_type"), col("na"), col("nb"), col("mean_a"),
        col("mean_b"), col("z_sq"), col("significant"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[abTest]] — identical exact moments and IEEE
    * expression order (the z² expression string is SHARED with the Spark
    * side, so the op sequence cannot drift). */
  def abTestOracleSql: String = {
    val zExpr = AbZsqExprSql
    s"""WITH m AS (
       |  SELECT event_type, user_id % 2 = 0 AS is_a, count(*) AS n,
       |    sum(CAST(floor(value * 1000000) AS HUGEINT)) AS s,
       |    sum(CAST(floor(value * 1000000) AS HUGEINT)
       |      * CAST(floor(value * 1000000) AS HUGEINT)) AS q
       |  FROM events GROUP BY 1, 2
       |), a AS (
       |  SELECT event_type, n AS na, s AS sa, q AS qa FROM m WHERE is_a
       |), b AS (
       |  SELECT event_type, n AS nb, s AS sb, q AS qb FROM m WHERE NOT is_a
       |)
       |SELECT a.event_type, na, nb,
       |  ${Tables.portableRound6Sql("CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 1000000.0")} AS mean_a,
       |  ${Tables.portableRound6Sql("CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0")} AS mean_b,
       |  ${Tables.portableRound6Sql(zExpr)} AS z_sq,
       |  ${Tables.portableRound6Sql(zExpr)} > $AbZsq AS significant
       |FROM a JOIN b USING (event_type)
       |ORDER BY a.event_type""".stripMargin
  }

  // ---- two-cohort rank test (Mann–Whitney U) -------------------------------

  /** The z² expression shared verbatim by the Spark `expr` and the DuckDB
    * twin — normal approximation of the U statistic over exact integer
    * inputs (`u2a` is the DOUBLED U so tie-averaged half-ranks stay
    * integral): z² = 3·(U2−na·nb)² / (na·nb·(na+nb+1)). */
  private val MwZsqExprSql: String = {
    val d = "(CAST(u2a AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
    s"(3.0 * $d * $d) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0))"
  }

  /** Per-event-type MANN–WHITNEY U rank test of `value` between the same
    * deterministic even/odd-user cohorts as [[abTest]] — the nonparametric
    * sibling of the Welch z gate (detects distribution shift that means
    * can miss). Every rank quantity is kept EXACTLY integral: values go to
    * 10⁻⁶ fixed point, ties take the midrank, and all rank sums are
    * DOUBLED (`r2a`, `u2a`) so `(first+last)/2` midranks never leave ℤ —
    * a tied run starting at rank r with n members contributes
    * `na_v·(2r+n−1)` to the doubled cohort rank sum. The only floating
    * point is the final z² normal approximation over identical exact
    * integers (shared expression string, both engines run the same IEEE
    * sequence).
    *
    * Scale shape: ranks are NEVER assigned per row — the test needs only
    * per-DISTINCT-VALUE counts, so the row-scale work is ONE map-side-
    * combined aggregate on (event_type, v_fp); the running count that
    * turns value-group sizes into start ranks is a window partitioned by
    * event_type over that already-collapsed frame (distinct values per
    * key, not rows). A single-key corpus at 100 TB would swap that window
    * for [[graft.operators.Ranks.prefixSum]] — same contract as
    * `text_vocab_growth`. */
  def mannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val byValue = events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"),
        when(col("user_id") % 2 === 0, 1L).otherwise(0L).as("is_a"))
      .groupBy(col("event_type"), col("v_fp"))
      .agg(count(lit(1)).as("n_v"), sum(col("is_a")).as("na_v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v_fp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byValue
      .withColumn("r_start", coalesce(sum(col("n_v")).over(w), lit(0L)) + 1L)
      .groupBy(col("event_type"))
      .agg(sum(col("na_v")).as("na"),
        sum(col("n_v") - col("na_v")).as("nb"),
        sum(col("na_v") * (col("r_start") * 2L + col("n_v") - 1L)).as("r2a"))
      .withColumn("u2a", col("r2a") - col("na") * (col("na") + 1L))
      .withColumn("z_sq", Tables.portableRound6(expr(MwZsqExprSql)))
      .withColumn("significant", col("z_sq") > lit(AbZsq))
      .select(col("event_type"), col("na"), col("nb"), col("r2a"),
        col("u2a"), col("z_sq"), col("significant"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[mannWhitney]] — identical fixed point, doubled
    * midrank algebra, and shared z² expression string. */
  def mannWhitneyOracleSql: String =
    s"""WITH v AS (
       |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_fp,
       |    count(*) AS n_v,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_v
       |  FROM events GROUP BY 1, 2
       |), r AS (
       |  SELECT event_type, n_v, na_v,
       |    COALESCE(sum(n_v) OVER (PARTITION BY event_type ORDER BY v_fp
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS r_start
       |  FROM v
       |), g AS (
       |  SELECT event_type, CAST(sum(na_v) AS BIGINT) AS na,
       |    CAST(sum(n_v - na_v) AS BIGINT) AS nb,
       |    CAST(sum(na_v * (r_start * 2 + n_v - 1)) AS BIGINT) AS r2a
       |  FROM r GROUP BY 1
       |), u AS (
       |  SELECT event_type, na, nb, r2a, r2a - na * (na + 1) AS u2a FROM g
       |)
       |SELECT event_type, na, nb, r2a, u2a,
       |  ${Tables.portableRound6Sql(MwZsqExprSql)} AS z_sq,
       |  ${Tables.portableRound6Sql(MwZsqExprSql)} > $AbZsq AS significant
       |FROM u ORDER BY event_type""".stripMargin

  // ---- two-sample Kolmogorov–Smirnov ---------------------------------------

  /** D and the squared-critical-value rejection rule shared verbatim by
    * Spark and the oracle. `d_num = sup |cum_a·nb − cum_b·na|` is exact
    * integer; D = d_num/(na·nb); reject at 95% iff
    * D > 1.358·√((na+nb)/(na·nb)), squared to stay √-free:
    * d_num² > 1.358²·(na+nb)·na·nb (identical IEEE sequence over exact
    * integers on both engines — d_num fits a double exactly, only the
    * final square rounds, identically). */
  private val KsDExprSql: String =
    "CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
  private val KsRejectExprSql: String =
    "(CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE)) > " +
      "(1.844964 * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * " +
      "CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"

  /** KOLMOGOROV–SMIRNOV two-sample statistic per event_type between the
    * even/odd-user cohorts — the continuous-distribution drift test
    * (`q_tvd_drift` is its categorical sibling): D = sup_x |F_a(x) −
    * F_b(x)|. Kept EXACTLY integral by cross-multiplying the ECDFs —
    * `|cum_a·nb − cum_b·na|` maximized over distinct values is an integer
    * numerator over the constant denominator `na·nb` — so the statistic,
    * its 10⁻⁶-rounded quotient, and the squared-critical-value decision
    * ([[KsRejectExprSql]]) are all hash-exact.
    *
    * Scale shape: identical to [[mannWhitney]] — one map-side-combined
    * aggregate on (event_type, v_fp) collapses row scale to distinct-value
    * scale, then cumulative and total sums over that frame via
    * event_type-partitioned windows (never empty-key), then one aggregate
    * per type. */
  def ksTest(spark: SparkSession, sfDir: String): DataFrame = {
    val byValue = events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"),
        when(col("user_id") % 2 === 0, 1L).otherwise(0L).as("is_a"))
      .groupBy(col("event_type"), col("v_fp"))
      .agg(sum(col("is_a")).as("na_v"),
        (count(lit(1)) - sum(col("is_a"))).as("nb_v"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("v_fp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byValue
      .withColumn("cum_a", sum(col("na_v")).over(wCum))
      .withColumn("cum_b", sum(col("nb_v")).over(wCum))
      .withColumn("na", sum(col("na_v")).over(wAll))
      .withColumn("nb", sum(col("nb_v")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        max(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
          .as("d_num"))
      .withColumn("d_stat", Tables.portableRound6(expr(KsDExprSql)))
      .withColumn("reject", expr(KsRejectExprSql))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[ksTest]] — identical cross-multiplied ECDF algebra
    * and shared D / rejection expression strings. */
  def ksTestOracleSql: String =
    s"""WITH v AS (
       |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_fp,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
       |    CAST(count(*) - sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
       |  FROM events GROUP BY 1, 2
       |), c AS (
       |  SELECT event_type,
       |    sum(na_v) OVER (PARTITION BY event_type ORDER BY v_fp
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
       |    sum(nb_v) OVER (PARTITION BY event_type ORDER BY v_fp
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
       |    sum(na_v) OVER (PARTITION BY event_type) AS na,
       |    sum(nb_v) OVER (PARTITION BY event_type) AS nb
       |  FROM v
       |), g AS (
       |  SELECT event_type, CAST(max(na) AS BIGINT) AS na,
       |    CAST(max(nb) AS BIGINT) AS nb,
       |    CAST(max(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS d_num
       |  FROM c GROUP BY 1
       |)
       |SELECT event_type, na, nb, d_num,
       |  ${Tables.portableRound6Sql(KsDExprSql)} AS d_stat,
       |  $KsRejectExprSql AS reject
       |FROM g ORDER BY event_type""".stripMargin

  // ---- Benford leading-digit audit -----------------------------------------

  /** Benford expected frequencies `⌊log₁₀(1+1/d)·10⁶⌋` for d = 1..9,
    * precomputed once so BOTH engines consume identical integer literals
    * (log10 is not correctly-rounded libm — never evaluate it in-engine). */
  val BenfordPpm: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** BENFORD'S-LAW leading-digit audit per event_type — the
    * fraud/anomaly DQ primitive: observed leading-digit distribution of
    * positive `value`s (in 10⁻² fixed point so sub-unit values keep their
    * true leading digit) against the Benford expectation, emitted as
    * per-digit integer ppm with the signed deviation. No chi² scalar —
    * a cross-digit float sum would be association-ordered; the per-digit
    * rows ARE the audit and stay hash-exact.
    *
    * Leading digit extraction is `substr(CAST(bigint AS string), 1, 1)` —
    * integer-to-string never goes scientific on either engine, unlike
    * double formatting.
    *
    * Scale shape: one narrow projection + one map-side-combined aggregate
    * over ≤ |event_type|·9 keys; nothing else. */
  def benford(spark: SparkSession, sfDir: String): DataFrame = {
    val exp = typedLit(BenfordPpm)
    events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") >= 1L)
      .withColumn("digit",
        expr("CAST(substr(CAST(cents AS STRING), 1, 1) AS BIGINT)"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("n_type",
        sum(col("n_obs")).over(Window.partitionBy(col("event_type"))))
      .withColumn("obs_ppm", expr("n_obs * 1000000L div n_type"))
      .withColumn("exp_ppm", element_at(exp, col("digit").cast("int")))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select(col("event_type"), col("digit"), col("n_obs"), col("obs_ppm"),
        col("exp_ppm"), col("dev_ppm"))
      .orderBy(col("event_type"), col("digit"))
  }

  /** DuckDB twin of [[benford]] — same fixed point, digit rule, and the
    * SAME precomputed expectation literals. */
  def benfordOracleSql: String = {
    val expList = BenfordPpm.mkString("[", ", ", "]")
    s"""WITH c AS (
       |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
       |  FROM events
       |), d AS (
       |  SELECT event_type,
       |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM c WHERE cents >= 1
       |), g AS (
       |  SELECT event_type, digit, count(*) AS n_obs FROM d GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, digit, n_obs,
       |    CAST(sum(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
       |  FROM g
       |)
       |SELECT event_type, digit, n_obs,
       |  n_obs * 1000000 // n_type AS obs_ppm,
       |  CAST($expList[CAST(digit AS INT)] AS BIGINT) AS exp_ppm,
       |  n_obs * 1000000 // n_type - $expList[CAST(digit AS INT)] AS dev_ppm
       |FROM t ORDER BY event_type, digit""".stripMargin
  }

  // ---- data-quality expectation checks ------------------------------------

  /** Data-quality expectation suite over the star schema — the
    * dbt-test / Great-Expectations primitive as one operator: each rule
    * evaluates to a violation count, single-table rules COMPILE INTO ONE
    * conditional-aggregate scan per table (never a pass per rule — at
    * 100 TB the scan is the cost and rules are free riders on it), and
    * the referential rules are anti-join counts. Emits `(rule,
    * violations)` — a report whose all-zeros row set is the pass state.
    *
    * Scale shape: one scan per table + two anti-join aggregates; every
    * output is a scalar per rule. */
  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
    val od = orders(spark, sfDir)
    val liRow = li.agg(
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
      sum(when(col("l_quantity") < 0 || col("l_quantity") > 60, 1L)
        .otherwise(0L)).as("range_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
        .otherwise(0L)).as("range_disc")).head
    val odRow = od.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_pk"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust")).head
    val orphanLi = li.join(od.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_anti").count()
    val orphanOd = od.join(
      customer(spark, sfDir).select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey"), "left_anti").count()
    Seq(
      ("lineitem.l_quantity not null", liRow.getAs[Long]("null_qty")),
      ("lineitem.l_quantity in [0,60]", liRow.getAs[Long]("range_qty")),
      ("lineitem.l_discount in [0,1]", liRow.getAs[Long]("range_disc")),
      ("orders.o_orderkey unique", odRow.getAs[Long]("dup_pk")),
      ("orders.o_custkey not null", odRow.getAs[Long]("null_cust")),
      ("lineitem.l_orderkey references orders", orphanLi),
      ("orders.o_custkey references customer", orphanOd))
      .toDF("rule", "violations")
      .orderBy(col("rule"))
  }

  /** DuckDB twin of [[dqChecks]] — same rules, same anti-join semantics. */
  def dqChecksOracleSql: String =
    """SELECT rule, violations FROM (
      |  SELECT 'lineitem.l_quantity not null' AS rule,
      |    CAST(count(*) FILTER (l_quantity IS NULL) AS BIGINT) AS violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_quantity in [0,60]',
      |    CAST(count(*) FILTER (l_quantity < 0 OR l_quantity > 60) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_discount in [0,1]',
      |    CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders.o_orderkey unique',
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_custkey not null',
      |    CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey references orders',
      |    CAST((SELECT count(*) FROM lineitem
      |          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
      |  UNION ALL
      |  SELECT 'orders.o_custkey references customer',
      |    CAST((SELECT count(*) FROM orders
      |          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
      |) ORDER BY rule""".stripMargin

  // ---- distribution drift (total variation distance) ----------------------

  /** Value-bucket width for [[tvdDrift]]. */
  val DriftBucket = 50L

  /** Distribution drift between the first and second time halves of each
    * event series: values bucket at width [[DriftBucket]], per-half bucket
    * proportions go to 10⁻⁶ fixed point (`cnt·10⁶ div n`, truncating), and
    * the drift score is the total variation distance `Σ|p₁−p₂| div 2` —
    * the PSI/KL alternative with NO logarithm, so the whole metric is
    * integer-exact cross-engine (the no-transcendentals rule). The split
    * point is the integer midpoint of the observed µs range — a pure
    * function of the data. Per-type drift plus the per-bucket breakdown
    * feed monitoring and retraining triggers.
    *
    * Scale shape: one bucket-count aggregate keyed (type, half, bucket),
    * one full-outer self-merge per (type, bucket), one per-type sum. */
  def tvdDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        expr(s"CAST(floor(value / $DriftBucket) AS BIGINT)").as("bucket"))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val halves = ev.crossJoin(broadcast(bounds))
      .withColumn("half", when(col("us") * 2 <= col("lo") + col("hi"), 1L).otherwise(2L))
      .groupBy(col("event_type"), col("half"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val n = halves.groupBy(col("event_type"), col("half"))
      .agg(sum(col("cnt")).as("n"))
    val p = halves.join(n, Seq("event_type", "half"))
      .withColumn("p_fp", expr("(cnt * 1000000L) div n"))
    val p1 = p.filter(col("half") === 1L)
      .select(col("event_type"), col("bucket"), col("p_fp").as("p1"))
    val p2 = p.filter(col("half") === 2L)
      .select(col("event_type"), col("bucket"), col("p_fp").as("p2"))
    p1.join(p2, Seq("event_type", "bucket"), "full_outer")
      .select(col("event_type"),
        abs(coalesce(col("p1"), lit(0L)) - coalesce(col("p2"), lit(0L))).as("d"))
      .groupBy(col("event_type"))
      .agg(expr("sum(d) div 2").as("tvd_fp"), count(lit(1)).as("n_buckets"))
      .withColumn("tvd", col("tvd_fp").cast("double") / lit(1000000.0))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[tvdDrift]] — identical split, buckets, fixed-point
    * proportions, and TVD fold. */
  def tvdDriftOracleSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) AS us,
       |    CAST(floor(value / $DriftBucket) AS BIGINT) AS bucket
       |  FROM events
       |), b AS (
       |  SELECT min(us) AS lo, max(us) AS hi FROM ev
       |), halves AS (
       |  SELECT event_type,
       |    CASE WHEN us * 2 <= lo + hi THEN 1 ELSE 2 END AS half,
       |    bucket, count(*) AS cnt
       |  FROM ev, b GROUP BY 1, 2, 3
       |), n AS (
       |  SELECT event_type, half, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM halves GROUP BY 1, 2
       |), p AS (
       |  SELECT halves.event_type, halves.half, halves.bucket,
       |    (cnt * 1000000) // n.n AS p_fp
       |  FROM halves JOIN n USING (event_type, half)
       |), j AS (
       |  SELECT coalesce(p1.event_type, p2.event_type) AS event_type,
       |    abs(coalesce(p1.p_fp, 0) - coalesce(p2.p_fp, 0)) AS d
       |  FROM (SELECT * FROM p WHERE half = 1) p1
       |  FULL OUTER JOIN (SELECT * FROM p WHERE half = 2) p2
       |    ON p1.event_type = p2.event_type AND p1.bucket = p2.bucket
       |)
       |SELECT event_type, CAST(sum(d) // 2 AS BIGINT) AS tvd_fp,
       |  count(*) AS n_buckets,
       |  CAST(CAST(sum(d) // 2 AS BIGINT) AS DOUBLE) / 1000000.0 AS tvd
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- frequent itemset (market-basket) pair mining -----------------------

  /** Per-basket item cap / result size for [[basketPairs]]. */
  val BasketCap = 50
  val BasketTopK = 20

  /** Top-k co-occurring part pairs across order baskets with association
    * metrics — the frequent-itemset primitive (A-priori's k=2 level, which
    * dominates practical association mining): support (baskets containing
    * both), confidence P(b|a), and lift P(ab)/(P(a)·P(b)), the latter two
    * in truncating fixed point with a FIXED division order
    * (`((sup_ab·N) div sup_a)·10⁶ div sup_b` — both engines truncate
    * identically; headroom: sup_ab·N ≤ N², then ·10⁶ — safe to ~3·10⁶
    * baskets, one fixed-point digit per 10× beyond, the [[Graph.pageRank]]
    * scaling note pattern).
    *
    * Scale shape: per-basket fan-out capped at C([[BasketCap]], 2) BEFORE
    * the pair self-join (the [[Graph.cappedSuppliers]] rule — TPC-H
    * baskets hold ≤7 items, the cap is the power-law insurance), pair
    * counts shuffle on the (a, b) key with map-side combine,
    * TakeOrderedAndProject bounds the result, and the per-item support
    * join touches only the k survivors. */
  def basketPairs(spark: SparkSession, sfDir: String, cap: Int = BasketCap,
      k: Int = BasketTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT persisted (r15: measured a wash-to-regression) — the self-join
    // sides share one exchange via ReuseExchange, and the order-count /
    // support re-derivations are column-pruned scans; caching the distinct
    // frame traded those for a full materialization pass
    val li = lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = li.select(col("l_orderkey")).distinct().count()
    val sup = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
    val capped = li.withColumn("_rn", row_number().over(
        Window.partitionBy(col("l_orderkey")).orderBy(col("l_partkey"))))
      .filter(col("_rn") <= cap).drop("_rn")
    val top = capped.as("a").join(capped.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("sup_ab"))
      .orderBy(col("sup_ab").desc, col("part_a"), col("part_b"))
      .limit(k)
    val out = top
      .join(broadcast(sup.withColumnRenamed("l_partkey", "part_a")
        .withColumnRenamed("sup", "sup_a")), "part_a")
      .join(broadcast(sup.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("sup", "sup_b")), "part_b")
      .withColumn("conf_fp", expr("(sup_ab * 1000000L) div sup_a"))
      .withColumn("lift_fp",
        expr(s"((sup_ab * ${nOrders}L) div sup_a) * 1000000L div sup_b"))
      .select(col("part_a"), col("part_b"), col("sup_ab"), col("sup_a"),
        col("sup_b"), col("conf_fp"), col("lift_fp"))
      .orderBy(col("sup_ab").desc, col("part_a"), col("part_b"))
    out
  }

  /** DuckDB twin of [[basketPairs]] — same cap, tie order, and fixed
    * truncating-division order. */
  def basketPairsOracleSql(cap: Int = BasketCap, k: Int = BasketTopK): String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |), n AS (
       |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
       |), sup AS (
       |  SELECT l_partkey, count(*) AS sup FROM li GROUP BY l_partkey
       |), capped AS (
       |  SELECT l_orderkey, l_partkey FROM (
       |    SELECT l_orderkey, l_partkey,
       |      row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
       |    FROM li
       |  ) WHERE rn <= $cap
       |), top AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    count(*) AS sup_ab
       |  FROM capped a JOIN capped b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  ORDER BY sup_ab DESC, part_a, part_b LIMIT $k
       |)
       |SELECT part_a, part_b, top.sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
       |  (top.sup_ab * 1000000) // sa.sup AS conf_fp,
       |  ((top.sup_ab * n.n_orders) // sa.sup) * 1000000 // sb.sup AS lift_fp
       |FROM top
       |JOIN sup sa ON sa.l_partkey = part_a
       |JOIN sup sb ON sb.l_partkey = part_b, n
       |ORDER BY top.sup_ab DESC, part_a, part_b""".stripMargin

  // ---- rolling z-score anomaly detection ----------------------------------

  /** Rolling-window size / minimum history / threshold for [[anomalyZscore]]. */
  val AnomalyWindow = 20
  val AnomalyMinPrev = 8
  val AnomalyZ = 3

  /** Per-user rolling z-score anomaly flags over the event stream: an event
    * is anomalous when its value deviates from the mean of the user's
    * previous ≤[[AnomalyWindow]] events by more than [[AnomalyZ]] sample
    * standard deviations (at least [[AnomalyMinPrev]] events of history).
    * The self-referential rolling baseline is the standard first-pass
    * monitor for metric streams and data-quality drift.
    *
    * Determinism: the z-test is evaluated WITHOUT sqrt or division —
    * values enter 10⁻⁶ fixed point (`⌊v·10⁶⌋`, the [[decayAgg]] rule), and
    * `|v−μ| > z·σ` is squared out to `(n·v − S)² > z²·(n·Q − S²)` over the
    * window's exact integer sums S=Σv, Q=Σv² (multiply both sides by n²;
    * σ² here is the population variance over the window). Both sides are
    * DECIMAL(38,0)-exact: n·v ≤ 20·5·10⁸ = 10¹⁰ squares to 10²⁰ — past
    * BIGINT, inside decimal 38 — so the flag is bit-identical across
    * engines and partitionings where a double sqrt/mean pipeline would
    * diverge in the last ulp and flip boundary rows.
    *
    * Scale shape: ONE window pass partitioned by `user_id` (millions of
    * modest partitions at 100 TB — no hot key, unlike a per-event_type
    * partitioning whose handful of giant partitions would serialize;
    * exactly-20-row ROWS frames keep per-row state O(window)). Emits only
    * the flagged rows. */
  def anomalyZscore(spark: SparkSession, sfDir: String,
      window: Int = AnomalyWindow, minPrev: Int = AnomalyMinPrev,
      z: Int = AnomalyZ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-window, -1)
    events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"),
        expr("CAST(floor(value * 1000000) AS DECIMAL(38,0))").as("v_fp"))
      .withColumn("v2_fp", expr("v_fp * v_fp"))
      // all three aggregates declared over the SAME frame in ONE projection
      // so Catalyst fuses them into a single Window operator (one pass, one
      // sort) — chaining withColumns with a derived input splits the plan
      // into two Window nodes (PlanSpec-asserted)
      .select(col("*"),
        count(col("v_fp")).over(w).cast("long").as("n_prev"),
        sum(col("v_fp")).over(w).cast("decimal(38,0)").as("s_fp"),
        sum(col("v2_fp")).over(w).cast("decimal(38,0)").as("q_fp"))
      .filter(col("n_prev") >= minPrev &&
        expr(s"(n_prev * v_fp - s_fp) * (n_prev * v_fp - s_fp)" +
          s" > $z * $z * (n_prev * q_fp - s_fp * s_fp)"))
      .select(col("event_id"), col("ts_us"), col("user_id"), col("value"),
        col("n_prev"))
      .orderBy(col("event_id"))
  }

  /** DuckDB twin of [[anomalyZscore]] — identical fixed-point squared-out
    * z-test (DuckDB BIGINT products widen to HUGEINT, which covers the
    * 10²⁰ bound the same way Spark's DECIMAL(38,0) does). */
  def anomalyZscoreOracleSql(window: Int = AnomalyWindow,
      minPrev: Int = AnomalyMinPrev, z: Int = AnomalyZ): String =
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value,
       |    CAST(floor(value * 1000000) AS HUGEINT) AS v_fp
       |  FROM events
       |), roll AS (
       |  SELECT event_id, ts_us, user_id, value, v_fp,
       |    count(v_fp) OVER w AS n_prev,
       |    sum(v_fp) OVER w AS s_fp,
       |    sum(v_fp * v_fp) OVER w AS q_fp
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
       |               ROWS BETWEEN $window PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_id, ts_us, user_id, value, CAST(n_prev AS BIGINT) AS n_prev
       |FROM roll
       |WHERE n_prev >= $minPrev
       |  AND (n_prev * v_fp - s_fp) * (n_prev * v_fp - s_fp)
       |      > $z * $z * (n_prev * q_fp - s_fp * s_fp)
       |ORDER BY event_id""".stripMargin

  // ---- sequential path mining ---------------------------------------------

  /** Path length / result size for [[eventPaths]]. */
  val PathLen = 3
  val PathTopK = 20

  /** Top-k event-type trigram paths: each user's event sequence (ordered by
    * time, event_id tiebreak) contributes one path per sliding window of
    * [[PathLen]] consecutive events; paths are counted corpus-wide and the
    * [[PathTopK]] most frequent returned — the sequential-pattern shape
    * under funnel discovery, session-flow analysis, and next-event models
    * (the n-gram LM over the event alphabet rather than words).
    *
    * Scale shape: one window pass partitioned by `user_id` (two `lead`s,
    * same high-cardinality partitioning as [[anomalyZscore]]) and one
    * map-side-combined count whose key space is bounded by |event_type|³
    * (tiny), finished by TakeOrderedAndProject — no unbounded state
    * anywhere. */
  def eventPaths(spark: SparkSession, sfDir: String, k: Int = PathTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** DuckDB twin of [[eventPaths]] — same per-user order and tiebreaks. */
  def eventPathsOracleSql(k: Int = PathTopK): String =
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lead(event_type, 1) OVER w AS e2,
       |    lead(event_type, 2) OVER w AS e3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
       |)
       |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
       |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $k""".stripMargin

  // ---- percentile time series ---------------------------------------------

  /** Hourly p50/p95 TIME SERIES of `events.value` — the
    * latency-percentile-over-time panel every operational dashboard draws.
    * Discrete lower-percentile rule written as integer thresholds over the
    * unique (value, event_id) order (`2·rn ≥ n` / `20·rn ≥ 19·n`) — the
    * same cross-engine discipline as `q_median_disc` and
    * `q_weighted_quantile`, here PARTITIONED BY HOUR: one window pass per
    * hour bucket (embarrassingly parallel across buckets), one aggregate.
    * At 100 TB the hour partitioning is also the scan partitioning, so
    * each window sees one partition's rows — no global sort anywhere. */
  def percentileTs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val ev = events(spark, sfDir)
      .select(expr(s"unix_micros(ts) div $hourUs * $hourUs").as("hour_us"),
        col("event_id"), col("value"))
    val w = Window.partitionBy(col("hour_us"))
      .orderBy(col("value"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("hour_us"))))
      .groupBy(col("hour_us"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") * 2 >= col("n"), col("value"))).as("p50"),
        min(when(col("rn") * 20 >= col("n") * 19, col("value"))).as("p95"))
      .orderBy(col("hour_us"))
  }

  /** DuckDB twin of [[percentileTs]]. */
  def percentileTsOracleSql: String =
    s"""WITH ev AS (
       |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
       |    event_id, value
       |  FROM events
       |), r AS (
       |  SELECT hour_us, value,
       |    row_number() OVER (PARTITION BY hour_us ORDER BY value, event_id) AS rn,
       |    count(*) OVER (PARTITION BY hour_us) AS n
       |  FROM ev
       |)
       |SELECT CAST(hour_us AS BIGINT) AS hour_us, CAST(max(n) AS BIGINT) AS n,
       |  min(CASE WHEN rn * 2 >= n THEN value END) AS p50,
       |  min(CASE WHEN rn * 20 >= n * 19 THEN value END) AS p95
       |FROM r GROUP BY 1 ORDER BY hour_us""".stripMargin

  // ---- Markov transition matrix -------------------------------------------

  /** Event-type TRANSITION MATRIX — per (prev → cur) pair: count and the
    * row-normalized transition probability. The first-order Markov model
    * behind next-event prediction, anomaly scoring of session flows, and
    * the bigram reduction of [[eventPaths]]. Same per-user time order and
    * `event_id` tiebreak as every sequence operator here.
    *
    * Scale shape: one `lag` window partitioned by `user_id` (high
    * cardinality — parallel), one map-side-combined count on a key space
    * bounded by |event_type|², and a tiny broadcast join for the per-prev
    * totals. The probability division happens on the |types|²-row
    * aggregate, never per event. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val trans = events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    trans.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        Tables.portableRound6(
          col("n").cast("double") / col("row_total").cast("double")).as("p"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** DuckDB twin of [[markovTransitions]]. */
  def markovTransitionsOracleSql: String =
    s"""WITH seq AS (
       |  SELECT event_type,
       |    lag(event_type, 1) OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
       |  FROM events
       |), trans AS (
       |  SELECT prev_type, event_type, count(*) AS n
       |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
       |), totals AS (
       |  SELECT prev_type, sum(n) AS row_total FROM trans GROUP BY 1
       |)
       |SELECT t.prev_type, t.event_type, t.n,
       |  ${Tables.portableRound6Sql(
             "CAST(t.n AS DOUBLE) / CAST(tt.row_total AS DOUBLE)")} AS p
       |FROM trans t JOIN totals tt ON t.prev_type = tt.prev_type
       |ORDER BY t.prev_type, t.event_type""".stripMargin

  // ---- chi-squared independence test --------------------------------------

  /** Pearson CHI-SQUARED test of independence between `o_orderstatus` and
    * `o_orderpriority` — the categorical-association check a feature-
    * selection / data-drift pipeline runs over label×segment grids. The
    * full r×c grid participates (zero observed cells contribute their
    * expected mass), and the statistic is summed ORDER-INDEPENDENTLY:
    * each cell's (obs−exp)²/exp term is rounded to 6 dp and cast to
    * DECIMAL before the exact decimal SUM, so no engine's (or
    * partitioning's) FP summation order can leak into the result.
    *
    * Scale shape: one map-side-combined count over the fact table; all
    * grid algebra happens on the r·c-row aggregate (broadcast joins of
    * the r-row and c-row marginals). */
  def chiSquared(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = orders(spark, sfDir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy(col("o_orderstatus"))
      .agg(sum(col("obs")).as("rt"))
    val colTot = obs.groupBy(col("o_orderpriority"))
      .agg(sum(col("obs")).as("ct"))
    val grid = broadcast(rowTot).crossJoin(broadcast(colTot))
      .join(obs, Seq("o_orderstatus", "o_orderpriority"), "left")
      .withColumn("obs_n", coalesce(col("obs"), lit(0L)))
    val total = grid.agg(sum(col("obs_n"))).first().getLong(0)
    val term = (col("obs_n").cast("double") - col("exp")) *
      (col("obs_n").cast("double") - col("exp")) / col("exp")
    grid
      .withColumn("exp",
        col("rt").cast("double") * col("ct").cast("double") / lit(total.toDouble))
      .withColumn("term6", Tables.portableRound6(term).cast("decimal(28,6)"))
      .agg(count(lit(1)).as("n_cells"),
        countDistinct(col("o_orderstatus")).as("n_rows"),
        countDistinct(col("o_orderpriority")).as("n_cols"),
        sum(col("term6")).cast("double").as("chi2"))
      .withColumn("dof", ((col("n_rows") - 1) * (col("n_cols") - 1)).cast("long"))
      .select(col("n_cells"), col("n_rows"), col("n_cols"), col("dof"),
        col("chi2"))
  }

  /** DuckDB twin of [[chiSquared]] — identical grid, expected-mass rule,
    * and round-then-decimal-sum order independence. */
  def chiSquaredOracleSql: String = {
    val term = "(CAST(obs_n AS DOUBLE) - ex) * (CAST(obs_n AS DOUBLE) - ex) / ex"
    s"""WITH obs AS (
       |  SELECT o_orderstatus, o_orderpriority, count(*) AS obs
       |  FROM orders GROUP BY 1, 2
       |), rt AS (
       |  SELECT o_orderstatus, sum(obs) AS rt FROM obs GROUP BY 1
       |), ct AS (
       |  SELECT o_orderpriority, sum(obs) AS ct FROM obs GROUP BY 1
       |), grid AS (
       |  SELECT r.o_orderstatus, c.o_orderpriority, r.rt, c.ct,
       |    coalesce(o.obs, 0) AS obs_n
       |  FROM rt r CROSS JOIN ct c
       |  LEFT JOIN obs o ON o.o_orderstatus = r.o_orderstatus
       |    AND o.o_orderpriority = c.o_orderpriority
       |), ex AS (
       |  SELECT *, CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
       |    / (SELECT CAST(sum(obs_n) AS DOUBLE) FROM grid) AS ex
       |  FROM grid
       |)
       |SELECT count(*) AS n_cells,
       |  count(DISTINCT o_orderstatus) AS n_rows,
       |  count(DISTINCT o_orderpriority) AS n_cols,
       |  CAST((count(DISTINCT o_orderstatus) - 1)
       |    * (count(DISTINCT o_orderpriority) - 1) AS BIGINT) AS dof,
       |  CAST(sum(CAST(${Tables.portableRound6Sql(term)} AS DECIMAL(28,6)))
       |    AS DOUBLE) AS chi2
       |FROM ex""".stripMargin
  }

  // ---- weighted quantiles -------------------------------------------------

  /** WEIGHTED p50/p95 of `l_extendedprice` with `l_quantity` as the weight,
    * per `l_returnflag` — the estimator a pipeline needs when rows carry
    * unequal mass (tokens per document, bytes per file, quantity per line):
    * the unweighted median of line PRICES is not the median PRICE PER UNIT
    * SOLD. Longhand lower-weighted-percentile rule, written identically on
    * both engines: under the unique order (price, orderkey, linenumber),
    * the answer is the first price whose running weight reaches p·W —
    * `2·cumw ≥ W` / `20·cumw ≥ 19·W`, weights summed as exact DECIMAL so
    * no FP cumsum order can shift a boundary.
    *
    * Scale shape: one window pass partitioned by the group key (the same
    * shape as `q_median_disc`; for a single global group at 100 TB you'd
    * bucket by price range first — the two-phase form `q_equi_depth`
    * already demonstrates). */
  def weightedQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("l_returnflag"))
    val li = lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"),
        col("l_quantity").cast("decimal(28,6)").as("wgt"))
      .withColumn("cumw", sum(col("wgt")).over(w))
      .withColumn("wtot", sum(col("wgt")).over(wTot))
    li.groupBy(col("l_returnflag"))
      .agg(
        Tables.exactSum(col("l_quantity")).as("w_total"),
        min(when(col("cumw") * 2 >= col("wtot"), col("l_extendedprice")))
          .as("p50_w"),
        min(when(col("cumw") * 20 >= col("wtot") * 19, col("l_extendedprice")))
          .as("p95_w"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[weightedQuantile]] — identical unique order, decimal
    * cumsum, and threshold rule. */
  def weightedQuantileOracleSql: String =
    s"""WITH li AS (
       |  SELECT l_returnflag, l_extendedprice, l_quantity,
       |    CAST(l_quantity AS DECIMAL(28,6)) AS wgt,
       |    sum(CAST(l_quantity AS DECIMAL(28,6))) OVER (
       |      PARTITION BY l_returnflag
       |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
       |      ROWS UNBOUNDED PRECEDING) AS cumw,
       |    sum(CAST(l_quantity AS DECIMAL(28,6))) OVER (
       |      PARTITION BY l_returnflag) AS wtot
       |  FROM lineitem
       |)
       |SELECT l_returnflag,
       |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,4))), 2) AS DOUBLE) AS w_total,
       |  min(CASE WHEN cumw * 2 >= wtot THEN l_extendedprice END) AS p50_w,
       |  min(CASE WHEN cumw * 20 >= wtot * 19 THEN l_extendedprice END) AS p95_w
       |FROM li GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ---- Lorenz / concentration deciles -------------------------------------

  /** Fixed-point scale for [[lorenzDeciles]] shares (parts per million). */
  val LorenzFp = 1000000L

  /** REVENUE-CONCENTRATION deciles (Lorenz curve in fixed point) — rank
    * customers by lifetime revenue, cut into 10 equal-count bands with the
    * longhand `((rn−1)·10) div n` rule (NOT `ntile`, whose uneven-group
    * placement is engine-defined), and report each band's exact cent total
    * plus its ppm share and cumulative share. The imbalance audit behind
    * "10% of sources contribute 83% of tokens" decisions — and the
    * log-free alternative to a Gini scalar (the curve IS the statistic).
    *
    * Determinism: revenue sums in exact DECIMAL cents; shares are floor
    * integer division of exact integers, so no double appears anywhere.
    * The ppm multiply is SPLIT two-level (`(x·10³ div t)·10³ +
    * ((x·10³ mod t)·10³) div t` — exactly `floor(x·10⁶/t)`, same identity
    * as `q_pagerank`'s damping), so the worst operand is `tot·10³`:
    * BIGINT-safe to ~$92·10¹² corpus revenue instead of overflowing at
    * the cumulative row near $9·10¹² (which sf1 already reaches).
    *
    * Scale shape: one join-aggregate to per-customer revenue, then
    * [[Ranks.globalRank]]'s distributed range-sort + offset-join pass for
    * the (revenue, custkey) rank — NOT an empty-key `row_number` window,
    * which would plan Exchange SinglePartition and pull every customer row
    * through one task. The customer count and grand total join back as
    * broadcast 1-row aggregates, and the 10-row cumulative runs as a
    * broadcast `≤`-self-join over the bands frame — the whole plan carries
    * zero `windowspecdefinition`s (PlanSpec-asserted). */
  def lorenzDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select(col("l_orderkey"), col("l_extendedprice"))
    val od = orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val rev = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(28,2)")) * 100)
        .cast("long").as("rev_c"))
    val ranked = Ranks.globalRank(rev, "rn",
      Seq(col("rev_c").desc, col("o_custkey")))
    // count the customers from the rank's own eagerly-checkpointed frame
    // (globalRank preserves rows) — counting `rev` directly re-ran the
    // whole lineitem⋈orders join + aggregate a second time (r15)
    val nCust = ranked.agg(count(lit(1)).as("n_cust"))
    val bands = ranked
      .crossJoin(broadcast(nCust))
      .withColumn("decile", expr("((rn - 1) * 10) div n_cust"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("band_c"))
    val tot1 = bands.agg(sum(col("band_c")).as("tot_c"))
    // cumulative band revenue without a window: broadcast ≤-self-join over
    // the 10-row bands frame
    val cumSide = bands.select(col("decile").as("decile_le"), col("band_c").as("band_c_le"))
    val cum = bands.as("b")
      .join(broadcast(cumSide), col("decile_le") <= col("decile"))
      .groupBy(col("decile"), col("n_customers"), col("band_c"))
      .agg(sum(col("band_c_le")).as("cum_c"))
    cum
      .crossJoin(broadcast(tot1))
      .select(col("decile"), col("n_customers"), col("band_c").as("rev_cents"),
        expr("((band_c * 1000) div tot_c) * 1000 + ((band_c * 1000) % tot_c) * 1000 div tot_c")
          .as("share_ppm"),
        expr("((cum_c * 1000) div tot_c) * 1000 + ((cum_c * 1000) % tot_c) * 1000 div tot_c")
          .as("cum_share_ppm"))
      .orderBy(col("decile"))
  }

  /** DuckDB twin of [[lorenzDeciles]] — identical cent casts, band rule,
    * and floor fixed-point shares. */
  def lorenzDecilesOracleSql: String =
    s"""WITH rev AS (
       |  SELECT o_custkey,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) * 100 AS BIGINT) AS rev_c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1
       |), ranked AS (
       |  SELECT rev_c,
       |    row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rn,
       |    count(*) OVER () AS n_cust
       |  FROM rev
       |), bands AS (
       |  SELECT ((rn - 1) * 10) // n_cust AS decile,
       |    count(*) AS n_customers, CAST(sum(rev_c) AS BIGINT) AS band_c
       |  FROM ranked GROUP BY 1
       |), totals AS (
       |  SELECT decile, n_customers, band_c,
       |    CAST(sum(band_c) OVER () AS BIGINT) AS tot_c,
       |    CAST(sum(band_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_c
       |  FROM bands
       |)
       |SELECT decile, n_customers, band_c AS rev_cents,
       |  ((band_c * 1000) // tot_c) * 1000 + ((band_c * 1000) % tot_c) * 1000 // tot_c AS share_ppm,
       |  ((cum_c * 1000) // tot_c) * 1000 + ((cum_c * 1000) % tot_c) * 1000 // tot_c AS cum_share_ppm
       |FROM totals ORDER BY decile""".stripMargin

  /** Touch channels for [[attribution]], shared with the oracle. */
  val AttributionTouchTypes = Seq("click", "view")

  /** REVENUE ATTRIBUTION — first-touch and last-touch in one pass: every
    * `purchase` event's value is credited to the user's first (and,
    * separately, most recent) preceding touch event (`click`/`view`);
    * purchases with no preceding touch credit the `direct` channel. The
    * companion analytic to [[funnel]]: the funnel counts conversions, the
    * attribution splits the converted VALUE across acquisition channels —
    * the number a marketing-mix budget is set against.
    *
    * Spark-first shape: ONE user-keyed window pass computes both models
    * (`first`/`last` with ignoreNulls over the strictly-preceding frame —
    * no self-join, no per-purchase lookup join), then two
    * channel-cardinality aggregates full-outer-merged. Sums are DECIMAL
    * cast to double once — order-independent, oracle-exact. At fleet
    * scale the window partitions by user (millions of small partitions,
    * embarrassingly parallel), never a global sort. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, sfDir).select(col("user_id"), col("event_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = ev
      .withColumn("touch",
        when(col("event_type").isin(AttributionTouchTypes: _*),
          col("event_type")))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(w))
    val purchases = touched.filter(col("event_type") === "purchase")
      .select(coalesce(col("last_touch"), lit("direct")).as("last_ch"),
        coalesce(col("first_touch"), lit("direct")).as("first_ch"),
        col("value"))
    val lastAgg = purchases.groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("n_last"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("value_last"))
    val firstAgg = purchases.groupBy(col("first_ch").as("channel"))
      .agg(count(lit(1)).as("n_first"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("value_first"))
    lastAgg.join(firstAgg, Seq("channel"), "full")
      .na.fill(0L, Seq("n_last", "n_first"))
      .na.fill(0.0, Seq("value_last", "value_first"))
      .select(col("channel"), col("n_last"), col("value_last"),
        col("n_first"), col("value_first"))
      .orderBy(col("channel"))
  }

  /** DuckDB twin of [[attribution]] — IGNORE NULLS window forms, identical
    * frames, decimal sums. */
  def attributionOracleSql: String = {
    val touches = AttributionTouchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
       |  FROM events
       |), t AS (
       |  SELECT *, CASE WHEN event_type IN ($touches) THEN event_type END AS touch
       |  FROM e
       |), wnd AS (
       |  SELECT *,
       |    last_value(touch IGNORE NULLS) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
       |    first_value(touch IGNORE NULLS) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
       |  FROM t
       |), p AS (
       |  SELECT coalesce(last_touch, 'direct') AS last_ch,
       |    coalesce(first_touch, 'direct') AS first_ch, value
       |  FROM wnd WHERE event_type = 'purchase'
       |), la AS (
       |  SELECT last_ch AS channel, count(*) AS n_last,
       |    CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value_last
       |  FROM p GROUP BY 1
       |), fa AS (
       |  SELECT first_ch AS channel, count(*) AS n_first,
       |    CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value_first
       |  FROM p GROUP BY 1
       |)
       |SELECT coalesce(la.channel, fa.channel) AS channel,
       |  CAST(coalesce(la.n_last, 0) AS BIGINT) AS n_last,
       |  coalesce(la.value_last, 0.0) AS value_last,
       |  CAST(coalesce(fa.n_first, 0) AS BIGINT) AS n_first,
       |  coalesce(fa.value_first, 0.0) AS value_first
       |FROM la FULL JOIN fa ON la.channel = fa.channel
       |ORDER BY channel""".stripMargin
  }

  /** CUSUM CHANGEPOINT SCAN — where did a series' level shift? Per
    * (event_type, day): the daily count, its INTEGER-SCALED deviation from
    * the series mean (`n·n_days − total` = n_days·(n − mean), exact — no
    * FP mean ever computed), the running cumulative deviation, and a flag
    * on the day where |cusum| peaks — the classic changepoint estimate
    * (the cumulative sum of deviations turns exactly where the level
    * shifts). The drift-detection sibling of `q_anomaly` (point outliers)
    * and `q_trend` (global slope): this one localizes WHEN the regime
    * changed.
    *
    * Scale shape: one (type, day)-keyed count, a per-type 1-row total
    * broadcast, and a per-type running-sum window — |types| partitions of
    * |days| rows each (window state is days-per-series, never row-scale).
    * All arithmetic BIGINT: cusum magnitudes are bounded by
    * n_days²·max_daily ≈ 10¹² here, far under overflow. */
  def cusumChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val totals = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    daily.join(broadcast(totals), Seq("event_type"))
      .withColumn("dev_scaled", col("n") * col("n_days") - col("total"))
      .withColumn("cusum", sum(col("dev_scaled")).over(wRun))
      .withColumn("is_changepoint",
        abs(col("cusum")) === max(abs(col("cusum"))).over(wAll) &&
          abs(col("cusum")) > 0L)
      .select(col("event_type"), col("day"), col("n"), col("dev_scaled"),
        col("cusum"), col("is_changepoint"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB twin of [[cusumChangepoint]] — identical integer scaling and
    * peak rule. */
  def cusumChangepointOracleSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
       |    count(*) AS n_days
       |  FROM daily GROUP BY 1
       |), d AS (
       |  SELECT daily.event_type, daily.day, CAST(daily.n AS BIGINT) AS n,
       |    CAST(daily.n * t.n_days - t.total AS BIGINT) AS dev_scaled
       |  FROM daily JOIN t ON daily.event_type = t.event_type
       |), c AS (
       |  SELECT *, CAST(sum(dev_scaled) OVER (PARTITION BY event_type
       |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
       |  FROM d
       |)
       |SELECT event_type, CAST(day AS BIGINT) AS day, n, dev_scaled, cusum,
       |  abs(cusum) = max(abs(cusum)) OVER (PARTITION BY event_type)
       |    AND abs(cusum) > 0 AS is_changepoint
       |FROM c ORDER BY event_type, day""".stripMargin

  /** DAY-OF-WEEK SEASONALITY DECOMPOSITION — split each series' daily
    * counts into a weekday profile and residuals: per (event_type, dow)
    * the exact mean daily count, and per day the residual `n − dow_mean`
    * (what remains after removing the weekly cycle — the input an anomaly
    * threshold should apply to when traffic has a weekly rhythm). Day 0
    * (1970-01-01) is a Thursday; `dow` is `(day + 4) mod 7` with 0 =
    * Sunday, matching DuckDB's `dayofweek`.
    *
    * Scale shape: one (type, day) count, one (type, dow)-keyed exact
    * average (≤ |types|·7 groups), one broadcast join back. */
  def dowSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val profile = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        Tables.exactAvg(col("n").cast("double")).as("dow_avg"))
    daily.join(broadcast(profile), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        col("n_days"), col("dow_avg"),
        Tables.portableRound6(col("n").cast("double") - col("dow_avg"))
          .as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB twin of [[dowSeasonality]]. */
  def dowSeasonalityOracleSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), d AS (
       |  SELECT event_type, day, CAST(n AS BIGINT) AS n,
       |    (day + 4) % 7 AS dow
       |  FROM daily
       |), p AS (
       |  SELECT event_type, dow, count(*) AS n_days,
       |    ${Tables.exactAvgSql("n")} AS dow_avg
       |  FROM d GROUP BY 1, 2
       |)
       |SELECT d.event_type, CAST(d.day AS BIGINT) AS day,
       |  CAST(d.dow AS BIGINT) AS dow, d.n,
       |  CAST(p.n_days AS BIGINT) AS n_days, p.dow_avg,
       |  ${Tables.portableRound6Sql("CAST(d.n AS DOUBLE) - p.dow_avg")} AS residual
       |FROM d JOIN p ON d.event_type = p.event_type AND d.dow = p.dow
       |ORDER BY d.event_type, d.day""".stripMargin

  // ---- autocorrelation function ---------------------------------------------

  /** Pearson ACF numerator/denominator shared verbatim with the oracle:
    * every Σ is an exact BIGINT over hourly counts, so `num` is exact; the
    * denominators are products of exact ints evaluated in DOUBLE (identical
    * IEEE sequence on both engines), and `sqrt` is correctly rounded by
    * IEEE-754, so the final quotient is bit-identical before the shared
    * 10⁻⁶ rounding. */
  private val AcfRExprSql: String =
    "CAST(num AS DOUBLE) / sqrt(" +
      "(CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(np AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"

  /** AUTOCORRELATION of each event-type's hourly count series at lags 1-3 —
    * the "does this metric have memory?" screen an anomaly detector or
    * forecaster runs before choosing a model (a flat ACF says thresholds
    * suffice; a slow-decaying one says seasonal/trended). Computed as the
    * Pearson correlation between the series and its lag-k shift over the
    * hours where both exist, with every sum exact integer ([[AcfRExprSql]]).
    * Headroom bound (same class as [[fano]]'s): `num = np·Σxy − Σx·Σy`
    * multiplies BIGINT sums of hourly-count products, so per-series hourly
    * counts must keep `Σxy` (and `np·Σxy`) under 2⁶³ — counts ≪ 2³¹ over
    * ≤ 2³¹ joined hours, which holds at any realistic telemetry rate
    * (2 B events/hour/type for a century ≈ the limit). Past it, route the
    * count frame through DECIMAL(38,0) the way [[gini]] does — ANSI mode
    * throws loudly rather than wrapping, so breach is visible.
    *
    * Scale shape: ONE map-side-combined aggregate collapses row scale to
    * (type, hour) scale — everything after runs on the tiny count frame: a
    * 3-row lag explode, an equi-join on (type, hour+lag), one aggregate per
    * (type, lag). At 100 TB the only big-data pass is the first count. */
  def acf(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val lagged = counts.select(col("event_type"), col("h"), col("cnt"),
      explode(expr("array(1L, 2L, 3L)")).as("lag"))
    lagged.as("a")
      .join(counts.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") + col("a.lag") === col("b.h"))
      .groupBy(col("a.event_type").as("event_type"), col("a.lag").as("lag"))
      .agg(count(lit(1)).as("np"),
        sum(col("a.cnt")).as("sx"), sum(col("b.cnt")).as("sy"),
        sum(col("a.cnt") * col("a.cnt")).as("sxx"),
        sum(col("b.cnt") * col("b.cnt")).as("syy"),
        sum(col("a.cnt") * col("b.cnt")).as("sxy"))
      .withColumn("num", col("np") * col("sxy") - col("sx") * col("sy"))
      .withColumn("acf", Tables.portableRound6(expr(AcfRExprSql)))
      .select(col("event_type"), col("lag"), col("np"), col("num"), col("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** DuckDB twin of [[acf]] — identical integer sums and shared r
    * expression string. */
  def acfOracleSql: String =
    s"""WITH c AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), p AS (
       |  SELECT a.event_type, l.lag, a.cnt AS xa, b.cnt AS xb
       |  FROM c a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
       |  JOIN c b ON a.event_type = b.event_type AND a.h + l.lag = b.h
       |), g AS (
       |  SELECT event_type, CAST(lag AS BIGINT) AS lag,
       |    count(*) AS np,
       |    CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
       |    CAST(sum(xa * xa) AS BIGINT) AS sxx,
       |    CAST(sum(xb * xb) AS BIGINT) AS syy,
       |    CAST(sum(xa * xb) AS BIGINT) AS sxy
       |  FROM p GROUP BY 1, 2
       |), n AS (
       |  SELECT *, np * sxy - sx * sy AS num FROM g
       |)
       |SELECT event_type, lag, np, num,
       |  ${Tables.portableRound6Sql(AcfRExprSql)} AS acf
       |FROM n ORDER BY event_type, lag""".stripMargin

  // ---- multi-feature OLS via normal equations -------------------------------

  /** Cramer-rule determinants for the 3×3 normal equations of
    * `y ~ b0 + b1·x1 + b2·x2`, shared verbatim with the oracle. Inputs are
    * exact BIGINT sums; the determinant arithmetic runs in DOUBLE because
    * triple products overflow BIGINT — but as a fixed expression tree over
    * identical ints it is the same IEEE sequence on both engines. */
  private def olsD(s: String) = s"CAST($s AS DOUBLE)"
  private val OlsDetSql: String =
    s"(${olsD("n")} * (${olsD("s11")} * ${olsD("s22")} - ${olsD("s12")} * ${olsD("s12")}) - " +
      s"${olsD("s1")} * (${olsD("s1")} * ${olsD("s22")} - ${olsD("s12")} * ${olsD("s2")}) + " +
      s"${olsD("s2")} * (${olsD("s1")} * ${olsD("s12")} - ${olsD("s11")} * ${olsD("s2")}))"
  private val OlsDet0Sql: String =
    s"(${olsD("sy")} * (${olsD("s11")} * ${olsD("s22")} - ${olsD("s12")} * ${olsD("s12")}) - " +
      s"${olsD("s1")} * (${olsD("s1y")} * ${olsD("s22")} - ${olsD("s12")} * ${olsD("s2y")}) + " +
      s"${olsD("s2")} * (${olsD("s1y")} * ${olsD("s12")} - ${olsD("s11")} * ${olsD("s2y")}))"
  private val OlsDet1Sql: String =
    s"(${olsD("n")} * (${olsD("s1y")} * ${olsD("s22")} - ${olsD("s2y")} * ${olsD("s12")}) - " +
      s"${olsD("sy")} * (${olsD("s1")} * ${olsD("s22")} - ${olsD("s12")} * ${olsD("s2")}) + " +
      s"${olsD("s2")} * (${olsD("s1")} * ${olsD("s2y")} - ${olsD("s1y")} * ${olsD("s2")}))"
  private val OlsDet2Sql: String =
    s"(${olsD("n")} * (${olsD("s11")} * ${olsD("s2y")} - ${olsD("s12")} * ${olsD("s1y")}) - " +
      s"${olsD("s1")} * (${olsD("s1")} * ${olsD("s2y")} - ${olsD("s1y")} * ${olsD("s2")}) + " +
      s"${olsD("sy")} * (${olsD("s1")} * ${olsD("s12")} - ${olsD("s11")} * ${olsD("s2")}))"

  /** MULTI-FEATURE OLS fit per event_type — `value ~ b0 + b1·hour_of_day +
    * b2·day_of_week` solved in closed form from the normal equations (the
    * `q_trend` single-feature gate's big sibling; the "is there a daily or
    * weekly level shift?" screen run before detrending). The target is the
    * 10⁻⁶ fixed-point of `value` so all nine sufficient statistics are
    * exact BIGINTs; the 3×3 Cramer solve ([[OlsDetSql]]) is a shared
    * DOUBLE expression.
    *
    * Scale shape: the entire computation is ONE map-side-combined aggregate
    * per event_type — nine integer sums; at 100 TB it is a single scan with
    * a |types|-row shuffle, the cheapest possible distributed regression
    * (the same sufficient-statistics shape a tree-aggregated
    * `LinearRegression.fit` uses, without the driver round-trips). */
  def ols(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("x1"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("x2"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      .withColumn("beta0", Tables.portableRound6(expr(s"$OlsDet0Sql / $OlsDetSql / 1000000.0")))
      .withColumn("beta1", Tables.portableRound6(expr(s"$OlsDet1Sql / $OlsDetSql / 1000000.0")))
      .withColumn("beta2", Tables.portableRound6(expr(s"$OlsDet2Sql / $OlsDetSql / 1000000.0")))
      .select(col("event_type"), col("n"), col("sy"), col("beta0"),
        col("beta1"), col("beta2"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[ols]] — identical integer sufficient statistics and
    * shared Cramer expression strings. */
  def olsOracleSql: String =
    s"""WITH b AS (
       |  SELECT event_type,
       |    (epoch_us(ts) // 3600000000) % 24 AS x1,
       |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS x2,
       |    CAST(floor(value * 1000000) AS BIGINT) AS y
       |  FROM events
       |), g AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
       |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
       |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
       |    CAST(sum(x2 * y) AS BIGINT) AS s2y
       |  FROM b GROUP BY 1
       |)
       |SELECT event_type, n, sy,
       |  ${Tables.portableRound6Sql(s"$OlsDet0Sql / $OlsDetSql / 1000000.0")} AS beta0,
       |  ${Tables.portableRound6Sql(s"$OlsDet1Sql / $OlsDetSql / 1000000.0")} AS beta1,
       |  ${Tables.portableRound6Sql(s"$OlsDet2Sql / $OlsDetSql / 1000000.0")} AS beta2
       |FROM g ORDER BY event_type""".stripMargin

  // ---- MAD robust outliers --------------------------------------------------

  /** ROBUST OUTLIER COUNT per event_type via the median-absolute-deviation
    * rule — the outlier screen that survives the outliers it hunts (the
    * mean/stddev z-score of `q_outliers` is dragged by the very tail it
    * flags; median/MAD has a 50% breakdown point). A value is an outlier
    * when `|v − med| > 3·1.4826·MAD`, kept EXACTLY integral by fixed-point
    * cross-multiplication: `|dev|·10000 > 44478·MAD` over 10⁻⁶ fixed-point
    * values — no doubles anywhere, so the gate is hash-exact by
    * construction.
    *
    * Both medians use the longhand `percentile_disc` rule proven portable
    * by `q_median_disc` (rank == (n+1) div 2 — selected values verbatim,
    * ties permute rank but not the selected VALUE).
    *
    * Scale shape: two per-type rank windows (never empty-key) + one
    * broadcast of the |types|-row median frame. The exact baseline of the
    * `approx_percentile` path a 100 TB deployment would swap in. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val v = events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"))
    val w1 = Window.partitionBy(col("event_type")).orderBy(col("v_fp"))
    val wAll = Window.partitionBy(col("event_type"))
    val med = v
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("v_fp").as("med"))
    val dev = v.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("v_fp") - col("med")))
    val w2 = Window.partitionBy(col("event_type")).orderBy(col("dev"))
    val mad = dev
      .withColumn("rn", row_number().over(w2))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("dev").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") * 10000L > lit(44478L) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_ppm",
        expr("(n_outliers * 1000000) div n"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[madOutliers]] — identical longhand medians and the
    * same integer fixed-point threshold. */
  def madOutliersOracleSql: String =
    """WITH v AS (
      |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_fp
      |  FROM events
      |), r AS (
      |  SELECT event_type, v_fp,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v_fp) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM v
      |), med AS (
      |  SELECT event_type, v_fp AS med FROM r WHERE rn = (n + 1) // 2
      |), d AS (
      |  SELECT v.event_type, abs(v.v_fp - med.med) AS dev, med.med
      |  FROM v JOIN med ON v.event_type = med.event_type
      |), rd AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM d
      |), mad AS (
      |  SELECT event_type, dev AS mad FROM rd WHERE rn = (n + 1) // 2
      |)
      |SELECT d.event_type, count(*) AS n,
      |  CAST(max(d.med) AS BIGINT) AS med, CAST(max(mad.mad) AS BIGINT) AS mad,
      |  CAST(sum(CASE WHEN d.dev * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  CAST((sum(CASE WHEN d.dev * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END) * 1000000)
      |    // count(*) AS BIGINT) AS outlier_ppm
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- winsorized mean ------------------------------------------------------

  /** WINSORIZED MEAN per event_type — clamp every value to the exact
    * discrete [p5, p95] band, then average: the robust location estimate
    * that keeps the sample size (unlike trimming) while bounding each
    * tail's leverage — the standard pre-aggregation step before a
    * latency/revenue mean is reported. Percentile selection is the longhand
    * `percentile_disc` rule proven portable by `q_median_disc` (rank ==
    * ⌈q·n⌉, value verbatim); clamping is integer; the two means use the
    * order-independent decimal [[Tables.exactAvg]].
    *
    * Scale shape: one per-type rank window + a broadcast of the |types|-row
    * band frame + one map-side-combined aggregate. The exact baseline of
    * the `approx_percentile`-banded form a 100 TB job would run. */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val v = events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v_fp"))
    val wAll = Window.partitionBy(col("event_type"))
    val bands = v
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === expr("(n + 19) div 20"), col("v_fp"))).as("p5"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("v_fp"))).as("p95"))
    v.join(broadcast(bands), Seq("event_type"))
      .withColumn("v_clamp", greatest(col("p5"), least(col("p95"), col("v_fp"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("p5")).as("p5"),
        max(col("p95")).as("p95"),
        Tables.exactAvg(col("v_fp").cast("double") / lit(1000000.0)).as("mean_raw"),
        Tables.exactAvg(col("v_clamp").cast("double") / lit(1000000.0)).as("mean_winsor"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[winsorize]] — identical rank rule, clamp, and exact
    * decimal averages. */
  def winsorizeOracleSql: String =
    s"""WITH v AS (
       |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_fp
       |  FROM events
       |), r AS (
       |  SELECT event_type, v_fp,
       |    row_number() OVER (PARTITION BY event_type ORDER BY v_fp) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM v
       |), b AS (
       |  SELECT event_type,
       |    max(CASE WHEN rn = (n + 19) // 20 THEN v_fp END) AS p5,
       |    max(CASE WHEN rn = (19 * n + 19) // 20 THEN v_fp END) AS p95
       |  FROM r GROUP BY 1
       |), c AS (
       |  SELECT v.event_type, v.v_fp, b.p5, b.p95,
       |    greatest(b.p5, least(b.p95, v.v_fp)) AS v_clamp
       |  FROM v JOIN b ON v.event_type = b.event_type
       |)
       |SELECT event_type, count(*) AS n,
       |  CAST(max(p5) AS BIGINT) AS p5, CAST(max(p95) AS BIGINT) AS p95,
       |  ${Tables.exactAvgSql("CAST(v_fp AS DOUBLE) / 1000000.0")} AS mean_raw,
       |  ${Tables.exactAvgSql("CAST(v_clamp AS DOUBLE) / 1000000.0")} AS mean_winsor
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- seasonal-naive forecast baseline -------------------------------------

  /** SEASONAL-NAIVE FORECAST EVALUATION — score the forecaster every real
    * model must beat: predict each hour's event count by the SAME HOUR LAST
    * WEEK (lag 168) and report the exact MAE and bias per event_type over
    * the evaluable hours. This is the M-competition baseline and the
    * capacity-planning sanity check; a model whose MAE is not under this
    * gate's number is worse than no model. All errors are exact integers
    * (counts minus counts); only the final means take the shared
    * order-independent decimal average.
    *
    * Scale shape: same as [[acf]] — ONE row-scale aggregate to (type, hour)
    * counts, then a lag-168 equi-join and a |types|-key aggregate on the
    * tiny count frame. Hours missing in either week simply drop from the
    * join: the baseline is scored where it is defined. */
  def seasonalNaive(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    counts.as("a")
      .join(counts.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") + 168L === col("b.h"))
      .select(col("a.event_type").as("event_type"),
        (col("b.cnt") - col("a.cnt")).as("err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("err"))).as("abs_err_total"),
        sum(col("err")).as("bias_total"),
        Tables.exactAvg(abs(col("err")).cast("double")).as("mae"),
        Tables.exactAvg(col("err").cast("double")).as("bias"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[seasonalNaive]] — identical lag join and exact
    * decimal means. */
  def seasonalNaiveOracleSql: String =
    s"""WITH c AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), e AS (
       |  SELECT a.event_type, b.cnt - a.cnt AS err
       |  FROM c a JOIN c b ON a.event_type = b.event_type AND a.h + 168 = b.h
       |)
       |SELECT event_type, count(*) AS n_hours,
       |  CAST(sum(abs(err)) AS BIGINT) AS abs_err_total,
       |  CAST(sum(err) AS BIGINT) AS bias_total,
       |  ${Tables.exactAvgSql("CAST(abs(err) AS DOUBLE)")} AS mae,
       |  ${Tables.exactAvgSql("CAST(err AS DOUBLE)")} AS bias
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- burstiness (Fano factor) ---------------------------------------------

  /** Fano quotient shared verbatim with the oracle: population
    * variance/mean over exact integer sums —
    * `(N·Σx² − (Σx)²) / (N·Σx)` — one double division over exact BIGINTs. */
  private val FanoExprSql: String =
    "CAST(nh * sxx - sx * sx AS DOUBLE) / CAST(nh * sx AS DOUBLE)"

  /** BURSTINESS per event_type — the FANO FACTOR (variance-to-mean ratio)
    * of the hourly count series: the Poisson dispersion test every
    * capacity planner runs before sizing for average load (Fano ≈ 1 →
    * Poisson arrivals, smooth; Fano ≫ 1 → bursty, provision for peaks;
    * the `is_bursty` flag uses the exact integer cross-multiplied form of
    * `variance > 2·mean`). Numerator and denominator are exact BIGINTs
    * ([[FanoExprSql]]); only the final quotient is IEEE, shared with the
    * oracle.
    *
    * Scale shape: identical to [[acf]]/[[seasonalNaive]] — ONE row-scale
    * map-side-combined count collapses to (type, hour), then one
    * |types|-key aggregate. Count magnitudes must keep `Σx²` under 2⁶³
    * (hourly counts ≪ 2³¹ per series — holds at any realistic telemetry
    * rate; past it, bucket the count frame to DECIMAL). */
  def fano(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum(col("cnt")).as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
      .withColumn("fano", Tables.portableRound6(expr(FanoExprSql)))
      .withColumn("is_bursty",
        col("nh") * col("sxx") - col("sx") * col("sx") >
          lit(2L) * col("nh") * col("sx"))
      .select(col("event_type"), col("nh"), col("sx"), col("sxx"),
        col("fano"), col("is_bursty"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[fano]] — identical integer sums, shared quotient,
    * and the same cross-multiplied burstiness rule. */
  def fanoOracleSql: String =
    s"""WITH c AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), g AS (
       |  SELECT event_type, count(*) AS nh,
       |    CAST(sum(cnt) AS BIGINT) AS sx,
       |    CAST(sum(cnt * cnt) AS BIGINT) AS sxx
       |  FROM c GROUP BY 1
       |)
       |SELECT event_type, nh, sx, sxx,
       |  ${Tables.portableRound6Sql(FanoExprSql)} AS fano,
       |  (nh * sxx - sx * sx) > 2 * nh * sx AS is_bursty
       |FROM g ORDER BY event_type""".stripMargin

  // ---- SAX symbolization ----------------------------------------------------

  /** Number of PAA segments and the squared ±0.6745 z-breakpoint (the
    * Gaussian quartiles of the classic 4-symbol SAX alphabet), shared with
    * the oracle. 0.6745² = 0.45495025. */
  val SaxSegments = 8
  private val SaxBetaSq = "0.45495025"

  /** Symbol rule shared verbatim with the oracle — entirely sqrt-free:
    * with `d = sum_s·N − Sx·n_s` (exact int, the sign of `PAA_s − μ`) and
    * `varnum = N·Σx² − Sx²` (exact int, N²·σ²), the z-breakpoint compare
    * `|z| vs 0.6745` cross-multiplies to `d² vs 0.6745²·n_s²·varnum` —
    * one double product tree over exact ints on both engines. */
  private val SaxSymbolCaseSql: String =
    s"""CASE
       |  WHEN d < 0 AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE) >
       |    $SaxBetaSq * CAST(n_s AS DOUBLE) * CAST(n_s AS DOUBLE) * CAST(varnum AS DOUBLE)
       |    THEN 'a'
       |  WHEN d < 0 THEN 'b'
       |  WHEN CAST(d AS DOUBLE) * CAST(d AS DOUBLE) >
       |    $SaxBetaSq * CAST(n_s AS DOUBLE) * CAST(n_s AS DOUBLE) * CAST(varnum AS DOUBLE)
       |    THEN 'd'
       |  ELSE 'c' END""".stripMargin

  /** SAX SYMBOLIZATION per event_type — the classic time-series
    * representation (Lin/Keogh's Symbolic Aggregate approXimation): the
    * hourly count series is piecewise-aggregate-approximated into
    * [[SaxSegments]] equal time segments, z-normalized against the
    * series' own mean/σ, and each segment mapped to one of 4 symbols at
    * the Gaussian-quartile breakpoints — the 8-character "shape word"
    * that lets a TSDB index, cluster, and motif-search millions of series
    * by string equality instead of numeric distance. Every comparison is
    * cross-multiplied to exact-integer or shared-double form
    * ([[SaxSymbolCaseSql]]) — no sqrt, no libm.
    *
    * Scale shape: one row-scale (type, hour) count, one (type, segment)
    * aggregate, one |types|-row totals frame broadcast back, one ordered
    * string-agg per type. Constant work after the first count. */
  def sax(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
        count(lit(1)).as("nh"), sum(col("cnt")).as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
      .withColumn("varnum", col("nh") * col("sxx") - col("sx") * col("sx"))
    val segs = counts.join(broadcast(totals), Seq("event_type"))
      .withColumn("seg",
        expr(s"((h - h0) * $SaxSegments) div (h1 - h0 + 1)"))
      .groupBy(col("event_type"), col("seg"))
      .agg(count(lit(1)).as("n_s"), sum(col("cnt")).as("sum_s"),
        max(col("nh")).as("nh"), max(col("sx")).as("sx"),
        max(col("varnum")).as("varnum"))
      .withColumn("d", col("sum_s") * col("nh") - col("sx") * col("n_s"))
      .withColumn("sym", expr(SaxSymbolCaseSql))
    segs.groupBy(col("event_type"))
      .agg(max(col("nh")).as("n_hours"),
        array_join(transform(array_sort(collect_list(struct(col("seg"),
          col("sym")))), x => x.getField("sym")), "").as("sax_word"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[sax]] — identical segment grid, cross-multiplied
    * symbol rule, and segment-ordered word assembly. */
  def saxOracleSql: String =
    s"""WITH c AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, min(h) AS h0, max(h) AS h1, count(*) AS nh,
       |    CAST(sum(cnt) AS BIGINT) AS sx,
       |    CAST(sum(cnt * cnt) AS BIGINT) AS sxx,
       |    CAST(count(*) * sum(cnt * cnt) - sum(cnt) * sum(cnt) AS BIGINT) AS varnum
       |  FROM c GROUP BY 1
       |), s AS (
       |  SELECT c.event_type, ((c.h - t.h0) * $SaxSegments) // (t.h1 - t.h0 + 1) AS seg,
       |    count(*) AS n_s, CAST(sum(c.cnt) AS BIGINT) AS sum_s,
       |    max(t.nh) AS nh, max(t.sx) AS sx, max(t.varnum) AS varnum
       |  FROM c JOIN t ON c.event_type = t.event_type
       |  GROUP BY 1, 2
       |), y AS (
       |  SELECT event_type, seg, nh,
       |    sum_s * nh - sx * n_s AS d, n_s, varnum
       |  FROM s
       |), z AS (
       |  SELECT event_type, seg, nh, ${SaxSymbolCaseSql.replace("\n", " ")} AS sym
       |  FROM y
       |)
       |SELECT event_type, CAST(max(nh) AS BIGINT) AS n_hours,
       |  string_agg(sym, '' ORDER BY seg) AS sax_word
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- top-N concentration share --------------------------------------------

  /** TOP-N CONCENTRATION — what fraction of each event_type's total value
    * do its 10 heaviest users carry (the "whale share" Pareto check run
    * before any per-user capacity or abuse decision; `q_lorenz` is the
    * full curve, this is the single number a dashboard tracks). Value is
    * the 10⁻⁶ fixed point so per-user totals and the share are exact
    * integers end-to-end.
    *
    * Scale shape: one row-scale map-side-combined (type, user) aggregate,
    * then a type-keyed rank window over the |users|-row frame (never
    * empty-key), then one |types|-key aggregate. At 100 TB per-type user
    * counts in the millions rank fine per key; a single monster key would
    * use [[Ranks]]' distributed pass. */
  def topNShare(spark: SparkSession, sfDir: String, topN: Int = 10): DataFrame = {
    val perUser = events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("v_fp")).as("user_total"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("user_total").desc, col("user_id"))
    perUser
      .withColumn("rk", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_total")).as("total_fp"),
        sum(when(col("rk") <= topN, col("user_total")).otherwise(0L))
          .as("topn_fp"))
      .withColumn("topn_share_ppm",
        expr("(topn_fp * 1000000) div total_fp"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[topNShare]] — identical fixed point, rank
    * tie-break, and integer share. */
  def topNShareOracleSql(topN: Int = 10): String =
    s"""WITH u AS (
       |  SELECT event_type, user_id,
       |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS user_total
       |  FROM events GROUP BY 1, 2
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type
       |    ORDER BY user_total DESC, user_id) AS rk
       |  FROM u
       |)
       |SELECT event_type, count(*) AS n_users,
       |  CAST(sum(user_total) AS BIGINT) AS total_fp,
       |  CAST(sum(CASE WHEN rk <= $topN THEN user_total ELSE 0 END) AS BIGINT)
       |    AS topn_fp,
       |  (CAST(sum(CASE WHEN rk <= $topN THEN user_total ELSE 0 END) AS BIGINT)
       |    * 1000000) // CAST(sum(user_total) AS BIGINT) AS topn_share_ppm
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- Theil–Sen robust trend -----------------------------------------------

  /** THEIL–SEN ROBUST TREND per event_type — the median of all pairwise
    * slopes of the hourly count series: the slope estimator with a 29%
    * breakdown point that a level shift or outlier burst cannot drag the
    * way it drags `q_trend`'s least squares. Each slope is `(c₂−c₁)·10⁶
    * div (h₂−h₁)` — an exact fixed-point BIGINT, so ranking, the
    * percentile_disc median pick, and the result are hash-exact with no
    * IEEE step anywhere.
    *
    * Scale shape: the pair explosion runs on the (type, hour) COUNT frame
    * (≤ |types|·(hours choose 2) rows — time-bounded, not volume-bounded:
    * 30 days ≈ 260k pairs per type at ANY data size), then one type-keyed
    * rank window. The row-scale pass is only the first count. */
  def theilSen(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val slopes = counts.as("a")
      .join(counts.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.h") < col("b.h"))
      .select(col("a.event_type").as("event_type"),
        expr("((b.cnt - a.cnt) * 1000000) div (b.h - a.h)").as("slope_fp"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope_fp"))
    val wAll = Window.partitionBy(col("event_type"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pairs"),
        max(when(col("rn") === expr("(np + 1) div 2"), col("slope_fp")))
          .as("theil_sen_slope_fp"))
      .withColumn("rising", col("theil_sen_slope_fp") > 0L)
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[theilSen]] — identical fixed-point slopes and
    * longhand median pick. */
  def theilSenOracleSql: String =
    """WITH c AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |), p AS (
      |  SELECT a.event_type,
      |    ((b.cnt - a.cnt) * 1000000) // (b.h - a.h) AS slope_fp
      |  FROM c a JOIN c b ON a.event_type = b.event_type AND a.h < b.h
      |), r AS (
      |  SELECT event_type, slope_fp,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slope_fp) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS np
      |  FROM p
      |)
      |SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
      |  CAST(max(CASE WHEN rn = (np + 1) // 2 THEN slope_fp END) AS BIGINT)
      |    AS theil_sen_slope_fp,
      |  CAST(max(CASE WHEN rn = (np + 1) // 2 THEN slope_fp END) AS BIGINT) > 0
      |    AS rising
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  // ---- Kendall rank concordance ---------------------------------------------

  /** KENDALL τ-a per event_type between the hourly COUNT series and the
    * hourly fixed-point VALUE-SUM series — "do busier hours move more
    * value?" answered by pure rank concordance, free of any linearity or
    * scale assumption (the nonparametric complement to `q_corr`'s Pearson
    * and `q_theilsen`'s slope). Every pair of hours is classified by SIGN
    * COMPARISON only (`dc>0 AND ds>0` …), never by a `dc*ds` product, so
    * no intermediate can overflow however large the per-hour sums grow;
    * τ-a = (C − D)·10⁶ div pairs is exact integer ppm end-to-end.
    *
    * Scale shape: the pair explosion runs on the (type, hour) aggregate —
    * time-bounded (hours²·|types|), not volume-bounded; the only row-scale
    * pass is the first groupBy. Ties land in `n_ties`, not in τ-a's
    * numerator (τ-b's tie normalizer needs a sqrt — out of the exact-
    * integer contract; documented). */
  def kendall(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sv"))
    val pairs = hourly.as("a")
      .join(hourly.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.h") < col("b.h"))
      .select(col("a.event_type").as("event_type"),
        (col("b.cnt") - col("a.cnt")).as("dc"),
        (col("b.sv") - col("a.sv")).as("ds"))
    pairs
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when((col("dc") > 0 && col("ds") > 0) ||
          (col("dc") < 0 && col("ds") < 0), 1L).otherwise(0L)).as("n_conc"),
        sum(when((col("dc") > 0 && col("ds") < 0) ||
          (col("dc") < 0 && col("ds") > 0), 1L).otherwise(0L)).as("n_disc"))
      .withColumn("n_ties", col("n_pairs") - col("n_conc") - col("n_disc"))
      .withColumn("tau_a_ppm",
        expr("((n_conc - n_disc) * 1000000) div n_pairs"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[kendall]] — identical sign classification and
    * integer ppm. */
  def kendallOracleSql: String =
    """WITH c AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt,
      |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sv
      |  FROM events GROUP BY 1, 2
      |), p AS (
      |  SELECT a.event_type, b.cnt - a.cnt AS dc, b.sv - a.sv AS ds
      |  FROM c a JOIN c b ON a.event_type = b.event_type AND a.h < b.h
      |), s AS (
      |  SELECT event_type, count(*) AS n_pairs,
      |    CAST(sum(CASE WHEN (dc > 0 AND ds > 0) OR (dc < 0 AND ds < 0)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
      |    CAST(sum(CASE WHEN (dc > 0 AND ds < 0) OR (dc < 0 AND ds > 0)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_disc
      |  FROM p GROUP BY 1
      |)
      |SELECT event_type, n_pairs, n_conc, n_disc,
      |  n_pairs - n_conc - n_disc AS n_ties,
      |  ((n_conc - n_disc) * 1000000) // n_pairs AS tau_a_ppm
      |FROM s ORDER BY 1""".stripMargin

  // ---- Spearman rank correlation --------------------------------------------

  /** SPEARMAN ρ per event_type between the hourly COUNT and hourly
    * fixed-point VALUE-SUM series — the d² form `ρ = 1 − 6Σd²/(n(n²−1))`
    * over ranks drawn with a DETERMINISTIC (metric, hour) lexicographic
    * tie-break (exact Spearman when the series has no ties; a documented
    * deterministic variant when it does — average-rank tie handling needs
    * τ-b-style sqrt normalizers, outside the exact-integer contract).
    * Ranks come from per-type `row_number` windows, d² sums and the final
    * ρ·10⁶ are BIGINT arithmetic throughout — hash-exact, no IEEE step.
    *
    * Scale shape: two (type)-keyed rank windows over the HOURLY aggregate
    * (time-bounded rows), never over raw events; the row-scale pass is
    * only the first groupBy. No empty-key window anywhere. */
  def spearman(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("sv"))
    val wc = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt"), col("h"))
    val ws = Window.partitionBy(col("event_type"))
      .orderBy(col("sv"), col("h"))
    hourly
      .withColumn("rc", row_number().over(wc))
      .withColumn("rs", row_number().over(ws))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum((col("rc") - col("rs")).cast("long")
          * (col("rc") - col("rs")).cast("long")).as("sum_d2"))
      .filter(col("n_hours") > 1L)
      .withColumn("spearman_fp",
        expr("1000000 - (6 * sum_d2 * 1000000) div (n_hours * (n_hours * n_hours - 1))"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[spearman]] — identical tie-break, ranks, and
    * fixed-point ρ. */
  def spearmanOracleSql: String =
    """WITH c AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt,
      |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sv
      |  FROM events GROUP BY 1, 2
      |), r AS (
      |  SELECT event_type,
      |    row_number() OVER (PARTITION BY event_type ORDER BY cnt, h) AS rc,
      |    row_number() OVER (PARTITION BY event_type ORDER BY sv, h) AS rs
      |  FROM c
      |), s AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    CAST(sum((rc - rs) * (rc - rs)) AS BIGINT) AS sum_d2
      |  FROM r GROUP BY 1 HAVING count(*) > 1
      |)
      |SELECT event_type, n_hours, sum_d2,
      |  1000000 - (6 * sum_d2 * 1000000) // (n_hours * (n_hours * n_hours - 1))
      |    AS spearman_fp
      |FROM s ORDER BY 1""".stripMargin

  // ---- Poisson bootstrap confidence interval --------------------------------

  /** Poisson(1) CDF thresholds scaled to 2⁶³ — `floor(CDF(k)·2⁶³)` for
    * k = 0..8, computed once at 60-digit decimal precision and inlined as
    * literals here AND in the oracle SQL, so both engines draw the same
    * replicate multiplicities from the same 63-bit uniform hash. */
  private[graft] val PoissonCdf63: Seq[Long] = Seq(
    3393088950634442637L, 6786177901268885274L, 8482722376586106593L,
    9048237201691847032L, 9189615907968282142L, 9217891649223569164L,
    9222604272766117001L, 9223277504700766692L, 9223361658692597904L)

  /** The replicate hash `md5₆₃("boot:" + b + ":" + id)` — ONE definition
    * shared by the batch CI gate and the streaming band gate so both draw
    * the same replicate universe. Callers MUST materialize this as its own
    * column before applying [[poissonWeightFromHash]] (else the md5
    * subtree inlines into each threshold compare). */
  private[graft] def poissonBootHash(b: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.md5Lower63Col(
      concat(lit("boot:"), b.cast("string"), lit(":"), id.cast("string")))

  /** Poisson(1) multiplicity from a materialized 63-bit uniform hash
    * column: the count of [[PoissonCdf63]] thresholds at or below it. */
  private[graft] def poissonWeightFromHash(
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PoissonCdf63.map(t => when(h >= lit(t), 1L).otherwise(0L)).reduce(_ + _)

  /** The oracle-side twin of [[poissonWeightFromHash]] over an `h` SQL
    * expression. */
  private[graft] def poissonWeightSqlTerms(h: String): String =
    PoissonCdf63.map(t => s"(CASE WHEN $h >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** POISSON BOOTSTRAP CI per event_type — the one-pass resampling scheme
    * built for exactly this engine shape: a classical bootstrap needs n
    * draws WITH replacement per replicate (a global operation), the
    * Poisson approximation gives every row an INDEPENDENT multiplicity
    * `w ~ Poisson(1)` per replicate, so all B replicates ride one
    * map-side pass with no global coordination. Multiplicities are
    * deterministic: `w(b, row) = #{k : md5₆₃("boot:" + b + ":" + id) ≥
    * T_k}` over the inlined CDF thresholds [[PoissonCdf63]] — portable to
    * any engine with md5. Replicate means are fixed-point integer
    * (`Σw·v_fp div Σw`), the CI is percentile_disc ranks 2 and B−1 of the
    * B means (the inner 15/16 band at B = 32), and the point estimate
    * rides the same base frame.
    *
    * Scale shape: the B× explode feeds straight into a partial
    * (type, b)-keyed hash aggregate inside the same whole-stage-codegen
    * span — nothing materializes B×n rows; the shuffle carries
    * |types|·B rows. The rank window is (type)-keyed over B rows. */
  def bootstrapCi(spark: SparkSession, sfDir: String, b: Int = 32): DataFrame = {
    // the B× hash fan-out is the gate's whole cost — spread an
    // unsplittable single-file scan across the session's cores first
    // (no-op on a production corpus already written in many splits)
    val base = Tables.spreadIfNarrow(events(spark, sfDir), col("event_id"))
      .select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_fp"))
    val repMeans = base
      .withColumn("b", explode(array((0 until b).map(i => lit(i)): _*)))
      .withColumn("h", poissonBootHash(col("b"), col("event_id")))
      .withColumn("w", poissonWeightFromHash(col("h")))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("v_fp")).as("swv"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0L)
      .select(col("event_type"), col("b"), expr("swv div sw").as("rep_mean_fp"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("rep_mean_fp"), col("b"))
    val wAll = Window.partitionBy(col("event_type"))
    val ci = repMeans
      .withColumn("rk", row_number().over(wr))
      .withColumn("np", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_reps"),
        max(when(col("rk") === 2L, col("rep_mean_fp"))).as("boot_lo_fp"),
        max(when(col("rk") === col("np") - 1L, col("rep_mean_fp")))
          .as("boot_hi_fp"))
    val point = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(v_fp) div count(*)").as("mean_fp"))
    point.join(ci, Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("mean_fp"),
        col("n_reps"), col("boot_lo_fp"), col("boot_hi_fp"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[bootstrapCi]] — same hash congruence, thresholds,
    * fixed-point replicate means, and rank picks. */
  def bootstrapCiOracleSql(b: Int = 32): String = {
    val terms = poissonWeightSqlTerms("h")
    s"""WITH base AS (
       |  SELECT event_type, event_id,
       |    CAST(floor(value * 1000000) AS BIGINT) AS v_fp
       |  FROM events
       |), reps AS (
       |  SELECT event_type, b, v_fp, $terms AS w
       |  FROM (
       |    SELECT event_type, b, v_fp,
       |      CAST(md5_number_lower('boot:' || CAST(b AS VARCHAR) || ':' ||
       |        CAST(event_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS h
       |    FROM base CROSS JOIN (SELECT unnest(range(0, $b)) AS b)
       |  )
       |), rm AS (
       |  SELECT event_type, b,
       |    CAST(sum(w * v_fp) AS BIGINT) // CAST(sum(w) AS BIGINT)
       |      AS rep_mean_fp
       |  FROM reps GROUP BY 1, 2 HAVING sum(w) > 0
       |), rk AS (
       |  SELECT event_type, rep_mean_fp, b,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY rep_mean_fp, b) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS np
       |  FROM rm
       |), ci AS (
       |  SELECT event_type, CAST(max(np) AS BIGINT) AS n_reps,
       |    CAST(max(CASE WHEN rk = 2 THEN rep_mean_fp END) AS BIGINT)
       |      AS boot_lo_fp,
       |    CAST(max(CASE WHEN rk = np - 1 THEN rep_mean_fp END) AS BIGINT)
       |      AS boot_hi_fp
       |  FROM rk GROUP BY 1
       |), pt AS (
       |  SELECT event_type, count(*) AS n_rows,
       |    CAST(sum(v_fp) AS BIGINT) // count(*) AS mean_fp
       |  FROM base GROUP BY 1
       |)
       |SELECT pt.event_type, pt.n_rows, pt.mean_fp,
       |  ci.n_reps, ci.boot_lo_fp, ci.boot_hi_fp
       |FROM pt JOIN ci USING (event_type) ORDER BY 1""".stripMargin
  }

  // ---- Gini concentration ----------------------------------------------------

  /** GINI COEFFICIENT of per-user value concentration per event_type — the
    * single scalar beside `q_lorenz`'s decile curve and `q_topn_share`'s
    * whale share: `G = (2·Σrᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)` over the user
    * totals ranked ascending, emitted as exact integer ppm (internals in
    * DECIMAL(38,0) ↔ DuckDB HUGEINT, so the rank-weighted sum cannot
    * silently wrap; ANSI throws loudly past decimal-38 headroom).
    *
    * Scale shape: the WITHIN-GROUP rank is fully distributed — a grouped
    * extension of [[Ranks.globalRank]]: one global range-rank ordered
    * (event_type, user_total, user_id) (types are contiguous under that
    * order), then `rank − min(rank per type) + 1` via a broadcast
    * |types|-row offset join. No type-keyed window — a 5-key window over
    * 10⁸ user rows would funnel each type through ONE task; this form
    * spreads every type across the range partitions. */
  def gini(spark: SparkSession, sfDir: String): DataFrame = {
    val u = events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("user_fp"))
    val ranked = Ranks.globalRank(u, "grk",
      Seq(col("event_type"), col("user_fp"), col("user_id")))
    val offs = ranked.groupBy(col("event_type")).agg(min(col("grk")).as("base"))
    ranked.join(broadcast(offs), Seq("event_type"))
      .withColumn("rk", col("grk") - col("base") + lit(1L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_fp").cast("decimal(38,0)")).as("s"),
        sum(col("rk").cast("decimal(19,0)")
          * col("user_fp").cast("decimal(19,0)")).as("w"))
      .withColumn("gini_ppm", expr(
        "CAST(((2 * w - (n_users + 1) * s) * 1000000) div (n_users * s) AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("gini_ppm"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[gini]] — longhand per-type rank (HUGEINT internals),
    * identical fixed point and integer division. */
  def giniOracleSql: String =
    """WITH u AS (
      |  SELECT event_type, user_id,
      |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
      |      AS user_fp
      |  FROM events GROUP BY 1, 2
      |), r AS (
      |  SELECT event_type, user_fp,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY user_fp, user_id) AS rk
      |  FROM u
      |), g AS (
      |  SELECT event_type, count(*) AS n_users, sum(user_fp) AS s,
      |    sum(rk * user_fp) AS w
      |  FROM r GROUP BY 1
      |)
      |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(((2 * w - (n_users + 1) * s) * 1000000) // (n_users * s)
      |    AS BIGINT) AS gini_ppm
      |FROM g ORDER BY 1""".stripMargin
}
