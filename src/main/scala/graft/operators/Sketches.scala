package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import Tables._

/** Sketch- and statistics-flavored query operators that matter at 100 TB:
  * approximate distinct counting (KMV), heavy-hitter / skew detection,
  * exact discrete percentiles, and bloom-filter-pruned semi-joins.
  *
  * None of these exist in the reference (its query surface is plain
  * scan/filter/agg over parquet — SURVEY §2.4/§2.5); they are the standard
  * additions a training-data pipeline needs once tables stop fitting a
  * single node:
  *
  *   - [[approxDistinctKmv]]: cardinality without a full distinct shuffle —
  *     the k smallest hash values per group summarize billions of keys in
  *     k·8 bytes. Spark's own `approx_count_distinct` (HLL++) is the
  *     codegen'd production choice but is engine-specific; the KMV estimator
  *     here is built from a portable md5 hash so an independent engine
  *     reproduces it bit-for-bit (the gate requirement).
  *   - [[heavyHitters]]: find the keys that would skew a shuffle BEFORE
  *     running the join/agg that they skew — the decision input for salting
  *     (SCALE.md). Pure integer arithmetic: flag when count·n_keys > τ·total.
  *   - [[medianDisc]]: exact discrete percentiles (p50/p95) via a single
  *     window pass — `percentile_disc` semantics written out explicitly
  *     (row_number + ceil-index) so both engines compute the identical rule
  *     rather than trusting two implementations to agree on interpolation.
  *   - [[bloomJoin]]: the runtime-filter join pattern — build a bloom filter
  *     on the small filtered side, broadcast it into the big side's scan to
  *     drop non-joining rows pre-shuffle, then exact-confirm with a semi
  *     join. At 100 TB this turns a full-fact-table shuffle into a
  *     ~selectivity-sized one; the final semi join keeps semantics exact, so
  *     the bloom's false positives only cost (bounded) wasted rows, never
  *     wrong answers.
  */
object Sketches {

  /** Codegen'd [[PortableHash.md5Lower63Col]] — the former per-row Scala
    * UDF form, now a builtin-composed Column (bit-identical; property-
    * tested in PortableHashSpec), so every sketch hash stays inside
    * whole-stage codegen. */
  private def md5Lower63Udf(c: org.apache.spark.sql.Column) =
    PortableHash.md5Lower63Col(c)

  // ---- KMV approximate distinct ----

  private val KmvK = 16

  /** Distinct `user_id` count per `event_type`, estimated from the k=16
    * minimum DISTINCT 63-bit md5 hash values (KMV / bottom-k sketch: with
    * the kth smallest hash hₖ over a hash space of size M,
    * E[distinct] ≈ (k−1)·M/hₖ). Groups whose sketch holds fewer than k
    * hashes report the exact count (the sketch IS the full key set there).
    * The exact distinct count is emitted alongside so the estimate's error
    * is visible in the result itself.
    *
    * The sketch is the engine's native UDAF
    * ([[graft.functions.KmvBottomKAgg]], SQL `kmv_bottomk(hash, k)`): a
    * partial/final hash aggregate whose state is k longs per group — rows
    * fold into per-partition sketches map-side and only k·8-byte sketches
    * shuffle, with no pre-`distinct` and no per-group sort. That is the
    * 100 TB shape; the window formulation this replaces sorted every
    * group's full distinct key set. (DuckDB's oracle recomputes the same
    * order statistic BY window — correct there, it sees 10⁴ rows.)
    *
    * NOTE: this gate form deliberately ALSO computes the exact
    * `countDistinct` so the estimate's error is visible in the result —
    * which means the gate query itself pays the exact-distinct shuffle the
    * sketch exists to avoid. The operator a user reaches for at scale is
    * [[approxDistinctKmvEstimate]], which carries sketch cost only.
    */
  def approxDistinctKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val h = ev.select(col("event_type"),
      col("user_id"),
      md5Lower63Udf(col("user_id").cast("string")).as("h"))
    val sketch = h.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), KmvK).as("kmv"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        col("kmv.kth_hash").as("kth_hash"), col("kmv.k_n").as("k_n"))
    val est = when(col("k_n") < KmvK, col("n_exact").cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * lit(9.223372036854775808e18) /
        col("kth_hash").cast("double"))
    sketch
      .select(col("event_type"), col("n_exact"), col("kth_hash"),
        est.as("est_distinct"))
      .withColumn("rel_err",
        abs(col("est_distinct") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[approxDistinctKmv]] (same hash, same ceil-free
    * estimator, same under-k fallback; distinct-HASH bottom-k, mirroring
    * the native sketch's dedup-by-hash-value state). */
  def approxDistinctKmvOracleSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST(md5_number_lower(CAST(user_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT event_type, max(h) AS kth_hash, count(*) AS k_n
       |  FROM r WHERE rn <= $KmvK GROUP BY event_type
       |), n AS (
       |  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
       |  GROUP BY event_type
       |)
       |SELECT n.event_type, n.n_exact, sk.kth_hash,
       |  CASE WHEN sk.k_n < $KmvK THEN CAST(n.n_exact AS DOUBLE)
       |       ELSE ${KmvK - 1}.0 * 9223372036854775808.0 / CAST(sk.kth_hash AS DOUBLE)
       |  END AS est_distinct,
       |  abs(CASE WHEN sk.k_n < $KmvK THEN CAST(n.n_exact AS DOUBLE)
       |           ELSE ${KmvK - 1}.0 * 9223372036854775808.0 / CAST(sk.kth_hash AS DOUBLE)
       |      END - CAST(n.n_exact AS DOUBLE)) / CAST(n.n_exact AS DOUBLE) AS rel_err
       |FROM n JOIN sk USING (event_type)
       |ORDER BY event_type""".stripMargin

  /** Estimate-ONLY KMV distinct count — the scale-path variant of
    * [[approxDistinctKmv]]: identical sketch, NO exact `countDistinct`
    * alongside, so the whole plan is one partial/final ObjectHashAggregate
    * over k-long sketches (nothing in the query is proportional to group
    * cardinality). Under-k groups report `k_n` itself — the sketch then
    * holds the group's entire distinct hash set, so the "estimate" is exact
    * there by construction. This is the operator to use when the answer is
    * wanted, not the error probe. */
  def approxDistinctKmvEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val h = ev.select(col("event_type"),
      md5Lower63Udf(col("user_id").cast("string")).as("h"))
    h.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), KmvK).as("kmv"))
      .select(col("event_type"),
        col("kmv.kth_hash").as("kth_hash"), col("kmv.k_n").as("k_n"),
        when(col("kmv.k_n") < KmvK, col("kmv.k_n").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(9.223372036854775808e18) /
            col("kmv.kth_hash").cast("double")).as("est_distinct"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[approxDistinctKmvEstimate]] — the same bottom-k order
    * statistic with the under-k fallback to the kept-hash count. */
  def approxDistinctKmvEstimateOracleSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST(md5_number_lower(CAST(user_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT event_type, max(h) AS kth_hash, count(*) AS k_n
       |  FROM r WHERE rn <= $KmvK GROUP BY event_type
       |)
       |SELECT event_type, kth_hash, k_n,
       |  CASE WHEN k_n < $KmvK THEN CAST(k_n AS DOUBLE)
       |       ELSE ${KmvK - 1}.0 * 9223372036854775808.0 / CAST(kth_hash AS DOUBLE)
       |  END AS est_distinct
       |FROM sk ORDER BY event_type""".stripMargin

  // ---- Heavy hitters / skew detection ----

  /** Keys whose frequency exceeds 6/5 of the mean — the pre-flight skew
    * probe for a planned shuffle on `user_id`. The flag predicate is pure
    * integer arithmetic (`5·c·U > 6·T` ⟺ c > 1.2·mean) so it is exact on
    * any engine; the reported `skew_ratio` (c·U/T, i.e. multiples of the
    * mean) is one IEEE division. The predicate's products are computed in
    * DECIMAL(38,0): `5·n_events·n_users` exceeds a 64-bit long once
    * count·cardinality passes ~1.8×10¹⁸ (e.g. 10¹⁰ events of one key ×
    * 10⁹ keys — squarely the regime this probe targets), and non-ANSI
    * Spark would WRAP silently where DuckDB promotes to HUGEINT; decimal
    * is exact to 10³⁸ on both engines, beyond any physical dataset.
    *
    * Scale shape: one count-per-key aggregate (map-side partial combine) +
    * a single-row global total broadcast — O(distinct keys) state, no
    * second full shuffle. The output is exactly the salt list you'd feed a
    * skew-join mitigation (SCALE.md §skew).
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val totals = counts.agg(
      count(lit(1)).as("n_users"), sum(col("n_events")).as("total_events"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    counts.crossJoin(broadcast(totals))
      .filter(lit(5L) * dec(col("n_events")) * dec(col("n_users")) >
        lit(6L) * dec(col("total_events")))
      .select(col("user_id"), col("n_events"), col("n_users"),
        col("total_events"),
        (col("n_events") * col("n_users") /
          col("total_events").cast("double")).as("skew_ratio"))
      .orderBy(col("n_events").desc, col("user_id"))
  }

  /** DuckDB twin of [[heavyHitters]]. DuckDB's SUM over BIGINT returns
    * HUGEINT — cast back so the dtype matches Spark's LongType. */
  def heavyHittersOracleSql: String =
    """WITH c AS (
      |  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
      |), s AS (
      |  SELECT count(*) AS n_users, CAST(sum(n_events) AS BIGINT) AS total_events FROM c
      |)
      |SELECT user_id, n_events, n_users, total_events,
      |  (n_events * n_users) / CAST(total_events AS DOUBLE) AS skew_ratio
      |FROM c, s
      |WHERE 5 * CAST(n_events AS HUGEINT) * n_users > 6 * CAST(total_events AS HUGEINT)
      |ORDER BY n_events DESC, user_id""".stripMargin

  // ---- Exact discrete percentiles ----

  /** Exact p50/p95 of `l_extendedprice` per `l_returnflag`, computed as
    * `percentile_disc` written out longhand: rank every value, pick the one
    * at index ⌈q·n⌉ (p50 → ⌈n/2⌉, p95 → ⌈19n/20⌉). Selected values are
    * returned verbatim (no arithmetic on doubles), so the result is
    * bit-identical on any engine — unlike interpolating percentile
    * built-ins, whose interpolation formulas differ subtly across engines.
    * Equal values may tie arbitrarily in rank order, but the VALUE at a
    * given rank is invariant under tie permutation.
    *
    * Scale shape: one shuffle (window partition per group) — same cost as
    * any per-group sort. For 100 TB you'd use `approx_percentile`
    * (t-digest) instead; this is the exact baseline with cross-engine
    * determinism.
    */
  def medianDisc(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    // `div`, not `/`: Spark's `/` on longs is fractional (returns double);
    // `div` is the truncating integer division that matches DuckDB's `//`.
    lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"),
          col("l_extendedprice"))).as("p50_disc"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"),
          col("l_extendedprice"))).as("p95_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[medianDisc]] — the identical longhand rule
    * (DuckDB `//` ≡ Spark `div` on integers). */
  def medianDiscOracleSql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem
      |)
      |SELECT l_returnflag, max(n) AS n,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END) AS p50_disc,
      |  max(CASE WHEN rn = (19 * n + 19) // 20 THEN l_extendedprice END) AS p95_disc
      |FROM r GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** INTERPOLATED percentiles (`percentile_cont` semantics) written
    * longhand — the sibling of [[medianDisc]] for the continuous
    * definition: rank position `q·(n−1)` splits into an integer rank and
    * a fractional remainder via INTEGER arithmetic in q's denominator
    * (halves for p50, twentieths for p95 — `pos = 19·(n−1)`,
    * `lo = pos div 20`, `rem = pos mod 20`), and the interpolation
    * `v_lo + (v_hi − v_lo)·rem/20` is a fixed three-op IEEE sequence over
    * verbatim rank values — both engines produce identical bits, which a
    * builtin `percentile_cont` does not guarantee (interpolation formulas
    * and their op order are implementation details). Same one-window cost
    * as [[medianDisc]]; [[approxPercentile]] is the sketch path. */
  def percentileCont(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = Window.partitionBy(col("l_returnflag"))
    lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n - 1) div 2 + 1"),
          col("l_extendedprice"))).as("lo50"),
        max(when(col("rn") === expr("(n - 1) div 2 + 2"),
          col("l_extendedprice"))).as("hi50"),
        max(expr("(n - 1) % 2")).as("rem2"),
        max(when(col("rn") === expr("(19 * (n - 1)) div 20 + 1"),
          col("l_extendedprice"))).as("lo95"),
        max(when(col("rn") === expr("(19 * (n - 1)) div 20 + 2"),
          col("l_extendedprice"))).as("hi95"),
        max(expr("(19 * (n - 1)) % 20")).as("rem20"))
      .select(col("l_returnflag"), col("n"),
        (col("lo50") + (coalesce(col("hi50"), col("lo50")) - col("lo50")) *
          (col("rem2").cast("double") / lit(2.0))).as("p50_cont"),
        (col("lo95") + (coalesce(col("hi95"), col("lo95")) - col("lo95")) *
          (col("rem20").cast("double") / lit(20.0))).as("p95_cont"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[percentileCont]] — identical integer rank split and
    * IEEE interpolation order. */
  def percentileContOracleSql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem
      |), a AS (
      |  SELECT l_returnflag, max(n) AS n,
      |    max(CASE WHEN rn = (n - 1) // 2 + 1 THEN l_extendedprice END) AS lo50,
      |    max(CASE WHEN rn = (n - 1) // 2 + 2 THEN l_extendedprice END) AS hi50,
      |    max((n - 1) % 2) AS rem2,
      |    max(CASE WHEN rn = (19 * (n - 1)) // 20 + 1 THEN l_extendedprice END) AS lo95,
      |    max(CASE WHEN rn = (19 * (n - 1)) // 20 + 2 THEN l_extendedprice END) AS hi95,
      |    max((19 * (n - 1)) % 20) AS rem20
      |  FROM r GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |  lo50 + (coalesce(hi50, lo50) - lo50) * (CAST(rem2 AS DOUBLE) / 2.0) AS p50_cont,
      |  lo95 + (coalesce(hi95, lo95) - lo95) * (CAST(rem20 AS DOUBLE) / 20.0) AS p95_cont
      |FROM a ORDER BY l_returnflag""".stripMargin

  // ---- Correlation from exact moment sums ----

  /** Pearson correlation of quantity vs extended price per return flag —
    * the statistical-profiling aggregate, computed the CROSS-ENGINE way:
    * the five moment sums (Σx, Σy, Σx², Σy², Σxy) accumulate in DECIMAL
    * (order-independent, exact), and only the final closed-form
    * combination `(n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²ᵗᵒᵗ)·√(n·Σy²−Σy²ᵗᵒᵗ))`
    * runs in IEEE doubles — a fixed op sequence over identical inputs
    * (sqrt is correctly rounded by IEEE-754), so both engines produce the
    * same bits. A builtin `corr()` instead accumulates running FP moments
    * whose values depend on partition order — the gate could never hash
    * it. Same trick as [[Tables.exactAvg]], extended to second moments.
    *
    * Scale shape: one partial-combining groupBy carrying five decimal
    * accumulators — no second pass, no window, no collect.
    *
    * DECIMAL(17,2) inputs are chosen deliberately: both columns are exact
    * at 2 decimals (TPC-H money/quantity; asserted against the data), and
    * 17+17 keeps the PRODUCT precision at 34–35 digits — inside BOTH
    * engines' exact 38-digit range. Wider input casts silently break one
    * side or the other: DuckDB computes DECIMAL(18,·) products in int64
    * and overflows at runtime, Spark caps (19,4)×(19,4) at precision 38
    * by ROUNDING the scale-8 product to scale 7 (allowPrecisionLoss) —
    * a value-level divergence the gate would catch. */
  def corrStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select(col("l_returnflag"),
      col("l_quantity").cast("decimal(17,2)").as("x"),
      col("l_extendedprice").cast("decimal(17,2)").as("y"))
    val agg = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    agg.select(col("l_returnflag"), col("n"),
      Tables.portableRound6(
        (nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(nD * d(col("syy")) - d(col("sy")) * d(col("sy")))))
        .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[corrStats]] — identical decimal moments, identical
    * IEEE combination order. */
  def corrStatsOracleSql: String = {
    val round = (e: String) => Tables.portableRound6Sql(e)
    s"""WITH m AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    SUM(CAST(l_quantity AS DECIMAL(17,2))) AS sx,
       |    SUM(CAST(l_extendedprice AS DECIMAL(17,2))) AS sy,
       |    SUM(CAST(l_quantity AS DECIMAL(17,2)) * CAST(l_quantity AS DECIMAL(17,2))) AS sxx,
       |    SUM(CAST(l_extendedprice AS DECIMAL(17,2)) * CAST(l_extendedprice AS DECIMAL(17,2))) AS syy,
       |    SUM(CAST(l_quantity AS DECIMAL(17,2)) * CAST(l_extendedprice AS DECIMAL(17,2))) AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, n,
       |  ${round("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""")}
       |    AS corr_qty_price
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  // ---- Sketch percentiles (deterministic bottom-k-by-hash sample) ----

  private val QsketchK = 256

  /** Sketch-estimated p50/p95 of `l_extendedprice` per `l_returnflag` next
    * to the exact longhand values and the realized relative error — the
    * sketch sibling of [[medianDisc]] and the percentile twin of
    * [[approxDistinctKmv]]'s error-probe shape.
    *
    * The sketch ([[graft.functions.QsketchBottomKAgg]], SQL
    * `qsketch_bottomk(hash, value, k)`) keeps the k=256 rows with the
    * smallest portable row-key hashes — a deterministic uniform sample —
    * and the estimate applies the SAME ⌈q·n⌉ index rule as the exact side,
    * over the sample. No RNG, no order sensitivity: the sample is a pure
    * function of the row set, so DuckDB recomputes it exactly (rank by
    * hash, keep k, identical index rule) — the property KLL/GK/t-digest
    * compaction sketches cannot give (their state is arrival-order-
    * dependent). Production tolerance tuning is just k; rank error is
    * ~√(1/2k) ≈ 4% at k=256.
    *
    * Scale shape: the sketch side is one partial/final ObjectHashAggregate
    * of k·16-byte states (PlanSpec-asserted) — the 100 TB path. The exact
    * side (here, for error visibility) pays [[medianDisc]]'s per-group
    * window sort; drop it and the query is pure sketch cost. */
  def approxPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
    val h = li.select(col("l_returnflag"), col("l_extendedprice"),
      md5Lower63Udf(concat_ws("|",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))).as("h"))
    val sk = h.groupBy(col("l_returnflag"))
      .agg(graft.functions.QsketchAggregate
        .qsketchBottomK(col("h"), col("l_extendedprice"), QsketchK).as("sample"))
      .select(col("l_returnflag"), size(col("sample")).cast("long").as("m_sample"),
        element_at(col("sample"),
          expr("(size(sample) + 1) div 2").cast("int")).as("est_p50"),
        element_at(col("sample"),
          expr("(19 * size(sample) + 19) div 20").cast("int")).as("est_p95"))
    val exact = medianDisc(spark, sfDir)
    sk.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("m_sample"),
        col("p50_disc"), col("est_p50"),
        (abs(col("est_p50") - col("p50_disc")) / col("p50_disc")).as("rel_err_p50"),
        col("p95_disc"), col("est_p95"),
        (abs(col("est_p95") - col("p95_disc")) / col("p95_disc")).as("rel_err_p95"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[approxPercentile]]: the identical bottom-k-by-hash
    * sample (DISTINCT (flag, hash, value), rank by (hash, value), keep k)
    * and the identical longhand index rule on both the sample and the full
    * data. */
  def approxPercentileOracleSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag, l_extendedprice AS v,
       |    CAST(md5_number_lower(
       |      CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
       |    ) & 9223372036854775807 AS BIGINT) AS h
       |  FROM lineitem
       |), d AS (
       |  SELECT DISTINCT l_returnflag, h, v FROM src
       |), rk AS (
       |  SELECT l_returnflag, v,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rn
       |  FROM d
       |), sm AS (
       |  SELECT l_returnflag, v,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS vr,
       |    count(*) OVER (PARTITION BY l_returnflag) AS m
       |  FROM rk WHERE rn <= $QsketchK
       |), est AS (
       |  SELECT l_returnflag, CAST(max(m) AS BIGINT) AS m_sample,
       |    max(CASE WHEN vr = (m + 1) // 2 THEN v END) AS est_p50,
       |    max(CASE WHEN vr = (19 * m + 19) // 20 THEN v END) AS est_p95
       |  FROM sm GROUP BY l_returnflag
       |), ex AS (
       |  SELECT l_returnflag, max(n) AS n,
       |    max(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END) AS p50_disc,
       |    max(CASE WHEN rn = (19 * n + 19) // 20 THEN l_extendedprice END) AS p95_disc
       |  FROM (
       |    SELECT l_returnflag, l_extendedprice,
       |      row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
       |      count(*) OVER (PARTITION BY l_returnflag) AS n
       |    FROM lineitem
       |  ) GROUP BY l_returnflag
       |)
       |SELECT e.l_returnflag, x.n, e.m_sample,
       |  x.p50_disc, e.est_p50,
       |  abs(e.est_p50 - x.p50_disc) / x.p50_disc AS rel_err_p50,
       |  x.p95_disc, e.est_p95,
       |  abs(e.est_p95 - x.p95_disc) / x.p95_disc AS rel_err_p95
       |FROM est e JOIN ex x USING (l_returnflag)
       |ORDER BY e.l_returnflag""".stripMargin

  // ---- Bloom-filter-pruned semi-join ----

  /** Revenue of lineitems belonging to URGENT orders, executed as the
    * runtime-filter pattern: (1) build a bloom filter over the ~3k urgent
    * `o_orderkey`s (driver-side sketch of the SMALL side — a few hundred KB
    * regardless of fact-table size); (2) broadcast it and drop non-matching
    * lineitems at the scan (codegen'd predicate, no shuffle yet); (3)
    * exact-confirm the survivors with a broadcast LEFT SEMI join so bloom
    * false positives (fpp 1%) cannot leak into the result. The aggregate
    * then shuffles only true matches. Answer ≡ plain semi-join; the bloom
    * changes WHERE rows die, not WHICH rows survive — so the oracle is the
    * plain semi-join SQL.
    *
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling `sel·|fact|`: the same mechanism Spark's AQE
    * runtime row-group filtering automates, written explicitly so the
    * pruning is visible (and measurable) in the plan.
    */
  def bloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val urgent = orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // size the filter from the build side's MEASURED count (one small job
    // over the already-filtered dimension, same pattern as rarity's vocab
    // probe): a constant would saturate as sf grows — an over-full bloom's
    // mightContain degrades toward always-true and the pruning stage
    // silently becomes a no-op (still correct via the semi join, but the
    // shuffle-reduction claim would vanish)
    val nUrgent = math.max(urgent.count(), 1L)
    // NATIVE bloom build + probe (r16 — retires the last walk-up-to-it
    // ScalaUDF waiver on a hot scan path): BloomFilterAggregate builds the
    // sketch in one aggregate job and BloomFilterMightContain probes it as
    // a codegen expression fused into the lineitem scan's filter stage —
    // the former driver-built `stat.bloomFilter` + ScalaUDF probe paid a
    // boxed call per row and fenced whole-stage codegen. Sizing mirrors the
    // old fpp-0.01 build (bits = ⌈−n·ln(0.01)/ln²2⌉), clamped to the
    // runtime-filter caps (4M items / 8 MB): past the cap the bloom only
    // saturates toward always-true — the semi join below owns correctness
    // at every scale, and the false-positive SET shifting (xxhash64
    // pre-hash vs the sketch's own hash) is immaterial for the same reason.
    val n = math.min(nUrgent, 4000000L)
    val bits = math.min(
      math.ceil(-n.toDouble * math.log(0.01) / (math.log(2) * math.log(2))).toLong,
      67108864L)
    val bloomBin = Option(urgent.select(column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(expression(xxhash64(col("o_orderkey"))),
            org.apache.spark.sql.catalyst.expressions.Literal(n),
            org.apache.spark.sql.catalyst.expressions.Literal(bits))
          .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf"))
    val pruned = lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .filter(bloomBin.map(b => column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            expression(lit(b)), expression(xxhash64(col("l_orderkey"))))))
        .getOrElse(lit(false))) // empty build side ⇒ semi join is empty too
    pruned
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        exactSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin of [[bloomJoin]] — the bloom is an execution detail, the
    * semantics are the plain semi-join. */
  def bloomJoinOracleSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- Equi-depth histogram boundaries ----

  private val EquiDepthBuckets = 8

  /** Equi-depth (equi-height) histogram boundaries of `value` per
    * `event_type`: boundary i (1..B−1) is the value at rank ⌈i·n/B⌉ —
    * `percentile_disc` at B−1 evenly spaced quantiles, written with the
    * same longhand row_number + ceil-index rule as [[medianDisc]] so the
    * picked values transfer verbatim across engines. Equal values may tie
    * arbitrarily in rank, but the VALUE at a rank is tie-invariant.
    *
    * This is the statistics artifact the rank-based layouts consume:
    * optimizer column stats, range-id assignment for production z-ordering
    * ([[Bucketing]] — min-max is the oracle-portable stand-in there), and
    * `repartitionByRange`'s boundary sampling made exact. Cost: one window
    * per group (a per-group sort) — the exact baseline; the sketch path at
    * 100 TB is [[approxPercentile]]'s bottom-k sample evaluated at B−1
    * quantiles.
    */
  def equiDepth(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
    val counts = ranked.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ranked.join(counts, "event_type")
      .crossJoin(broadcast(
        spark.range(1, EquiDepthBuckets).toDF("bucket_idx")))
      .filter(col("rn") ===
        expr(s"(bucket_idx * n + ${EquiDepthBuckets - 1}) div $EquiDepthBuckets"))
      .select(col("event_type"), col("bucket_idx"),
        col("value").as("boundary"))
      .orderBy(col("event_type"), col("bucket_idx"))
  }

  /** DuckDB twin of [[equiDepth]] — `⌈i·n/B⌉ = (i·n + B−1) // B`. */
  def equiDepthOracleSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
       |  FROM events
       |), n AS (
       |  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
       |)
       |SELECT r.event_type, b.i AS bucket_idx, r.value AS boundary
       |FROM ranked r
       |JOIN n ON r.event_type = n.event_type
       |JOIN (SELECT unnest(range(1, $EquiDepthBuckets)) AS i) b
       |  ON r.rn = (b.i * n.n + ${EquiDepthBuckets - 1}) // $EquiDepthBuckets
       |ORDER BY r.event_type, bucket_idx""".stripMargin

  // ---- IQR outlier fences ----

  /** Tukey-fence outlier profile of `value` per `event_type`: discrete
    * quartiles (the [[medianDisc]] rank rule — picked values verbatim),
    * fences at q1 − 1.5·IQR and q3 + 1.5·IQR (three IEEE ops per fence,
    * deterministic), and the count of rows outside each fence — the
    * numeric data-cleaning gate a pipeline runs before training-statistics
    * aggregation. Scale shape: one window per group for the quartiles
    * (exact baseline; the sketch path is [[approxPercentile]]'s sample at
    * p25/p75), then a broadcast of the |groups|-row fence table back onto
    * the fact scan — the fact side never shuffles for the count.
    */
  def outlierFences(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir).select(col("event_type"), col("value"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = ev.withColumn("rn", row_number().over(w))
    val counts = ranked.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val quarts = ranked.join(counts, "event_type")
      .filter(col("rn") === expr("(n + 3) div 4") ||
        col("rn") === expr("(3 * n + 3) div 4"))
      .groupBy(col("event_type"), col("n"))
      .agg(min(col("value")).as("q1"), max(col("value")).as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    ev.join(broadcast(quarts), "event_type")
      .groupBy(col("event_type"), col("n"), col("q1"), col("q3"))
      .agg(
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[outlierFences]] — `⌈n/4⌉ = (n+3)//4`, same verbatim
    * quartile picks and IEEE fence arithmetic. */
  def outlierFencesOracleSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |), quarts AS (
      |  SELECT event_type, n, min(value) AS q1, max(value) AS q3
      |  FROM ranked
      |  WHERE rn = (n + 3) // 4 OR rn = (3 * n + 3) // 4
      |  GROUP BY 1, 2
      |), fences AS (
      |  SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
      |  FROM quarts
      |)
      |SELECT f.event_type, f.n, f.q1, f.q3,
      |  CAST(sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM events e JOIN fences f USING (event_type)
      |GROUP BY 1, 2, 3, 4 ORDER BY f.event_type""".stripMargin

  // ---- Join cardinality / fan-out probe ----

  /** Pre-flight join-size probe for `lineitem ⋈ orders` on the order key:
    * |A ⋈ B| = Σₖ c_A(k)·c_B(k) computed from the two count-per-key
    * tables — integer-exact, and the count tables are a tiny fraction of
    * the join's own cost (no wide rows move, partial aggregation
    * map-side). Also reports the maximum per-key fan-out (max c_A·c_B),
    * the number that says whether one hot key will dominate the real
    * join's reducers — together with [[heavyHitters]] and [[groupProfile]]
    * this is the probe set a pipeline runs BEFORE committing to a join
    * strategy (broadcast? salt? bucket?). Products go through
    * DECIMAL(38,0) like the heavy-hitter predicate: c·c then Σ can pass
    * 2⁶³ at fleet-scale fan-outs, and non-ANSI Spark would wrap silently;
    * the final values are cast back to BIGINT (callers at that scale keep
    * the decimal form).
    */
  def joinCardProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cl = lineitem(spark, sfDir).groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("ca"))
    val co = orders(spark, sfDir).groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("cb"))
    cl.join(co, "k")
      .select((dec(col("ca")) * dec(col("cb"))).as("prod"))
      .agg(sum(col("prod")).cast("long").as("predicted_join_rows"),
        max(col("prod")).cast("long").as("max_key_fanout"),
        count(lit(1)).as("n_join_keys"))
  }

  /** DuckDB twin of [[joinCardProbe]] — the predicted count is also
    * literally checkable as `count(*)` of the real join; both forms agree
    * by definition of the formula. */
  def joinCardProbeOracleSql: String =
    """WITH cl AS (
      |  SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1
      |), co AS (
      |  SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1
      |)
      |SELECT CAST(sum(ca * cb) AS BIGINT) AS predicted_join_rows,
      |  CAST(max(ca * cb) AS BIGINT) AS max_key_fanout,
      |  count(*) AS n_join_keys
      |FROM cl JOIN co USING (k)""".stripMargin

  // ---- KMV set algebra: cross-source overlap estimation ----

  private val OverlapK = 256

  /** Estimated pairwise content overlap between sources, from bottom-k
    * sketch ALGEBRA alone: per source, a k=256 KMV sketch of its distinct
    * word-3-gram shingle hashes (native [[graft.functions.KmvBottomKSetAgg]]
    * — one partial/final aggregate, k longs of state per source, the corpus
    * never sorts); then for each source pair, the standard KMV combination:
    * bottom-k of the sketch union estimates |A∪B|, the fraction of that
    * union sketch present in BOTH sides estimates Jaccard, and their
    * product estimates |A∩B|. This is the cross-corpus contamination /
    * duplication triage that runs BEFORE any pairwise dedup join: 10⁴
    * sources → 10⁸ pair estimates from 10⁴ sketches of k longs each,
    * without touching the corpus again.
    *
    * The gate emits the exact overlap alongside (same error-probe pattern
    * as [[approxDistinctKmv]]) — the exact column is a vocab self-join the
    * sketch path exists to avoid; at scale use the estimate columns only.
    * Determinism: hashes are portable md5, the sketch is an order
    * statistic (no RNG), and the estimate arithmetic is division +
    * multiply mirrored expression-for-expression in the oracle.
    */
  def kmvOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = documents(spark, sfDir)
      .select(col("source"),
        explode(Dedup.shingleCol(col("text"))).as("shingle"))
    val hashed = sh.select(col("source"), md5Lower63Udf(col("shingle")).as("h"))
    val sk = hashed.groupBy(col("source"))
      .agg(graft.functions.KmvAggregate.kmvBottomKSet(col("h"), OverlapK).as("sk"))
    val pairs = sk.select(col("source").as("source_a"), col("sk").as("ska"))
      .crossJoin(broadcast(
        sk.select(col("source").as("source_b"), col("sk").as("skb"))))
      .filter(col("source_a") < col("source_b"))
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))),
        1, OverlapK))
      .withColumn("ku", size(col("u")).cast("long"))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("c",
        size(array_intersect(col("u"), array_intersect(col("ska"), col("skb"))))
          .cast("long"))
    val exact = hashed.dropDuplicates("source", "h")
    val exactPairs = exact.as("x")
      .join(exact.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_exact"))
    val estUnion = when(col("ku") < OverlapK, col("ku").cast("double"))
      .otherwise(lit((OverlapK - 1).toDouble) * lit(9223372036854775808.0) /
        col("kth").cast("double"))
    pairs.join(exactPairs, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        (col("c").cast("double") / col("ku").cast("double")).as("est_jaccard"),
        ((col("c").cast("double") / col("ku").cast("double")) * estUnion)
          .as("est_overlap"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact_overlap"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** DuckDB twin of [[kmvOverlap]]: sketches recomputed as windows over
    * the distinct hash sets (fine at oracle scale), identical estimate
    * arithmetic. */
  def kmvOverlapOracleSql: String =
    s"""WITH toks AS (
       |  SELECT source, string_split(text, ' ') AS w FROM documents
       |), sh AS (
       |  SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
       |), h AS (
       |  SELECT DISTINCT source,
       |    CAST(md5_number_lower(shingle) & 9223372036854775807 AS BIGINT) AS h
       |  FROM sh
       |), r AS (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT source, h FROM r WHERE rn <= $OverlapK
       |), pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM (SELECT DISTINCT source FROM sk) a, (SELECT DISTINCT source FROM sk) b
       |  WHERE a.source < b.source
       |), u0 AS (
       |  SELECT p.sa, p.sb, s.h
       |  FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb
       |  GROUP BY 1, 2, 3
       |), u AS (
       |  SELECT sa, sb, h,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS ru
       |  FROM u0
       |), uk AS (
       |  SELECT sa, sb, max(h) AS kth, count(*) AS ku
       |  FROM u WHERE ru <= $OverlapK GROUP BY 1, 2
       |), iu AS (
       |  SELECT u.sa, u.sb, count(*) AS c
       |  FROM u
       |  JOIN sk x ON x.source = u.sa AND x.h = u.h
       |  JOIN sk y ON y.source = u.sb AND y.h = u.h
       |  WHERE u.ru <= $OverlapK GROUP BY 1, 2
       |), ex AS (
       |  SELECT xa.source AS sa, xb.source AS sb, count(*) AS n
       |  FROM h xa JOIN h xb ON xa.h = xb.h AND xa.source < xb.source
       |  GROUP BY 1, 2
       |)
       |SELECT uk.sa AS source_a, uk.sb AS source_b,
       |  COALESCE(iu.c, 0) / CAST(uk.ku AS DOUBLE) AS est_jaccard,
       |  (COALESCE(iu.c, 0) / CAST(uk.ku AS DOUBLE)) *
       |    (CASE WHEN uk.ku < $OverlapK THEN CAST(uk.ku AS DOUBLE)
       |          ELSE ${OverlapK - 1}.0 * 9223372036854775808.0 / CAST(uk.kth AS DOUBLE)
       |     END) AS est_overlap,
       |  CAST(COALESCE(ex.n, 0) AS BIGINT) AS n_exact_overlap
       |FROM uk
       |LEFT JOIN iu ON uk.sa = iu.sa AND uk.sb = iu.sb
       |LEFT JOIN ex ON uk.sa = ex.sa AND uk.sb = ex.sb
       |ORDER BY source_a, source_b""".stripMargin

  // ---- Salted (two-level) aggregation ----

  private val SaltBuckets = 8

  /** Per-user event count and value total computed as a TWO-LEVEL salted
    * aggregate: `groupBy(user_id, salt)` partial → `groupBy(user_id)` merge,
    * with `salt = event_id mod 8`. The result is IDENTICAL to the direct
    * `groupBy(user_id)` (count and decimal sum are associative+commutative,
    * so regrouping cannot change them) — which is exactly the point: this is
    * the skew mitigation [[heavyHitters]] feeds, expressed as a first-class
    * operator with an oracle that proves the rewrite is semantics-preserving.
    *
    * Scale shape: a key whose rows would all land on one reducer (the
    * 10¹⁰-row hot user) is split across 8 reducers in level 1; level 2
    * merges 8 partial rows per key. Level-1 output is ≤ 8·|keys| rows, so
    * the second shuffle is negligible. The salt is derived from a data
    * column (`event_id`), not `rand()`, keeping the pipeline deterministic
    * and retry-safe (a rand() salt re-rolls on task retry — same aggregate
    * result here, but non-reproducible intermediate partitions; the gate
    * also requires engine-portable determinism end-to-end).
    *
    * The decimal value sum is associative exactly (decimal addition), so
    * partial-then-merge equals single-level; the final round-to-double
    * happens once, after the merge.
    */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets.toLong)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(28,4)")).as("pv"))
    partial
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).cast("double").as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** DuckDB twin of [[saltedAgg]]: the DIRECT single-level aggregate — the
    * oracle's job is to certify that salting is invisible in the result. */
  def saltedAggOracleSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- Per-group profiling ----

  /** One-pass-per-branch data profile of `events` by `event_type`: row
    * count, exact user cardinality, min/max of `value` (raw picks — no
    * arithmetic, so bit-identical on any engine), and the deterministic
    * MODE user (most events; ties broken toward the smallest `user_id`,
    * written longhand as a count + row_number pick so both engines apply
    * the identical tie rule — engine-native `mode()`/`arg_max` leave ties
    * unspecified).
    *
    * Scale shape: the profile branch is one map-side-combined aggregate
    * over (type) + one over (type,user) topped by a per-type window on the
    * AGGREGATED counts (|types|·|users| rows, not raw rows) — the same
    * "window over aggregates, never over raw" rule as
    * [[TextAnalysis.topTerms]]. This is the pre-flight profiling every
    * pipeline run does before choosing join strategies and salt lists.
    */
  def groupProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val base = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    val perUser = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("un"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("un").desc, col("user_id"))
    val mode = perUser
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("user_id").as("top_user"),
        col("un").as("top_user_n"))
    base.join(mode, Seq("event_type"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[groupProfile]] — identical longhand mode rule. */
  def groupProfileOracleSql: String =
    """WITH base AS (
      |  SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
      |    min(value) AS min_value, max(value) AS max_value
      |  FROM events GROUP BY event_type
      |), pu AS (
      |  SELECT event_type, user_id, count(*) AS un
      |  FROM events GROUP BY 1, 2
      |), m AS (
      |  SELECT event_type, user_id AS top_user, un AS top_user_n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY un DESC, user_id) AS rn
      |  FROM pu
      |)
      |SELECT b.event_type, b.n, b.n_users, b.min_value, b.max_value,
      |  m.top_user, m.top_user_n
      |FROM base b JOIN m ON b.event_type = m.event_type AND m.rn = 1
      |ORDER BY b.event_type""".stripMargin

  // ---- count-min sketch ---------------------------------------------------

  /** Count-min depth (independent hash rows) and width (buckets per row). */
  val CmsDepth = 3
  val CmsWidth = 256L
  val CmsTopK = 20

  /** `(r, key) → md5Lower63("cms{r}:{k}") % width` as codegen columns (the
    * round-11 native kernel; non-negative hash, so `%` is the positive
    * remainder either way). NULL semantics: SQL `concat` propagates a NULL
    * key to a NULL bucket — identical to the DuckDB twin's `||`, but unlike
    * the pre-round-11 Scala UDF (which hashed the "null" literal). The
    * golden tables' key columns are non-null by schema, so no gate can see
    * the difference; callers with nullable keys should coalesce first. */
  private def cmsBucket(r: org.apache.spark.sql.Column,
      k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PortableHash.md5Lower63Col(
      concat(lit("cms"), r.cast("string"), lit(":"), k.cast("string"))) %
      CmsWidth

  /** COUNT-MIN SKETCH frequency estimation over `lineitem.l_partkey`,
    * reported against exact counts for the exact top-[[CmsTopK]] keys.
    * Output per key: `exact_n`, the sketch estimate `est_n = min` over the
    * [[CmsDepth]] hash rows of that key's bucket sum, and the (always
    * ≥ 0) `overcount`.
    *
    * Why this sketch at 100 TB: the CMS state is a FIXED d×w integer grid
    * (here 3×256 = 768 cells) regardless of key cardinality, and every
    * cell is a plain SUM — fully map-side combinable, mergeable across
    * partitions/days by cell-wise addition, and (unlike space-saving /
    * Misra-Gries) completely ARRIVAL-ORDER-INDEPENDENT, which is what
    * makes it oracle-checkable bit-for-bit and deterministic under any
    * partitioning. The exact pass here exists to expose the realized
    * error in the gate row; production reads only the grid.
    *
    * Plan shape: two aggregations over the fact table (one exact per-key,
    * one ×[[CmsDepth]] row-explode into the grid), then a broadcast join
    * of the 20-row candidate set against the 768-row grid. */
  def cmsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    // the ×depth explode + per-cell bucketing is the gate's CPU; spread
    // the (few-split) scan first — only the 8-byte key column travels
    val li = Tables.spreadIfNarrow(
      lineitem(spark, sfDir).select(col("l_partkey")), col("l_partkey"))
    val exact = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("l_partkey"))
      .limit(CmsTopK)
    val cells = li
      .select(col("l_partkey"), explode(lit((0 until CmsDepth).toArray)).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("l_partkey")))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cell_n"))
    val est = exact
      .select(col("l_partkey"), col("exact_n"),
        explode(lit((0 until CmsDepth).toArray)).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("l_partkey")))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("l_partkey"), col("exact_n"))
      .agg(min(col("cell_n")).as("est_n"))
    est.select(col("l_partkey"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"))
      .orderBy(col("exact_n").desc, col("l_partkey"))
  }

  /** DuckDB twin of [[cmsTopk]] — identical md5 bucket rule and min-over-
    * rows estimate. */
  def cmsTopkOracleSql: String = {
    def bucket(r: String, key: String) =
      s"((md5_number_lower('cms' || CAST($r AS VARCHAR) || ':' || CAST($key AS VARCHAR))" +
        s" & 9223372036854775807) % $CmsWidth)"
    s"""WITH rows_r AS (
       |  SELECT * FROM (VALUES (0), (1), (2)) AS t(r)
       |), exact_c AS (
       |  SELECT l_partkey, count(*) AS exact_n
       |  FROM lineitem GROUP BY 1
       |  ORDER BY exact_n DESC, l_partkey LIMIT $CmsTopK
       |), cells AS (
       |  SELECT rows_r.r AS r, ${bucket("rows_r.r", "l_partkey")} AS bucket,
       |    count(*) AS cell_n
       |  FROM lineitem CROSS JOIN rows_r
       |  GROUP BY 1, 2
       |), est AS (
       |  SELECT e.l_partkey, e.exact_n, min(c.cell_n) AS est_n
       |  FROM exact_c e CROSS JOIN rows_r
       |  JOIN cells c ON c.r = rows_r.r
       |    AND c.bucket = ${bucket("rows_r.r", "e.l_partkey")}
       |  GROUP BY 1, 2
       |)
       |SELECT l_partkey, exact_n, est_n, est_n - exact_n AS overcount
       |FROM est
       |ORDER BY exact_n DESC, l_partkey""".stripMargin
  }

  /** Sketch size for [[kmvRollup]] — small enough that the weekly union
    * exceeds k at gate scale (150 users), so the ESTIMATOR arm (not just
    * the exact-small-set arm) is exercised by the oracle. */
  val KmvRollupK = 32

  /** KMV SKETCH ROLLUP — distinct-count re-aggregation across time
    * boundaries, the sibling of [[graft.operators.OtelQueries.histMerge]]
    * for the other rollup-critical aggregate: daily "distinct users"
    * sketches (k smallest md5 hashes per day — the KMV bottom-k UDAF)
    * merged into WEEKLY distinct estimates by pure sketch algebra
    * (union → re-take bottom-k → (k−1)·2⁶³/kth), with the exact weekly
    * distinct count alongside as the error probe. This is why sketches,
    * not exact sets, are what a TSDB stores per window: the merge touches
    * k longs per day, never the event stream, and is associative — any
    * rollup tree (day→week→month, or partial merges across executors)
    * yields the identical sketch.
    *
    * Scale shape: one map pass + a |days|-key partial/final
    * ObjectHashAggregate for the daily sketches; the weekly merge
    * aggregates ≤7 arrays of k longs per week (bounded state), and the
    * exact control is one distinct-count — the expensive thing the sketch
    * path exists to avoid, kept only as the gate's probe. */
  def kmvRollup(spark: SparkSession, sfDir: String,
      k: Int = KmvRollupK): DataFrame = {
    val e = events(spark, sfDir).select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      md5Lower63Udf(concat(lit("kr:"), col("user_id").cast("string"))).as("h"),
      col("user_id"))
    val daily = e.groupBy(col("day"))
      .agg(graft.functions.KmvAggregate.kmvBottomKSet(col("h"), k).as("sk"))
    val weekly = daily.groupBy(expr("day div 7").as("week"))
      .agg(expr(s"slice(array_sort(array_distinct(flatten(collect_list(sk)))), 1, $k)")
        .as("u"))
      .withColumn("ku", size(col("u")).cast("long"))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("est_distinct",
        when(col("ku") < k, col("ku").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            col("kth").cast("double")))
    val exact = e.groupBy(expr("day div 7").as("week"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"),
        countDistinct(col("day")).as("n_days"))
    weekly.join(exact, Seq("week"))
      .select(col("week"), col("n_days"), col("ku"), col("est_distinct"),
        col("exact_distinct"))
      .orderBy(col("week"))
  }

  /** Sample size for [[qsketchRollup]]. */
  val QsketchRollupK = 64

  /** QUANTILE SKETCH ROLLUP — the third rollup-critical aggregate after
    * counts ([[graft.operators.OtelQueries.histMerge]]) and distincts
    * ([[kmvRollup]]): daily bottom-k-by-hash value samples (the MERGEABLE
    * pair form of the qsketch UDAF, `qsketch_bottomk_pairs` — the sketch
    * STATE, hashes included, not just its value projection) merged into
    * weekly p50/p95 estimates by union → re-take bottom-k, with the exact
    * weekly percentiles alongside as the error probe. The merge is exact
    * sketch algebra: any of the k smallest hashes of the week is among
    * its own day's k smallest, so day→week merging reproduces the sketch
    * a direct weekly pass would build (spec-proven).
    *
    * Scale shape: |days|-key partial/final ObjectHashAggregate, then ≤7
    * k-pair arrays per week; the exact-percentile control is the one
    * week-keyed rank window the sketch path exists to avoid at scale. */
  def qsketchRollup(spark: SparkSession, sfDir: String,
      k: Int = QsketchRollupK): DataFrame = {
    val e = events(spark, sfDir).select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      md5Lower63Udf(concat(lit("sq:"), col("event_id").cast("string"))).as("h"),
      col("value"), col("event_id"))
    val daily = e.groupBy(col("day"))
      .agg(graft.functions.QsketchAggregate
        .qsketchBottomKPairs(col("h"), col("value"), k).as("sk"))
    val weekly = daily.groupBy(expr("day div 7").as("week"))
      .agg(expr(s"slice(array_sort(array_distinct(flatten(collect_list(sk)))), 1, $k)")
        .as("u"))
      .withColumn("sample", expr("array_sort(transform(u, x -> x.v))"))
      .select(col("week"),
        size(col("sample")).cast("long").as("m_sample"),
        element_at(col("sample"),
          expr("(size(sample) + 1) div 2").cast("int")).as("est_p50"),
        element_at(col("sample"),
          expr("(19 * size(sample) + 19) div 20").cast("int")).as("est_p95"))
    val exW = Window.partitionBy(col("week"))
      .orderBy(col("value"), col("event_id"))
    val exact = e.withColumn("week", expr("day div 7"))
      .withColumn("rn", row_number().over(exW))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("week"))))
      .groupBy(col("week"))
      .agg(min(when(col("rn") * 2 >= col("cnt"), col("value"))).as("exact_p50"),
        min(when(col("rn") * 20 >= col("cnt") * 19, col("value"))).as("exact_p95"))
    weekly.join(exact, Seq("week"))
      .orderBy(col("week"))
  }

  /** DuckDB twin of [[qsketchRollup]] — daily bottom-k as windows over
    * the distinct (day, h, v) set, the same union → bottom-k sample and
    * index rules. */
  def qsketchRollupOracleSql(k: Int = QsketchRollupK): String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day, value AS v, event_id,
       |    CAST(md5_number_lower('sq:' || CAST(event_id AS VARCHAR))
       |      & 9223372036854775807 AS BIGINT) AS h
       |  FROM events
       |), d AS (
       |  SELECT day, h, v,
       |    row_number() OVER (PARTITION BY day ORDER BY h, v) AS rn
       |  FROM (SELECT DISTINCT day, h, v FROM e)
       |), sk AS (
       |  SELECT day, h, v FROM d WHERE rn <= $k
       |), w AS (
       |  SELECT week, h, v,
       |    row_number() OVER (PARTITION BY week ORDER BY h, v) AS rw
       |  FROM (SELECT DISTINCT day // 7 AS week, h, v FROM sk)
       |), samp AS (
       |  SELECT week, v,
       |    row_number() OVER (PARTITION BY week ORDER BY v) AS vr,
       |    count(*) OVER (PARTITION BY week) AS m
       |  FROM w WHERE rw <= $k
       |), est AS (
       |  SELECT week, CAST(max(m) AS BIGINT) AS m_sample,
       |    min(CASE WHEN vr = (m + 1) // 2 THEN v END) AS est_p50,
       |    min(CASE WHEN vr = (19 * m + 19) // 20 THEN v END) AS est_p95
       |  FROM samp GROUP BY 1
       |), ex0 AS (
       |  SELECT day // 7 AS week, v,
       |    row_number() OVER (PARTITION BY day // 7 ORDER BY v, event_id) AS rn,
       |    count(*) OVER (PARTITION BY day // 7) AS cnt
       |  FROM e
       |), ex AS (
       |  SELECT week,
       |    min(CASE WHEN rn * 2 >= cnt THEN v END) AS exact_p50,
       |    min(CASE WHEN rn * 20 >= cnt * 19 THEN v END) AS exact_p95
       |  FROM ex0 GROUP BY 1
       |)
       |SELECT CAST(est.week AS BIGINT) AS week, est.m_sample,
       |  est.est_p50, est.est_p95, ex.exact_p50, ex.exact_p95
       |FROM est JOIN ex ON est.week = ex.week
       |ORDER BY week""".stripMargin

  /** DuckDB twin of [[kmvRollup]] — daily bottom-k as windows, the same
    * union → bottom-k → estimate algebra, identical operand order. */
  def kmvRollupOracleSql(k: Int = KmvRollupK): String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(md5_number_lower('kr:' || CAST(user_id AS VARCHAR))
       |      & 9223372036854775807 AS BIGINT) AS h,
       |    user_id
       |  FROM events
       |), d AS (
       |  SELECT day, h,
       |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT day, h FROM e)
       |), sk AS (
       |  SELECT day, h FROM d WHERE rn <= $k
       |), w AS (
       |  SELECT week, h,
       |    row_number() OVER (PARTITION BY week ORDER BY h) AS rw
       |  FROM (SELECT DISTINCT day // 7 AS week, h FROM sk)
       |), uk AS (
       |  SELECT week, CAST(count(*) AS BIGINT) AS ku, max(h) AS kth
       |  FROM w WHERE rw <= $k GROUP BY 1
       |), ex AS (
       |  SELECT day // 7 AS week,
       |    count(DISTINCT user_id) AS exact_distinct,
       |    count(DISTINCT day) AS n_days
       |  FROM e GROUP BY 1
       |)
       |SELECT CAST(ex.week AS BIGINT) AS week,
       |  CAST(ex.n_days AS BIGINT) AS n_days, uk.ku,
       |  CASE WHEN uk.ku < $k THEN CAST(uk.ku AS DOUBLE)
       |       ELSE ${k - 1}.0 * 9223372036854775808.0 / CAST(uk.kth AS DOUBLE)
       |  END AS est_distinct,
       |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
       |FROM ex JOIN uk ON ex.week = uk.week
       |ORDER BY week""".stripMargin
}
