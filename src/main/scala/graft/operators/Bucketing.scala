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

  // ---- Z-order (multi-dimensional clustering) ----

  /** Interleave the low 16 bits of two non-negative longs into a Morton
    * (z-order) key: bit i of `a` lands at position 2i+1, bit i of `b` at
    * 2i. Rows sorted by this key are simultaneously clustered on BOTH
    * dimensions, so parquet row-group min/max stats prune selective
    * predicates on either column (or a box on both) — the data-skipping
    * layout for a table queried along two axes, where a single-column sort
    * only ever helps one axis. Pure bit arithmetic (32 shift/mask/or ops),
    * codegen'd, no shuffle.
    */
  def zOrderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** DuckDB twin of [[zOrderKey]] as a SQL fragment over two BIGINT
    * expressions (same 32-term interleave, `|`-folded). */
  def zOrderKeySql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i + 1}) | (((($b) >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")

  /** `events` with its two query axes (`user_id`, `value`) normalized onto
    * the full 16-bit budget (min-max scaling from one broadcast stats row)
    * and folded into a z-key. Normalization is NOT optional: raw values
    * that only occupy the low bits leave the interleave's high bits — the
    * ones that decide file/row-group boundaries — constant, and the layout
    * degenerates to a single-column sort. Production systems use
    * rank/range-ids (percentile buckets) per column for the same reason;
    * min-max is the deterministic stand-in that an oracle can recompute
    * exactly (rank-based needs a sort and a tie rule). All scaling is IEEE
    * double arithmetic + floor — identical on any engine; the stats agg is
    * one map-side-combined pass producing a single broadcast row.
    */
  private def eventsWithZKey(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val stats = ev.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val ubits = least(floor(
      (col("user_id") - col("umin")) * lit(65535.0) /
        greatest(col("umax") - col("umin"), lit(1L))), lit(65535L)).cast("long")
    val vbits = least(floor(
      (col("value") - col("vmin")) * lit(65535.0) /
        when(col("vmax") > col("vmin"), col("vmax") - col("vmin")).otherwise(lit(1.0))),
      lit(65535L)).cast("long")
    ev.crossJoin(broadcast(stats))
      .withColumn("ubits", ubits)
      .withColumn("vbits", vbits)
      .withColumn("zkey", zOrderKey(col("ubits"), col("vbits")))
      .drop("umin", "umax", "vmin", "vmax")
  }

  /** Land `events` z-ordered on (user_id, value): range-partition by the
    * z-key (so files own contiguous z-ranges) and sort within partitions
    * (so row groups within a file do too). Downstream, a predicate on
    * either dimension touches only the files/row groups whose min/max
    * z-range can contain it — BucketingSpec measures the file-level
    * pruning on both axes. */
  def writeEventsZOrdered(spark: SparkSession, sfDir: String, path: String,
      files: Int = 8): Unit = {
    eventsWithZKey(spark, sfDir)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"), col("event_id"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .parquet(path)
  }

  /** Gate query for the z-key computation itself: the first 200 events in
    * z-order. Verifies the interleave bit-for-bit against DuckDB's
    * recomputation (the layout benefit is asserted separately in
    * BucketingSpec — an oracle can check the KEY, not the file layout). */
  def zOrderKeys(spark: SparkSession, sfDir: String): DataFrame =
    eventsWithZKey(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ubits"), col("vbits"), col("zkey"))
      .orderBy(col("zkey"), col("event_id"))
      .limit(200)

  /** DuckDB twin of [[zOrderKeys]] — same stats row, same IEEE scaling,
    * same 32-term interleave. */
  def zOrderKeysOracleSql: String = {
    val z = zOrderKeySql("ubits", "vbits")
    s"""WITH s AS (
       |  SELECT min(user_id) AS umin, max(user_id) AS umax,
       |    min(value) AS vmin, max(value) AS vmax
       |  FROM events
       |), e AS (
       |  SELECT event_id, user_id,
       |    least(CAST(floor((user_id - umin) * 65535.0 / greatest(umax - umin, 1)) AS BIGINT), 65535) AS ubits,
       |    least(CAST(floor((value - vmin) * 65535.0 /
       |      (CASE WHEN vmax > vmin THEN vmax - vmin ELSE 1.0 END)) AS BIGINT), 65535) AS vbits
       |  FROM events, s
       |)
       |SELECT event_id, user_id, ubits, vbits, ($z) AS zkey
       |FROM e ORDER BY zkey, event_id LIMIT 200""".stripMargin
  }

  /** Rank-based z-order keys — the production form of [[zOrderKeys]]'
    * min-max normalization: each dimension's range-id is its rank among
    * the 256 boundaries of a DETERMINISTIC uniform sample
    * (`qsketch_bottomk` — k smallest row-hash rows, a pure function of
    * the row set, no RNG), so ids spread uniformly regardless of the
    * data's distribution (min-max collapses under outliers: one extreme
    * value crushes everything else into a few ids; ranks cannot). This is
    * what `repartitionByRange` does internally with a nondeterministic
    * sample — here the sample is portable, so the oracle recomputes the
    * exact layout key. One global agg produces the two 256-double
    * boundary arrays; they are collected to the driver (a BOUNDED
    * ≤512-double collect, the k-means-codebook class) and assignment is
    * an O(log k) binary-search UDF per row.
    */
  /** Rank-bucket assignment against a collected quantile-sketch boundary
    * array — O(log k) binary search per row ([[zOrderKeysRanked]]'s bucket
    * step; object-level so UdfAuditProbe measures the production closure —
    * the HOF `size(filter(...))` form was measured 5× slower, see the call
    * site). */
  private[graft] def mkUb(arr: Array[Double]) = udf { (v: Double) =>
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (arr(m) <= v) lo = m + 1 else hi = m
    }
    math.min(lo.toLong, 255L)
  }

  def zOrderKeysRanked(spark: SparkSession, sfDir: String,
      limit: Int = 200): DataFrame = {
    import graft.functions.QsketchAggregate.qsketchBottomK
    val ev = Tables.events(spark, sfDir)
      .withColumn("h", graft.functions.PortableHash.md5Lower63Col(
        col("event_id").cast("string")))
    val sk = ev.agg(
      qsketchBottomK(col("h"), col("user_id").cast("double"), 256).as("su"),
      qsketchBottomK(col("h"), col("value"), 256).as("sv"))
    // bounded driver collect (≤512 doubles — same class as the k-means
    // codebook collects); rank assignment is then a binary-search UDF:
    // the HOF `size(filter(arr, b -> b <= v))` form is semantically
    // identical but runs interpreted at O(k) per row — measured 2.7 s
    // bench median at sf0.1 vs 0.5 s warm for this O(log k) loop (QProbe)
    val row = sk.collect().head
    val su = row.getSeq[Double](0).toArray
    val sv = row.getSeq[Double](1).toArray
    val (ubU, ubV) = (mkUb(su), mkUb(sv))
    ev.withColumn("bu", ubU(col("user_id").cast("double")))
      .withColumn("bv", ubV(col("value")))
      .withColumn("zkey", zOrderKey(col("bu"), col("bv")))
      .select(col("event_id"), col("bu"), col("bv"), col("zkey"))
      .orderBy(col("zkey"), col("event_id"))
      .limit(limit)
  }

  /** DuckDB twin of [[zOrderKeysRanked]] — identical bottom-k-by-hash
    * sample per dimension (the qsketch rule: DISTINCT (h, v), rank by
    * (h, v), keep k), identical rank assignment. */
  def zOrderKeysRankedOracleSql: String = {
    val z = zOrderKeySql("bu", "bv")
    s"""WITH src AS (
       |  SELECT event_id, user_id, value,
       |    CAST(md5_number_lower(CAST(event_id AS VARCHAR)) & 9223372036854775807 AS BIGINT) AS h
       |  FROM events
       |), du AS (
       |  SELECT DISTINCT h, CAST(user_id AS DOUBLE) AS x FROM src
       |), ru AS (
       |  SELECT x, row_number() OVER (ORDER BY h, x) AS rn FROM du
       |), su AS (
       |  SELECT list(x ORDER BY x) AS arr FROM ru WHERE rn <= 256
       |), dv AS (
       |  SELECT DISTINCT h, value AS x FROM src
       |), rv AS (
       |  SELECT x, row_number() OVER (ORDER BY h, x) AS rn FROM dv
       |), sv AS (
       |  SELECT list(x ORDER BY x) AS arr FROM rv WHERE rn <= 256
       |), e AS (
       |  SELECT event_id,
       |    least(CAST(len(list_filter(su.arr, b -> b <= CAST(user_id AS DOUBLE))) AS BIGINT), 255) AS bu,
       |    least(CAST(len(list_filter(sv.arr, b -> b <= value)) AS BIGINT), 255) AS bv
       |  FROM src, su, sv
       |)
       |SELECT event_id, bu, bv, ($z) AS zkey
       |FROM e ORDER BY zkey, event_id LIMIT 200""".stripMargin
  }

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

  // ---- Hilbert-curve layout keys ------------------------------------------

  /** Hilbert index of a cell on the 65536×65536 grid — the classic
    * quadrant-recursion (extract the level's (rx, ry) quadrant bits, add
    * `s²·quadrant-order`, reflect/transpose the remainder), 16 levels,
    * pure integer arithmetic. Public: it is the static kernel
    * [[graft.functions.HilbertIndexExpr]]'s generated code calls (a
    * qualified-private method may not get the static forwarder janino
    * needs), and the spec's independent inverse round-trips it. */
  def hilbertIndex(xIn: Long, yIn: Long): Long = {
    var x = xIn; var y = yIn; var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * (if (rx == 0 && ry == 0) 0L else if (rx == 0) 1L
        else if (ry == 1) 2L else 3L)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** SUPERSEDED on the gate path (round 13): [[hilbertKeys]] now derives
    * keys through the native [[graft.functions.HilbertExpressions]]
    * expression — one static call per row inside whole-stage codegen, no
    * ScalaUDF SerDe — closing the round-12 UDF audit's last "mechanical
    * candidate" (measured ≤0.27 s udf-only at sf1). The UDF form is kept
    * ONLY as [[graft.tools.UdfAuditProbe]]'s A/B reference. */
  private[graft] val hilbertUdf = udf { (x: Long, y: Long) => hilbertIndex(x, y) }

  /** Gate query: the first 200 events in HILBERT order on the same
    * normalized (user_id, value) grid as [[zOrderKeys]]. The Hilbert curve
    * is the locality-optimal space-filling layout — unlike the z-curve it
    * has NO long jumps (consecutive keys are always grid-adjacent,
    * spec-verified via the independent inverse), so a box predicate
    * touches fewer, more contiguous file ranges; the trade is ~50 integer
    * ops per key vs the z-curve's 32-op interleave. Same scale shape as
    * z-order: one broadcast stats row, then a pure map — no shuffle; the
    * layout write is `writeEventsZOrdered` with `hkey` in place of
    * `zkey`. */
  def hilbertKeys(spark: SparkSession, sfDir: String): DataFrame =
    eventsWithZKey(spark, sfDir)
      .withColumn("hkey", graft.functions.HilbertExpressions
        .hilbertIndex(col("ubits"), col("vbits")))
      .select(col("event_id"), col("user_id"), col("ubits"), col("vbits"),
        col("hkey"))
      .orderBy(col("hkey"), col("event_id"))
      .limit(200)

  /** DuckDB twin of [[hilbertKeys]] — the 16 quadrant levels unrolled as a
    * linear CTE chain (each level rewrites (d, x, y); quadrant order and
    * the reflect/transpose cases as CASE arms, no XOR so both engines use
    * the identical integer ops). */
  def hilbertKeysOracleSql: String = {
    val levels = (0 until 16).map { i =>
      val s = 32768L >> i
      s"""h${i + 1} AS (
         |  SELECT event_id, user_id, ubits, vbits,
         |    d + CAST(${s * s} AS BIGINT) * (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |                         WHEN rx = 0 THEN 1
         |                         WHEN ry = 1 THEN 2 ELSE 3 END) AS d,
         |    CASE WHEN ry = 1 THEN x WHEN rx = 1 THEN 65535 - y ELSE y END AS x,
         |    CASE WHEN ry = 1 THEN y WHEN rx = 1 THEN 65535 - x ELSE x END AS y
         |  FROM (
         |    SELECT event_id, user_id, ubits, vbits, d, x, y,
         |      CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM h$i
         |  )
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT min(user_id) AS umin, max(user_id) AS umax,
       |    min(value) AS vmin, max(value) AS vmax
       |  FROM events
       |), h0 AS (
       |  SELECT event_id, user_id,
       |    least(CAST(floor((user_id - umin) * 65535.0 / greatest(umax - umin, 1)) AS BIGINT), 65535) AS ubits,
       |    least(CAST(floor((value - vmin) * 65535.0 /
       |      (CASE WHEN vmax > vmin THEN vmax - vmin ELSE 1.0 END)) AS BIGINT), 65535) AS vbits,
       |    CAST(0 AS BIGINT) AS d,
       |    least(CAST(floor((user_id - umin) * 65535.0 / greatest(umax - umin, 1)) AS BIGINT), 65535) AS x,
       |    least(CAST(floor((value - vmin) * 65535.0 /
       |      (CASE WHEN vmax > vmin THEN vmax - vmin ELSE 1.0 END)) AS BIGINT), 65535) AS y
       |  FROM events, s
       |),
       |$levels
       |SELECT event_id, user_id, ubits, vbits, d AS hkey
       |FROM h16 ORDER BY hkey, event_id LIMIT 200""".stripMargin
  }

  // ---- zone-map pruning audit ---------------------------------------------

  /** Zones per layout for [[zoneMapAudit]]'s sorted (time-range) side. */
  val ZoneMapTimeZones = 256L
  /** Orderkey width per zone on the natural side (~2k lineitems/zone at the
    * TPC-H 4-lineitems-per-order ratio). */
  val ZoneMapOrderkeyWidth = 512L

  /** ZONE-MAP effectiveness audit — the min/max-skipping arithmetic behind
    * every parquet row-group prune, computed for the SAME rows under two
    * layouts: `natural` (zones = contiguous `l_orderkey` ranges — the
    * insertion-order proxy, what you get writing facts as they arrive) and
    * `shipdate` (zones = ship-time ranges — what a time-sorted/partitioned
    * rewrite produces). For the mid-history band predicate
    * `[lo+span/4, lo+span/2)` the audit reports zones pruned and rows
    * scanned per layout — the measured answer to "is re-sorting this table
    * by time worth it?" (spoiler the gate row quantifies: natural zones all
    * straddle the band, sorted zones prune to ~25%).
    *
    * At 100 TB the zone boundaries come free from parquet footer metadata
    * (this audit's zone assignment is the same fixed-width arithmetic the
    * writer's `maxRecordsPerFile`/partitioning induces); the audit itself
    * is ONE map-side-combined aggregate per layout over (zone → min, max,
    * count) — no global sort, no shuffle wider than the zone count. */
  def zoneMapAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.normalizeTs(
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_shipdate")), "l_shipdate")
      .select(col("l_orderkey"), unix_micros(col("l_shipdate")).as("ship_us"))
    val mm = li.agg(min(col("ship_us")).as("lo"), max(col("ship_us")).as("hi"))
    val withZones = li.crossJoin(broadcast(mm))
      .withColumn("span", col("hi") - col("lo") + lit(1L))
      .withColumn("d1", col("lo") + expr("span div 4"))
      .withColumn("d2", col("lo") + expr("span div 2"))
      .withColumn("zone_nat", expr(s"l_orderkey div $ZoneMapOrderkeyWidth"))
      .withColumn("zone_sorted",
        expr(s"((ship_us - lo) * $ZoneMapTimeZones) div span"))
    def audit(zoneCol: String, layout: String): DataFrame =
      withZones
        .groupBy(col(zoneCol).as("zone"))
        .agg(min(col("ship_us")).as("zmin"), max(col("ship_us")).as("zmax"),
          count(lit(1)).as("zrows"),
          sum(when(col("ship_us") >= col("d1") &&
            col("ship_us") < col("d2"), 1L).otherwise(0L)).as("zmatch"),
          first(col("d1")).as("d1"), first(col("d2")).as("d2"))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("zmax") < col("d1") || col("zmin") >= col("d2"), 1L)
            .otherwise(0L)).as("zones_pruned"),
          sum(col("zrows")).as("rows_total"),
          sum(when(col("zmax") < col("d1") || col("zmin") >= col("d2"), 0L)
            .otherwise(col("zrows"))).as("rows_scanned"),
          sum(col("zmatch")).as("rows_matching"))
        .withColumn("layout", lit(layout))
        .select(col("layout"), col("n_zones"), col("zones_pruned"),
          col("rows_total"), col("rows_scanned"), col("rows_matching"))
    audit("zone_nat", "natural")
      .unionByName(audit("zone_sorted", "shipdate"))
      .orderBy(col("layout"))
  }

  /** DuckDB twin of [[zoneMapAudit]] — identical integer zone and band
    * arithmetic. */
  def zoneMapAuditOracleSql: String =
    s"""WITH li AS (
       |  SELECT l_orderkey, epoch_us(l_shipdate) AS ship_us FROM lineitem
       |), mm AS (
       |  SELECT min(ship_us) AS lo, max(ship_us) AS hi,
       |    max(ship_us) - min(ship_us) + 1 AS span
       |  FROM li
       |), z AS (
       |  SELECT l_orderkey, ship_us,
       |    lo + span // 4 AS d1, lo + span // 2 AS d2,
       |    l_orderkey // $ZoneMapOrderkeyWidth AS zone_nat,
       |    ((ship_us - lo) * $ZoneMapTimeZones) // span AS zone_sorted
       |  FROM li, mm
       |), za AS (
       |  SELECT 'natural' AS layout, zone_nat AS zone,
       |    min(ship_us) AS zmin, max(ship_us) AS zmax, count(*) AS zrows,
       |    sum(CASE WHEN ship_us >= d1 AND ship_us < d2 THEN 1 ELSE 0 END) AS zmatch,
       |    any_value(d1) AS d1, any_value(d2) AS d2
       |  FROM z GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'shipdate', zone_sorted,
       |    min(ship_us), max(ship_us), count(*),
       |    sum(CASE WHEN ship_us >= d1 AND ship_us < d2 THEN 1 ELSE 0 END),
       |    any_value(d1), any_value(d2)
       |  FROM z GROUP BY 1, 2
       |)
       |SELECT layout, count(*) AS n_zones,
       |  CAST(sum(CASE WHEN zmax < d1 OR zmin >= d2 THEN 1 ELSE 0 END) AS BIGINT) AS zones_pruned,
       |  CAST(sum(zrows) AS BIGINT) AS rows_total,
       |  CAST(sum(CASE WHEN zmax < d1 OR zmin >= d2 THEN 0 ELSE zrows END) AS BIGINT) AS rows_scanned,
       |  CAST(sum(zmatch) AS BIGINT) AS rows_matching
       |FROM za GROUP BY 1 ORDER BY layout""".stripMargin
}
