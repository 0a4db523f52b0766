package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Mutation semantics over immutable parquet: CDC / upsert apply.
  *
  * The reference is append-only (landing OTLP batches as new parquet files —
  * `/root/reference/src/writer/mod.rs` has no update path), but any table a
  * pipeline maintains long-term (dedup registries, document metadata, SCD
  * dimensions) needs MERGE semantics: apply a changelog of
  * insert/update/delete rows to a base snapshot and produce the next
  * snapshot. Lakehouse table formats automate the bookkeeping; the engine
  * operation underneath is exactly [[applyChangelog]] — union the base with
  * the changelog, keep the latest version per key, drop deletes.
  *
  * Scale shape: ONE shuffle by the primary key (the window partition), with
  * the changelog typically ≪ base. At fleet scale you'd avoid rewriting
  * unchanged partitions by pre-bucketing base AND changelog on the key
  * ([[Bucketing]]) — then the merge is exchange-free and per-bucket — and by
  * partition-pruning the rewrite to partitions the changelog touches. The
  * row-level rule below is what runs inside each bucket either way.
  */
object Mutations {

  /** Latest-wins merge: `base` rows carry seq 0, `changes` rows seq 1 with
    * an `op` in I/U/D; per key the highest-seq row wins and `D` rows erase
    * the key. Output = the post-merge snapshot.
    *
    * Implemented as union + per-key window (row_number over seq DESC)
    * rather than a full outer join: one shuffle, no null-handling asymmetry
    * between inserts and updates, and identical physical shape whether a
    * key has zero, one, or many changelog entries (the window rule also
    * generalizes to multi-version changelogs by widening `seq`).
    *
    * CONTRACT: the changelog must carry at most one row per (key, seq) —
    * two same-seq rows for one key have no defined order and a
    * row_number pick between them would be nondeterministic. The `op` DESC
    * tiebreak below makes even that case deterministic (U beats I beats D
    * lexicographically), but callers should treat same-seq duplicates as
    * a malformed changelog, not a feature; real CDC streams carry a
    * monotonic LSN for `seq`.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String): DataFrame = {
    val seqd = base.withColumn(opCol, lit("B")).withColumn("seq", lit(0L))
      .unionByName(changes.withColumn("seq", lit(1L)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("seq").desc, col(opCol).desc)
    seqd.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col(opCol) =!= "D")
      .drop("rn", "seq")
  }

  /** Gate query: apply a deterministic changelog derived from `orders`
    * itself (no RNG — DuckDB rebuilds the identical changelog):
    * keys ≡ 0 (mod 10) get an update (+1000.0 on the price, one IEEE add),
    * keys ≡ 1 a delete, and keys ≡ 2 spawn an insert under a fresh key
    * (base key + 10⁸, price doubled). The result is the merged snapshot.
    */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"), lit("U").as("op"))
    val deletes = base.filter(col("o_orderkey") % 10 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit("D").as("op"))
    val inserts = base.filter(col("o_orderkey") % 10 === 2)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        col("o_custkey"), (col("o_totalprice") * 2.0).as("o_totalprice"),
        lit("I").as("op"))
    val changes = updates.unionByName(deletes).unionByName(inserts)
    applyChangelog(base, changes, "o_orderkey", "op")
      .orderBy(col("o_orderkey"))
  }

  /** DuckDB twin of [[cdcApply]] — same changelog construction, same
    * latest-wins + delete-filter rule written longhand. */
  def cdcApplyOracleSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |), ch AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS op
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_totalprice, 'D' FROM base WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice * 2.0, 'I'
      |  FROM base WHERE o_orderkey % 10 = 2
      |), u AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, 'B' AS op, 0 AS seq FROM base
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_totalprice, op, 1 FROM ch
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
      |  FROM u
      |)
      |SELECT o_orderkey, o_custkey, o_totalprice, op
      |FROM r WHERE rn = 1 AND op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** Snapshot diff / reconciliation: given two versions of a keyed table,
    * emit every key whose state changed — `added` (new only), `removed`
    * (old only), or `changed` (both, different payload) — the dataset-
    * versioning QA step behind regression checks, incremental re-publish,
    * and audit diffs. The snapshots here are derived deterministically
    * from `events` (old = event_id % 100 < 98, new = event_id % 100 >= 2
    * with value doubled on every 10th id), so both engines reconstruct
    * identical inputs; swap the two derivations for two real table reads
    * — the diff join is unchanged.
    *
    * Scale shape: ONE full-outer shuffle join on the key — no window, no
    * driver state; `unchanged` rows (the overwhelming majority at 100 TB)
    * are filtered AFTER the join by a cheap codegen'd predicate, and at
    * production scale the join keys would be bucketed so the diff is
    * exchange-free on re-runs. Payload comparison is exact integer cents
    * (`floor(value·100)` — one defined rule on both engines, the skyline
    * cast discipline). */
  def tableDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        expr("floor(value * 100)").cast("long").as("cents"))
    val old = base.filter(col("event_id") % 100 < 98)
      .select(col("event_id"), col("event_type").as("old_type"),
        col("cents").as("old_cents"))
    val nw = base.filter(col("event_id") % 100 >= 2)
      .select(col("event_id"), col("event_type").as("new_type"),
        when(col("event_id") % 10 === 0, col("cents") * 2)
          .otherwise(col("cents")).as("new_cents"))
    old.join(nw, Seq("event_id"), "full_outer")
      .withColumn("status",
        when(col("old_cents").isNull, lit("added"))
          .when(col("new_cents").isNull, lit("removed"))
          .when(col("old_cents") =!= col("new_cents") ||
            col("old_type") =!= col("new_type"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("event_id"), col("status"),
        col("old_type"), col("old_cents"), col("new_type"), col("new_cents"))
      .orderBy(col("event_id"))
  }

  /** DuckDB twin of [[tableDiff]] — same snapshot derivations, same
    * full-outer reconciliation. */
  def tableDiffOracleSql: String =
    """WITH base AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), old AS (
      |  SELECT event_id, event_type AS old_type, cents AS old_cents
      |  FROM base WHERE event_id % 100 < 98
      |), nw AS (
      |  SELECT event_id, event_type AS new_type,
      |    CASE WHEN event_id % 10 = 0 THEN cents * 2 ELSE cents END AS new_cents
      |  FROM base WHERE event_id % 100 >= 2
      |), j AS (
      |  SELECT coalesce(old.event_id, nw.event_id) AS event_id,
      |    old_type, old_cents, new_type, new_cents,
      |    CASE WHEN old_cents IS NULL THEN 'added'
      |         WHEN new_cents IS NULL THEN 'removed'
      |         WHEN old_cents <> new_cents OR old_type <> new_type THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM old FULL OUTER JOIN nw ON old.event_id = nw.event_id
      |)
      |SELECT event_id, status, old_type, old_cents, new_type, new_cents
      |FROM j WHERE status <> 'unchanged'
      |ORDER BY event_id""".stripMargin

  /** Incremental view maintenance for algebraic aggregates: a stored
    * per-supplier aggregate (count / sum / max over the 80% "base" slice of
    * lineitem) is brought current by merging the 20% "delta" slice's
    * PARTIAL aggregate — `sum` of counts and sums, `max` of maxes — without
    * re-scanning the base rows. The oracle computes the same view by DIRECT
    * full aggregation, certifying merge ≡ recompute: the algebraic-merge
    * law every lakehouse materialized view and every partial/final
    * aggregate plan relies on, surfaced as a first-class operator.
    *
    * Scale shape: this is THE 100 TB aggregation pattern — the base
    * aggregate is a stored table keyed like the view (read, never
    * re-derived), so each refresh scans and shuffles only the delta
    * (insert-only here; retractable aggregates need count/sum pairs, and
    * max needs re-derivation only on deletes of the max row). Both partials
    * are map-side combined; the merge shuffles |keys| rows, not |rows|.
    * Integer cents keep every value engine-exact. */
  def deltaAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_orderkey"),
        expr("CAST(floor(l_quantity * 100) AS BIGINT)").as("qty_cents"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty_cents")).as("s"),
          max(col("qty_cents")).as("mx"))
    val base = partial(li.filter(col("l_orderkey") % 10 < 8))
    val delta = partial(li.filter(col("l_orderkey") % 10 >= 8))
    base.unionByName(delta)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("n")).as("n_items"), sum(col("s")).as("sum_qty_cents"),
        max(col("mx")).as("max_qty_cents"))
      .orderBy(col("l_suppkey"))
  }

  /** DuckDB twin of [[deltaAgg]] — the DIRECT full aggregate (no
    * base/delta split): matching it is the merge-equals-recompute
    * certificate. */
  def deltaAggOracleSql: String =
    """SELECT l_suppkey,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_qty_cents,
      |  max(CAST(floor(l_quantity * 100) AS BIGINT)) AS max_qty_cents
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin
}
