package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Iterative graph analytics over the relational tables.
  *
  * Companion to the connected-components machinery in [[Dedup]] (near-dup
  * group labeling): where CC propagates min-labels to a fixpoint, PageRank
  * propagates rank mass a fixed number of rounds. Both share the Spark
  * iteration discipline: per-round `localCheckpoint` to truncate lineage
  * (an unbounded iterative plan otherwise grows until Catalyst analysis
  * dominates), join + map-side-combined aggregate per round, nothing on the
  * driver but the loop counter.
  */
object Graph {

  private val Scale = 1000000000000L // fixed-point 10^12 per unit of rank

  /** Run `body` (which must MATERIALIZE everything it wants timed under
    * this setting — the rank loops do: per-round localCheckpoints plus the
    * final [[Tables.materializeAndRelease]]) with adaptive query execution
    * disabled, restoring the caller's setting afterwards.
    *
    * AQE is the wrong trade for a bounded fixed-point loop over a CACHED,
    * pre-partitioned edge frame: every round is a fresh tiny query, so AQE
    * re-plans per round (materialize-and-reoptimize latency ×iterations)
    * and its runtime partition coalescing can re-plan the contribution
    * aggregate to a partition count that no longer matches the cached
    * hash(src) edges, reintroducing the per-round exchange the cache
    * exists to avoid. Nothing AQE offers applies here: the loop's
    * partitioning is pinned by construction, join sides are known
    * (node-sized vs cached), and partial aggregation bounds skew before
    * the shuffle. Measured (tools.PrProbe `ab`, interleaved same-JVM
    * medians, sf0.1): shape change alone −20% vs the round-11 loop, shape
    * + AQE-off −30%; AQE-off is a wash at cadence 0 and 2 as well. The
    * conf flip is session-visible while the loop runs — gates execute
    * serially in Verify/Bench, and concurrent-session users get their own
    * SQLConf — and the previous value is always restored.
    *
    * Concurrency: the set/restore is guarded by a per-session reentrant
    * depth counter (the [[graft.streaming.StreamGate]] replayLock
    * discipline, made reentrant). A bare read-then-restore races when two
    * loops share one session — B could read A's "false" as the value to
    * restore and leave AQE off session-wide forever. Only the OUTERMOST
    * entry records the previous value and only the matching exit restores
    * it; nested and concurrent callers ride the outer scope. The body does
    * NOT hold a lock (loops run seconds to minutes) — only the depth
    * transitions synchronize. */
  private final class AqeScope {
    var depth: Int = 0
    var prev: Option[String] = None
  }
  private val aqeScopes =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, AqeScope]()

  private[graft] def withAqeOff[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    // ConcurrentHashMap.compute is atomic per key, so enter (create/increment
    // + conf set on 0→1) and exit (decrement + restore and REMOVE on 1→0)
    // can't interleave — a plain fetch-then-remove would let a late entrant
    // keep a detached scope and record the other caller's "false" as prev.
    aqeScopes.compute(spark, (_, s0) => {
      val s = if (s0 == null) new AqeScope else s0
      if (s.depth == 0) {
        s.prev = spark.conf.getOption(key)
        spark.conf.set(key, "false")
      }
      s.depth += 1
      s
    })
    try body
    finally aqeScopes.compute(spark, (_, s) => {
      s.depth -= 1
      if (s.depth == 0) {
        s.prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
        null // atomically drop the entry (no SparkSession retained)
      } else s
    })
  }

  /** Five PageRank rounds (damping 0.85) over the customer↔supplier
    * purchase graph: one edge per lineitem in each direction
    * (`o_custkey ↔ l_suppkey`, a multigraph — edge multiplicity IS the
    * purchase weight), node ids namespaced onto one axis as 2·custkey /
    * 2·suppkey+1. Returns the 50 highest-ranked nodes.
    *
    * All arithmetic is FIXED-POINT INTEGER: ranks carry 10¹² per unit, a
    * node's per-edge contribution is `rank div degree` (truncating integer
    * division — identical on every engine), and damping is `(sum·85) div
    * 100`. No doubles anywhere, so five rounds of accumulation are
    * bit-identical across engines and partitionings — the property the
    * oracle gate requires and double-based PageRank cannot give (FP sums
    * reorder across partitions). Bounds: Σranks ≈ |nodes|·10¹², so the
    * BIGINT sum is safe to ~9·10⁶ nodes; past that, drop Scale a digit per
    * 10× nodes (the oracle constant moves in lockstep), or switch to the
    * double form and give up hash-exact verification.
    *
    * Scale shape per round: edges⋈ranks (both pre-shuffled on `src` after
    * round 1 — AQE reuses the exchange) → shuffle on `dst` for the sum →
    * left join back to the node list. Degree is computed once. The
    * dangling-node problem is designed out: edges are symmetrized, so
    * every node has out-degree ≥ 1.
    */
  def pageRank(spark: SparkSession, sfDir: String, iterations: Int = 5,
      topK: Int = 50, checkpointEvery: Int = 1): DataFrame =
    pageRankOf(spark.read.parquet(bipartiteTable(spark, sfDir)),
      iterations, topK, checkpointEvery)

  /** The symmetrized customer↔supplier purchase multigraph both walk gates
    * derive from: one edge per lineitem in each direction, node ids
    * namespaced as 2·custkey / 2·suppkey+1. */
  private[graft] def bipartiteEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val od = orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val fwd = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The fixed-point iteration core of [[pageRank]] over a SYMMETRIZED
    * (src, dst) edge frame. Symmetry is a hard precondition, not just the
    * dangling-node fix: it makes the `dst` key set equal to the node set,
    * which is what lets each round be ONE join + ONE aggregate (below).
    *
    * Round-9 loop shape: the edge list is hash-partitioned by `src` ONCE
    * and CACHED with its degree column pre-joined — `InMemoryRelation`
    * preserves the cached plan's output partitioning (unlike
    * `localCheckpoint`, which erases it), so every round's edges⋈ranks
    * join reshuffles only the NODE-sized rank frame; the corpus-sized
    * edge side never crosses the wire again after the initial partition
    * (measured: the per-round edge exchange was the dominant recurring
    * cost of the walk family's sf1 wall — the iteration is corpus-sized
    * where the backbone family's analytics are top-k-sized).
    *
    * Round-12 loop shape (verdict task 2 — the per-iteration cost itself
    * dominated once the edge derivation was memoized): the old
    * `nodes LEFT JOIN contrib` re-emission step is GONE. On a symmetrized
    * graph every node receives at least one contribution (it appears as
    * some edge's `dst`), so the contribution aggregate's key set already
    * IS the node set and the left join's `coalesce(c, 0)` could never
    * fire — each round is now edges⋈ranks → per-dst sum, with the damping
    * applied in the aggregate's own projection. Values are bit-identical
    * (integer arithmetic, same contributions, the dropped branch was
    * dead); the per-round node-list join, its exchange, and the cached
    * `distinct` node frame all disappear. The seed ranks derive from the
    * degree frame (its key set is the same node set), which keeps them
    * hash(src)-partitioned off the cached edges — round 1's join starts
    * exchange-free like every later one (alias-aware output partitioning
    * carries hash(src) through the rename). Per round the only exchange
    * left is the node-sized contribution shuffle to `dst` (round-16 shape:
    * the per-round materialization pin is persist+count, whose
    * InMemoryRelation PRESERVES the hash(id) partitioning — the former
    * localCheckpoint erased it and re-shuffled the node-sized rank frame
    * on every pinned round); PrProbe measures cadences 0/1/2 as a wash at
    * sf0.1 (2.5–3.4 s warm, all inside the noise band), so the default
    * stays 1. Caches are released once the top-k result is materialized
    * ([[Tables.materializeAndRelease]]). */
  private[graft] def pageRankOf(edgesIn: DataFrame, iterations: Int,
      topK: Int, checkpointEvery: Int): DataFrame =
      withAqeOff(edgesIn.sparkSession) {
    val parted = edgesIn.repartition(col("src")).persist()
    val deg = parted.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val edges = parted.join(deg, "src").persist() // (src, dst, d) co-partitioned

    var ranks = deg.select(col("src").as("id"), lit(Scale).as("r"))
    val pins = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (i <- 1 to iterations) {
      // damping split as (c div 100)*85 + ((c%100)*85) div 100 — identical
      // to (c*85) div 100 for c ≥ 0 (c = 100q+r ⇒ 85q + (85r) div 100) but
      // never multiplies the full sum by 85 first, so the headroom bound is
      // set by Σranks itself (~|V|·10¹²), not Σranks·85: a hub absorbing
      // nearly all rank mass stays overflow-safe to ~9·10⁶ nodes even in a
      // star-shaped graph (worst-case mass concentration)
      // SHUFFLE_HASH hint (r16): the pinned rank frame carries ACCURATE
      // in-memory stats, and without the hint the planner broadcasts the
      // node-sized rank side every round — fine at gate scale, a driver
      // round-trip per round and over the 8 GB broadcast cap at 100 TB.
      // Both sides are hash(src)-partitioned (cached edges; the pin's
      // preserved aggregate partitioning), so the hinted join plans as a
      // ShuffledHashJoin with ZERO exchange: the edge side never moves,
      // the rank side builds a node-sized/nPartitions hash map per task.
      ranks = edges
        .join(ranks.withColumnRenamed("id", "src").hint("shuffle_hash"),
          "src")
        .select(col("dst").as("id"), expr("r div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
        .select(col("id"),
          (lit(15L * Scale / 100L) +
            expr("(c div 100) * 85 + ((c % 100) * 85) div 100")).as("r"))
      // bounded iteration counts tolerate a longer lineage; materialization
      // cadence is a measured knob (tools.PrProbe). The pin is persist +
      // count, NOT localCheckpoint (r16): InMemoryRelation PRESERVES the
      // aggregate's hash(id) partitioning (alias-aware through the id→src
      // rename), so the next round's join stays exchange-free — the
      // checkpoint's ExistingRDD erased it and reshuffled the node-sized
      // rank frame every round. Values are unchanged (same plan, only the
      // materialization differs); AQE is off in this loop, so the cached
      // relation is never re-planned (the globalRank persist+AQE boundary
      // hazard does not apply — no range partitioning here). Pins are
      // released with the edge caches once the top-k result materializes.
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations) {
        val pinned = ranks.persist()
        pinned.count()
        pins += pinned
        ranks = pinned
      }
    }
    val out = ranks
      .select(col("id"),
        when(col("id") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        (col("id") / 2).cast("long").as("entity_key"),
        col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("id"))
      .limit(topK)
    materializeAndRelease(out, (Seq(parted, edges) ++ pins): _*)
  }

  private val CoPurchaseTopEdges = 5000
  private val MaxSuppliersPerCustomer = 100

  /** Per-customer fan-out cap for the bipartite→supplier projection: keep
    * each customer's `cap` lowest-id suppliers (row_number under the (c, s)
    * total order — deterministic on every engine). The projection self-join
    * then emits at most C(cap, 2) pairs per customer instead of C(k, 2) for
    * a customer buying from k suppliers — the k² skew point of the census,
    * and the dominant term at 100× on a power-law purchase graph. Same
    * pattern as the doc-frequency cap in [[Dedup]]'s capped Jaccard: bound
    * the quadratic blow-up BEFORE the join, accept a documented
    * approximation of the backbone weights for hot keys. */
  private[graft] def cappedSuppliers(cs: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cs.withColumn("_rn",
        row_number().over(Window.partitionBy(col("c")).orderBy(col("s"))))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** The capped projection pair stream (pre-aggregation): one row per
    * (customer, supplier-pair). Exposed for the spec that plants a hot
    * customer and asserts the emitted pair count is bounded by the cap,
    * not k². */
  private[graft] def supplierPairs(cs: DataFrame, cap: Int): DataFrame = {
    val capped = cappedSuppliers(cs, cap)
    capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
  }

  /** Top-k co-purchase backbone from a (c, s) purchase frame: aggregate the
    * capped pair stream to shared-customer weights, keep the `topEdges`
    * strongest under the deterministic (weight DESC, src, dst) total
    * order. Plans as TakeOrderedAndProject (per-partition heaps, k rows to
    * the driver merge) — size-bounded at every sf. */
  private[graft] def coPurchaseEdges(cs: DataFrame, topEdges: Int,
      cap: Int): DataFrame =
    coPurchaseWeightedEdges(cs, topEdges, cap).select(col("src"), col("dst"))

  /** [[coPurchaseEdges]] with the shared-customer weight kept — the
    * weighted form [[sssp]] relaxes over. */
  private[graft] def coPurchaseWeightedEdges(cs: DataFrame, topEdges: Int,
      cap: Int): DataFrame =
    supplierPairs(cs, cap)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("src"), col("dst"))
      .limit(topEdges)

  /** The distinct (customer, supplier) purchase frame every backbone gate
    * projects from — one definition instead of six copies. */
  private[graft] def purchaseFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val od = orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
  }

  // ---- Backbone as a TABLE (write once, read per analytic) ---------------

  /** Write the weighted capped co-purchase backbone ONCE per (JVM, corpus)
    * as a (src, dst, shared) parquet table and return its directory — the
    * production shape for the graph-analytics family: the seven backbone
    * gates each re-derive the identical ≤[[CoPurchaseTopEdges]]-edge frame
    * from `lineitem⋈orders` (the joins + distinct + cap window dominate
    * their wall time, 2.8–4.1 s each at sf0.1 while the analytics
    * themselves run on ≤5000 rows), so a 100 TB pipeline derives the
    * backbone in one nightly job and every analytic reads the table. The
    * `*FromTable` gate variants consume this; the self-contained forms
    * stay as the oracle-anchored control. Deterministic: the backbone is a
    * deterministic function of the corpus, so table-fed gates are
    * hash-identical to their self-contained twins (oracle-checked for all
    * six `*_tbl` gates). */
  def backboneTable(spark: SparkSession, sfDir: String,
      topEdges: Int = CoPurchaseTopEdges,
      cap: Int = MaxSuppliersPerCustomer): String =
    MemoTables.dir(s"backbone|$sfDir|$topEdges|$cap", "graft-backbone") { dir =>
      // ≤topEdges rows → one compact file. repartition(1), NOT coalesce(1):
      // coalesce folds INTO the upstream stage and would run the whole
      // lineitem⋈orders derivation on ONE task (the round-9 AQE-coalesce
      // trap, same class as the spreadIfNarrow fix); repartition inserts a
      // shuffle after the parallel derivation and only the ≤topEdges result
      // rows funnel to the single writer
      coPurchaseWeightedEdges(purchaseFrame(spark, sfDir), topEdges, cap)
        .repartition(1)
        .write.mode("overwrite").parquet(dir)
    }

  /** Write the symmetrized bipartite purchase edge list ONCE per
    * (JVM, corpus) as a (src, dst) parquet table and return its directory —
    * the [[backboneTable]] pattern extended to the walk family:
    * [[pageRank]]/[[personalizedPageRank]] each re-derive the doubled
    * lineitem⋈orders edge list per gate (measured the worst non-instrument
    * sweep ratios on the surface at sf1, 6.7×/7.6×, VERDICT r8), while the
    * iteration itself only ever SCANS that list. A 100 TB pipeline writes
    * the edge list in one nightly job; every walk analytic reads it. Unlike
    * the backbone this table is corpus-SIZED (2 rows per lineitem), so it
    * is written with its natural partitioning, not coalesced. */
  def bipartiteTable(spark: SparkSession, sfDir: String): String =
    MemoTables.dir(s"bipartite|$sfDir", "graft-bipartite") { dir =>
      bipartiteEdges(spark, sfDir).write.mode("overwrite").parquet(dir)
    }

  /** [[pageRank]] fed from the materialized bipartite edge table —
    * hash-identical to the self-contained form (the edge list is a
    * deterministic function of the corpus and every downstream step is
    * integer fixed-point). */
  def pageRankFromTable(spark: SparkSession, sfDir: String,
      iterations: Int = 5, topK: Int = 50,
      checkpointEvery: Int = 1): DataFrame =
    pageRankOf(spark.read.parquet(bipartiteTable(spark, sfDir)),
      iterations, topK, checkpointEvery)

  /** [[personalizedPageRank]] fed from the materialized bipartite edge
    * table. */
  def personalizedPageRankFromTable(spark: SparkSession, sfDir: String,
      iterations: Int = 5, topK: Int = 50,
      checkpointEvery: Int = 1): DataFrame =
    personalizedPageRankOf(spark.read.parquet(bipartiteTable(spark, sfDir)),
      iterations, topK, checkpointEvery)

  /** Read the materialized weighted backbone (writing it first if this JVM
    * hasn't yet — [[backboneTable]]). */
  private def backboneFromTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(backboneTable(spark, sfDir))

  /** The weighted backbone through the once-per-(JVM, corpus, params) memo
    * — since round 10 the SELF-CONTAINED gates route here too (r9 verdict
    * task 8): the FIRST derivation still computes the backbone from the
    * base tables (the oracle anchor — the memo body is
    * [[coPurchaseWeightedEdges]] over [[purchaseFrame]] verbatim), and
    * every later gate in the JVM reads the parquet back instead of
    * re-running the lineitem⋈orders join. Hash-neutral by the same
    * determinism argument as the `_tbl` twins (oracle-checked green for
    * all eight read-form gates). */
  private def memoizedBackbone(spark: SparkSession, sfDir: String,
      topEdges: Int, cap: Int): DataFrame =
    spark.read.parquet(backboneTable(spark, sfDir, topEdges, cap))

  /** [[triangles]] (degree-ordered) fed from the materialized backbone
    * table. */
  def trianglesFromTable(spark: SparkSession, sfDir: String,
      degreeOrdered: Boolean = true): DataFrame =
    censusFromEdges(
      backboneFromTable(spark, sfDir).select(col("src"), col("dst")),
      degreeOrdered)

  /** [[bfsHops]] fed from the materialized backbone table. */
  def bfsHopsFromTable(spark: SparkSession, sfDir: String,
      hops: Int = 4): DataFrame =
    bfsHopsOf(backboneFromTable(spark, sfDir).select(col("src"), col("dst")),
      hops)

  /** [[sssp]] fed from the materialized backbone table (weights derived
    * from the stored `shared` column — same reciprocal rule). */
  def ssspFromTable(spark: SparkSession, sfDir: String,
      rounds: Int = SsspRounds): DataFrame =
    ssspOf(backboneFromTable(spark, sfDir)
      .withColumn("w", expr("1000000L div shared")), rounds)

  /** [[kcore]] fed from the materialized backbone table. */
  def kcoreFromTable(spark: SparkSession, sfDir: String, k: Int = KcoreK,
      rounds: Int = KcoreRounds): DataFrame =
    peelProfile(spark,
      backboneFromTable(spark, sfDir).select(col("src"), col("dst")), k, rounds)

  /** [[labelProp]] fed from the materialized backbone table. */
  def labelPropFromTable(spark: SparkSession, sfDir: String,
      rounds: Int = LabelPropRounds): DataFrame =
    labelPropOf(backboneFromTable(spark, sfDir).select(col("src"), col("dst")),
      rounds)

  /** [[assortativity]] fed from the materialized backbone table. */
  def assortativityFromTable(spark: SparkSession, sfDir: String): DataFrame =
    assortativityOf(backboneFromTable(spark, sfDir)
      .select(col("src"), col("dst")))

  /** Triangle/wedge census over an id-ordered (src < dst) distinct edge
    * list. Wedges (ALL 2-paths, open or closed — each triangle contributes
    * 3; the denominator of the global clustering coefficient
    * 3·triangles/wedges) come from the degree aggregate Σ d·(d−1)/2, never
    * from materializing paths.
    *
    * Triangle counting is the classic node-iterator join
    * e1(a,b)⋈e2(b,c)⋈e3(a,c) under a TOTAL ORDER on vertices, which
    * generates each triangle exactly once. `degreeOrdered = false` uses the
    * vertex id as the order; `degreeOrdered = true` uses (degree, id) — the
    * web-scale orientation: every edge points toward its higher-(degree,id)
    * endpoint, so a node's join fan-out (out-degree) is bounded at O(√|E|)
    * regardless of its raw degree (a node with out-degree > √(2|E|) would
    * need that many HIGHER-degree neighbors, and there can only be < √(2|E|)
    * of those). The census is identical under any total order — only the
    * join width distribution changes — which the spec asserts on a
    * star-heavy graph. */
  private[graft] def censusFromEdges(edgesIn: DataFrame,
      degreeOrdered: Boolean): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    val deg = edges.select(col("src").as("v"))
      .unionByName(edges.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val oriented = if (degreeOrdered) orientByDegree(edges, deg) else edges
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .join(oriented.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(d) div 2").as("n_edges"),
      expr("sum(d * (d - 1) div 2)").as("n_wedges"))
    stats.crossJoin(tri)
  }

  /** Re-orient id-ordered edges under the (degree, id) total order: src
    * becomes the lower-(d, v) endpoint. Exposed for the join-width spec. */
  private[graft] def orientByDegree(edges: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = edges
      .join(deg.select(col("v").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), "dst")
    val srcFirst = col("ds") < col("dd") ||
      (col("ds") === col("dd") && col("src") < col("dst"))
    withDeg.select(
      when(srcFirst, col("src")).otherwise(col("dst")).as("src"),
      when(srcFirst, col("dst")).otherwise(col("src")).as("dst"))
  }

  /** Triangle census of the supplier co-purchase BACKBONE: project the
    * bipartite purchase graph onto suppliers (edge weight = shared
    * customers, per-customer fan-out capped — [[cappedSuppliers]]), keep
    * the [[CoPurchaseTopEdges]] strongest edges (top-k backbone
    * sparsification), and count nodes, edges, wedges and triangles — the
    * clustering structure, all integer-exact.
    *
    * Why top-k and not a weight threshold: on uniform purchase data the
    * projection is near-COMPLETE (measured: 1000 suppliers → 499,500
    * qualifying edges at any small fixed threshold at sf0.1; the census
    * then honestly computes C(1000,3)≈1.7·10⁸ triangles in ~70 s), and no
    * fixed threshold is sf-robust — the shared-count distribution shifts
    * with data volume. The top-k backbone is size-BOUNDED by construction
    * at every sf, which is the standard sparsification before
    * clustering-structure analysis of a dense similarity graph.
    *
    * `degreeOrdered` switches the census join from id-ordering to
    * (degree, id)-ordering ([[censusFromEdges]]) — same census, join
    * fan-out bounded at O(√|E|) per node on skewed backbones. The degree
    * order is the DEFAULT by measurement (round-7 sf1 sweep,
    * `target/scalesweep_r7.log`): on the real co-purchase backbone it wins
    * at BOTH measured scales — 3.30 vs 4.34 s at sf0.1, 18.54 vs 35.99 s
    * at sf1 — and on a synthetic hub backbone (TriOrientProbe) the gap
    * widens with skew, while its extra cost (two broadcast-sized degree
    * joins over ≤[[CoPurchaseTopEdges]] edges) is fixed and tiny. No
    * measured crossover favors id-ordering; it stays reachable as the
    * `degreeOrdered = false` control (gate `q_triangles`). */
  def triangles(spark: SparkSession, sfDir: String,
      topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer,
      degreeOrdered: Boolean = true): DataFrame = {
    censusFromEdges(
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .select(col("src"), col("dst")), degreeOrdered)
  }

  /** The capped co-purchase backbone as shared oracle CTEs (`cs0`, `cs`,
    * `w`, `e`) — one definition for the [[trianglesOracleSql]] and
    * [[bfsHopsOracleSql]] twins, mirroring [[coPurchaseEdges]]. */
  private def backboneSqlCtes: String =
    s"""cs0 AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), cs AS MATERIALIZED (
       |  SELECT c, s FROM (
       |    SELECT c, s, row_number() OVER (PARTITION BY c ORDER BY s) AS rn
       |    FROM cs0
       |  ) WHERE rn <= $MaxSuppliersPerCustomer
       |), w AS MATERIALIZED (
       |  SELECT a.s AS src, b.s AS dst, count(*) AS shared
       |  FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
       |  GROUP BY 1, 2
       |), e AS MATERIALIZED (
       |  SELECT src, dst FROM w
       |  ORDER BY shared DESC, src, dst LIMIT $CoPurchaseTopEdges
       |)""".stripMargin

  /** DuckDB twin of [[triangles]] — identical cap, backbone, and vertex
    * order (id or (degree, id); default mirrors [[triangles]]). */
  def trianglesOracleSql(degreeOrdered: Boolean = true): String = {
    val triSource =
      if (degreeOrdered)
        s"""od AS (
           |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
           |              THEN e.src ELSE e.dst END AS src,
           |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.src < e.dst)
           |              THEN e.dst ELSE e.src END AS dst
           |  FROM e JOIN deg da ON e.src = da.v JOIN deg db ON e.dst = db.v
           |), tri AS (
           |  SELECT count(*) AS n_triangles
           |  FROM od e1 JOIN od e2 ON e1.dst = e2.src
           |    JOIN od e3 ON e3.src = e1.src AND e3.dst = e2.dst
           |)""".stripMargin
      else
        s"""tri AS (
           |  SELECT count(*) AS n_triangles
           |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
           |    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
           |)""".stripMargin
    s"""WITH $backboneSqlCtes, deg AS (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT src AS v FROM e UNION ALL SELECT dst FROM e
       |  ) GROUP BY v
       |), $triSource
       |SELECT (SELECT count(*) FROM deg) AS n_nodes,
       |  CAST((SELECT sum(d) FROM deg) // 2 AS BIGINT) AS n_edges,
       |  CAST((SELECT sum((d * (d - 1)) // 2) FROM deg) AS BIGINT) AS n_wedges,
       |  tri.n_triangles
       |FROM tri""".stripMargin
  }

  /** DuckDB twin of [[pageRank]]: the five rounds unrolled as chained CTEs
    * with the identical integer fixed-point rules. DuckDB's BIGINT sums
    * widen to HUGEINT — every accumulated value is cast back so dtypes
    * match Spark's LongType. */
  def pageRankOracleSql(iterations: Int = 5, topK: Int = 50): String = {
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id,
         |    CAST(${15L * Scale / 100L} + (COALESCE(s.c, 0) // 100) * 85 + ((COALESCE(s.c, 0) % 100) * 85) // 100 AS BIGINT) AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, SUM(r.r // deg.d) AS c
         |    FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg ON e.src = deg.src
         |    GROUP BY e.dst
         |  ) s ON n.id = s.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), e AS MATERIALIZED (
       |  SELECT src, dst FROM fwd
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM fwd
       |), deg AS MATERIALIZED (
       |  SELECT src, count(*) AS d FROM e GROUP BY src
       |), n AS MATERIALIZED (
       |  SELECT DISTINCT src AS id FROM e
       |), r0 AS (
       |  SELECT id, CAST($Scale AS BIGINT) AS r FROM n
       |),
       |$rounds
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  id // 2 AS entity_key,
       |  r AS rank_fp
       |FROM r$iterations
       |ORDER BY rank_fp DESC, id LIMIT $topK""".stripMargin
  }

  /** Seed supplier keys for [[personalizedPageRank]] (node ids 2k+1). */
  val PprSeedSuppliers: Seq[Long] = Seq(1L, 2L, 3L)

  /** PERSONALIZED PageRank — mass teleports back to a fixed SEED set
    * instead of uniformly, so the stationary ranks measure proximity to
    * the seeds: the graph-walk form of "find data like this curated set"
    * (seed-expansion curation, influence attribution, related-entity
    * retrieval). Identical fixed-point discipline to [[pageRank]]: 10¹²
    * integer scale, the overflow-safe two-level damping split, one
    * shuffle per round on `dst`, bounded iterations with measured
    * checkpoint cadence. Headroom is BETTER than global PageRank's: total
    * mass is |seeds|·10¹², not |V|·10¹², so even total concentration on
    * one hub stays ≤ 3·10¹².
    *
    * Non-seed teleport is zero, so nodes unreachable from the seeds rank
    * 0 exactly — the oracle checks that cut too. */
  def personalizedPageRank(spark: SparkSession, sfDir: String,
      iterations: Int = 5, topK: Int = 50,
      checkpointEvery: Int = 1): DataFrame =
    personalizedPageRankOf(spark.read.parquet(bipartiteTable(spark, sfDir)),
      iterations, topK, checkpointEvery)

  /** The seeded iteration core of [[personalizedPageRank]] over a
    * SYMMETRIZED (src, dst) edge frame — same one-join-one-agg loop shape
    * as [[pageRankOf]] (round 12: the node re-emission join is dropped by
    * the same symmetry argument; the seed-only teleport term moves into
    * the aggregate's projection, keyed on the aggregate's own `id`). */
  private[graft] def personalizedPageRankOf(edgesIn: DataFrame,
      iterations: Int, topK: Int, checkpointEvery: Int): DataFrame =
      withAqeOff(edgesIn.sparkSession) {
    val parted = edgesIn.repartition(col("src")).persist()
    val deg = parted.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val edges = parted.join(deg, "src").persist() // (src, dst, d) co-partitioned
    val seedIds = PprSeedSuppliers.map(k => 2 * k + 1)
    def isSeed = col("id").isin(seedIds: _*)
    def isSeedSrc = col("src").isin(seedIds: _*)

    var ranks = deg.select(col("src").as("id"),
      when(isSeedSrc, lit(Scale)).otherwise(lit(0L)).as("r"))
    val pins = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (i <- 1 to iterations) {
      // SHUFFLE_HASH hint — see the [[pageRankOf]] loop comment (r16)
      ranks = edges
        .join(ranks.withColumnRenamed("id", "src").hint("shuffle_hash"),
          "src")
        .select(col("dst").as("id"), expr("r div d").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
        .select(col("id"),
          (when(isSeed, lit(15L * Scale / 100L)).otherwise(lit(0L)) +
            expr("(c div 100) * 85 + ((c % 100) * 85) div 100")).as("r"))
      // persist+count pin, not localCheckpoint — preserves the hash(id)
      // partitioning so the next round's join is exchange-free (see the
      // [[pageRankOf]] loop comment, r16)
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations) {
        val pinned = ranks.persist()
        pinned.count()
        pins += pinned
        ranks = pinned
      }
    }
    val out = ranks
      .select(col("id"),
        when(col("id") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        (col("id") / 2).cast("long").as("entity_key"),
        col("r").as("rank_fp"),
        isSeed.as("is_seed"))
      .orderBy(col("rank_fp").desc, col("id"))
      .limit(topK)
    materializeAndRelease(out, (Seq(parted, edges) ++ pins): _*)
  }

  /** DuckDB twin of [[personalizedPageRank]] — rounds unrolled, identical
    * seed teleport and damping split. */
  def personalizedPageRankOracleSql(iterations: Int = 5,
      topK: Int = 50): String = {
    val seeds = PprSeedSuppliers.map(k => 2 * k + 1).mkString(", ")
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id,
         |    CAST(CASE WHEN n.id IN ($seeds) THEN ${15L * Scale / 100L} ELSE 0 END
         |      + (COALESCE(s.c, 0) // 100) * 85 + ((COALESCE(s.c, 0) % 100) * 85) // 100 AS BIGINT) AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, SUM(r.r // deg.d) AS c
         |    FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg ON e.src = deg.src
         |    GROUP BY e.dst
         |  ) s ON n.id = s.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), e AS MATERIALIZED (
       |  SELECT src, dst FROM fwd
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM fwd
       |), deg AS MATERIALIZED (
       |  SELECT src, count(*) AS d FROM e GROUP BY src
       |), n AS MATERIALIZED (
       |  SELECT DISTINCT src AS id FROM e
       |), r0 AS (
       |  SELECT id, CAST(CASE WHEN id IN ($seeds) THEN $Scale ELSE 0 END AS BIGINT) AS r
       |  FROM n
       |),
       |$rounds
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  id // 2 AS entity_key,
       |  r AS rank_fp,
       |  id IN ($seeds) AS is_seed
       |FROM r$iterations
       |ORDER BY rank_fp DESC, id LIMIT $topK""".stripMargin
  }

  /** Single-source BFS hop counts over the UNDIRECTED co-purchase backbone
    * ([[coPurchaseEdges]] — same cap + top-k sparsification as
    * [[triangles]]): distance from the lowest-id backbone node, `hops`
    * synchronous frontier rounds. The third member of the iterative-graph
    * family — CC propagates min-labels to fixpoint ([[Dedup]]), PageRank
    * propagates mass a fixed round count, BFS propagates min-distance —
    * and the building block of reachability, k-hop neighbourhoods, and
    * graph-radius estimates over similarity graphs.
    *
    * Round = frontier⋈edges (shuffle keyed on the edge source) then a
    * min-hop aggregate — all integers, deterministic under any
    * partitioning. Unreached nodes are absent (no sentinel rows). On the
    * ≤[[CoPurchaseTopEdges]]-edge backbone every round is broadcast-sized;
    * at full-graph scale the same loop runs as shuffle joins with the
    * [[pageRank]] checkpoint discipline (here the 4-round lineage is
    * bounded, so per-round checkpoints would only add blocking I/O). */
  def bfsHops(spark: SparkSession, sfDir: String, hops: Int = 4,
      topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer): DataFrame =
    bfsHopsOf(
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .select(col("src"), col("dst")).localCheckpoint(true), hops)

  /** The frontier loop of [[bfsHops]] over an arbitrary (src, dst) edge
    * frame (callers materialize/checkpoint it first — the loop scans it
    * once per round). */
  private[graft] def bfsHopsOf(edges: DataFrame, hops: Int): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    var dist = edges.agg(least(min(col("src")), min(col("dst"))).as("v"))
      .select(col("v"), lit(0L).as("hop"))
    for (h <- 1 to hops) {
      val next = dist.as("d").join(und.as("g"), col("d.v") === col("g.u"))
        .select(col("g.v").as("v"), lit(h.toLong).as("hop"))
      dist = dist.unionByName(next)
        .groupBy(col("v")).agg(min(col("hop")).as("hop"))
    }
    dist.orderBy(col("v"))
  }

  /** DuckDB twin of [[bfsHops]] — the frontier rounds unrolled as chained
    * CTEs over the shared backbone. */
  def bfsHopsOracleSql(hops: Int = 4): String = {
    val rounds = (1 to hops).map { h =>
      s"""d$h AS MATERIALIZED (
         |  SELECT v, CAST(min(hop) AS BIGINT) AS hop FROM (
         |    SELECT v, hop FROM d${h - 1}
         |    UNION ALL
         |    SELECT und.v, $h AS hop FROM d${h - 1} d JOIN und ON d.v = und.u
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $backboneSqlCtes, und AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM e
       |  UNION ALL
       |  SELECT dst AS u, src AS v FROM e
       |), d0 AS (
       |  SELECT least((SELECT min(src) FROM e), (SELECT min(dst) FROM e)) AS v,
       |    CAST(0 AS BIGINT) AS hop
       |),
       |$rounds
       |SELECT v, hop FROM d$hops ORDER BY v""".stripMargin
  }

  /** Default degree threshold / round count for [[kcore]]. */
  val KcoreK = 4
  val KcoreRounds = 8

  /** Degree assortativity of the co-purchase backbone — the Pearson
    * correlation of endpoint degrees over the symmetrized edge list, the
    * standard one-number summary of whether hubs attach to hubs
    * (assortative, r>0) or to leaves (disassortative, r<0; most similarity
    * and co-occurrence graphs are). All five moment sums are EXACT BIGINT
    * (degrees are bounded by the top-k backbone), and only the final
    * closed-form r is computed in doubles from those identical exact
    * integers, round6'd — the [[QuerySurface.abTest]] determinism
    * pattern. Emits the moments alongside r so consumers can re-derive.
    *
    * Scale shape: one degree aggregate, two broadcast-scale degree joins
    * onto the edge list, one global moment aggregate — no windows. On a
    * full 100 TB edge list the same plan holds with the degree join
    * becoming a shuffle join on the vertex id. */
  def assortativity(spark: SparkSession, sfDir: String,
      topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer): DataFrame = {
    assortativityOf(
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .select(col("src"), col("dst")).localCheckpoint(true))
  }

  /** The moment/correlation core of [[assortativity]] over an arbitrary
    * (src, dst) edge frame — exposed for the spec's non-regular synthetic
    * graph (the gate backbones at small sf are complete, hence degenerate
    * NULL r). */
  private[graft] def assortativityOf(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    und
      .join(deg.select(col("u"), col("d").as("x")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("y")), "v")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("assortativity",
        when(expr(AssortativityGuardSql), lit(null).cast("double"))
          .otherwise(Tables.portableRound6(expr(AssortativityRSql))))
      .select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        col("syy"), col("assortativity"))
  }

  /** Integer-exact degenerate-case guard shared with the oracle: a REGULAR
    * graph (the complete sf0.01 backbone) has zero degree variance on one
    * or both axes, making r 0/0 — emitted as NULL on both engines (ANSI
    * Spark would otherwise throw on the division). */
  private val AssortativityGuardSql =
    "n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0"

  /** The closed-form r over exact integer moments — one string, both
    * engines. */
  private val AssortativityRSql =
    """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      | (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |  sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""".stripMargin

  /** DuckDB twin of [[assortativity]] — shared backbone, identical exact
    * moments and IEEE expression. */
  def assortativityOracleSql: String = {
    val rExpr = AssortativityRSql
    s"""WITH $backboneSqlCtes, und AS (
       |  SELECT src AS u, dst AS v FROM e
       |  UNION ALL
       |  SELECT dst, src FROM e
       |), deg AS (
       |  SELECT u, count(*) AS d FROM und GROUP BY u
       |), m AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(dx.d) AS BIGINT) AS sx, CAST(sum(dy.d) AS BIGINT) AS sy,
       |    CAST(sum(dx.d * dy.d) AS BIGINT) AS sxy,
       |    CAST(sum(dx.d * dx.d) AS BIGINT) AS sxx,
       |    CAST(sum(dy.d * dy.d) AS BIGINT) AS syy
       |  FROM und JOIN deg dx ON und.u = dx.u JOIN deg dy ON und.v = dy.u
       |)
       |SELECT n, sx, sy, sxy, sxx, syy,
       |  CASE WHEN $AssortativityGuardSql THEN NULL
       |       ELSE ${Tables.portableRound6Sql(rExpr)} END AS assortativity
       |FROM m""".stripMargin
  }

  /** Relaxation rounds for [[sssp]]. */
  val SsspRounds = 4

  /** Weighted single-source shortest paths by synchronous Bellman–Ford
    * relaxation — the weighted generalization of [[bfsHops]], completing
    * the iterative-graph family (CC: min-label fixpoint; PageRank: mass,
    * fixed rounds; BFS: min-hop; SSSP: min-plus). Edge cost is the integer
    * `⌈10⁶/shared⌉`-style reciprocal `1000000 div shared` of the backbone's
    * shared-customer weight (strong ties are cheap to traverse — the
    * standard similarity→distance inversion), so every distance is exact
    * integer arithmetic and the gate is hash-checkable.
    *
    * Each round: frontier⋈edges keyed on the edge source (one shuffle),
    * candidate distance `d + w`, then a min aggregate per node merged with
    * the previous round's labels — relax `rounds` times (paths of ≤ rounds
    * edges; the unweighted analog is exactly [[bfsHops]]'s contract). On
    * the ≤[[CoPurchaseTopEdges]]-edge backbone every round is
    * broadcast-sized; at full scale the loop is the [[pageRank]] shape
    * (shuffle joins + per-round checkpoint). */
  def sssp(spark: SparkSession, sfDir: String, rounds: Int = SsspRounds,
      topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer): DataFrame =
    ssspOf(
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .withColumn("w", expr("1000000L div shared"))
        .localCheckpoint(true), rounds)

  /** The relaxation loop of [[sssp]] over an arbitrary weighted
    * (src, dst, w) edge frame (callers materialize/checkpoint it first). */
  private[graft] def ssspOf(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"), col("w"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v"), col("w")))
    var dist = edges.agg(least(min(col("src")), min(col("dst"))).as("v"))
      .select(col("v"), lit(0L).as("d"))
    for (_ <- 1 to rounds) {
      val relaxed = dist.as("f").join(und.as("g"), col("f.v") === col("g.u"))
        .select(col("g.v").as("v"), (col("f.d") + col("g.w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("v")).agg(min(col("d")).as("d"))
    }
    dist.orderBy(col("v"))
  }

  /** DuckDB twin of [[sssp]] — relaxation rounds unrolled over the shared
    * backbone with the weight column kept. */
  def ssspOracleSql(rounds: Int = SsspRounds): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT v, CAST(min(d) AS BIGINT) AS d FROM (
         |    SELECT v, d FROM d${r - 1}
         |    UNION ALL
         |    SELECT und.v, f.d + und.w AS d FROM d${r - 1} f JOIN und ON f.v = und.u
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $backboneSqlCtes, ew AS MATERIALIZED (
       |  SELECT src, dst, CAST(1000000 // shared AS BIGINT) AS w FROM w
       |  ORDER BY shared DESC, src, dst LIMIT $CoPurchaseTopEdges
       |), und AS MATERIALIZED (
       |  SELECT src AS u, dst AS v, w FROM ew
       |  UNION ALL
       |  SELECT dst AS u, src AS v, w FROM ew
       |), d0 AS (
       |  SELECT least((SELECT min(src) FROM ew), (SELECT min(dst) FROM ew)) AS v,
       |    CAST(0 AS BIGINT) AS d
       |),
       |$roundCtes
       |SELECT v, d FROM d$rounds ORDER BY v""".stripMargin
  }

  /** K-core peel of the co-purchase backbone — the fourth iterative-graph
    * shape next to CC (min-label fixpoint, [[Dedup]]), PageRank (mass,
    * fixed rounds) and BFS (min-distance): each round REMOVES every node
    * whose current degree is below `k`, and removing a node lowers its
    * neighbours' degrees, so the peel cascades. The surviving subgraph is
    * the standard density/robustness core used to size community detection
    * and to prune similarity graphs before clustering.
    *
    * The gate runs a FIXED `rounds` count (not run-to-fixpoint) so the
    * DuckDB twin can unroll the identical rounds as chained CTEs — same
    * contract as the PageRank/BFS gates; KcoreScaleSpec proves the pinned
    * count REACHES the fixpoint on the gate data (the last two rounds are
    * equal), so the cap hides no divergence. Production peels to fixpoint
    * with the convergence count the loop already computes.
    *
    * Emits one row per round — `(round, nodes_remaining, edges_remaining)`
    * — the peel profile, so the gate verifies every intermediate state,
    * not just the final core.
    *
    * Scale shape: per round, one degree aggregate (map-side combined) and
    * two left-semi joins keyed on the edge endpoints, with per-round
    * `localCheckpoint` lineage truncation — the [[pageRank]] discipline.
    * On the ≤[[CoPurchaseTopEdges]]-edge backbone every round is
    * broadcast-sized; on a full 100 TB edge list the same loop is
    * shuffle-bound and linear in surviving edges per round (the peel
    * SHRINKS the frame monotonically, so later rounds cost less, and the
    * round-count cap bounds the iteration like PageRank's). The per-round
    * driver values are two scalar counts — bounded at any scale. */
  def kcore(spark: SparkSession, sfDir: String, k: Int = KcoreK,
      rounds: Int = KcoreRounds, topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer): DataFrame = {
    peelProfile(spark,
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .select(col("src"), col("dst")), k, rounds)
  }

  /** The peel loop of [[kcore]] over an arbitrary (src, dst) edge frame —
    * exposed for the spec's synthetic-graph and fixpoint assertions. */
  private[graft] def peelProfile(spark: SparkSession, edges0: DataFrame,
      k: Int, rounds: Int): DataFrame = {
    var e = edges0.localCheckpoint(true)
    def degrees(edges: DataFrame): DataFrame =
      edges.select(col("src").as("v")).unionByName(edges.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // the round's degree frame serves twice — the keep-set AND the profile
    // row (nodes = |deg|, edges = Σd/2): the fuse-the-probe-into-existing-
    // work rule (CC auto-salt). deg is NOT checkpointed: it is one cheap
    // aggregate over the checkpointed e, recomputed lazily inside the next
    // round's checkpoint job — one fewer materialization per round, and
    // the per-round frames are bounded by the top-k backbone anyway.
    def summary(r: Int, deg: DataFrame): (Int, Long, Long) = {
      val row = deg.agg(count(lit(1)), expr("coalesce(sum(d), 0L) div 2")).head
      (r, row.getLong(0), row.getLong(1))
    }
    var deg = degrees(e)
    val profile = scala.collection.mutable.ArrayBuffer(summary(0, deg))
    for (r <- 1 to rounds) {
      val keep = deg.filter(col("d") >= k).select(col("v"))
      e = e.join(broadcast(keep.withColumnRenamed("v", "src")), Seq("src"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("v", "dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      deg = degrees(e)
      profile += summary(r, deg)
    }
    import spark.implicits._
    profile.toSeq.toDF("round", "nodes_remaining", "edges_remaining")
      .orderBy(col("round"))
  }

  /** DuckDB twin of [[kcore]] — the peel rounds unrolled as chained CTEs
    * over the shared backbone, one profile row per round. Every round CTE
    * is MATERIALIZED: DuckDB inlines CTEs by default, and each round
    * references its predecessor three times (degree count ×2 + the peel
    * join), so inlining would expand the scan tree 3^rounds-fold — the
    * first symptom is fd exhaustion on the re-opened parquet files. */
  def kcoreOracleSql(k: Int = KcoreK, rounds: Int = KcoreRounds): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""keep$r AS MATERIALIZED (
         |  SELECT v FROM (
         |    SELECT v, count(*) AS d FROM (
         |      SELECT src AS v FROM e${r - 1} UNION ALL SELECT dst FROM e${r - 1}
         |    ) GROUP BY v
         |  ) WHERE d >= $k
         |), e$r AS MATERIALIZED (
         |  SELECT p.src, p.dst FROM e${r - 1} p
         |  JOIN keep$r a ON p.src = a.v JOIN keep$r b ON p.dst = b.v
         |)""".stripMargin
    }.mkString(",\n")
    val profile = (0 to rounds).map { r =>
      s"""SELECT $r AS round,
         |  (SELECT count(*) FROM (SELECT DISTINCT v FROM (
         |     SELECT src AS v FROM e$r UNION ALL SELECT dst FROM e$r))) AS nodes_remaining,
         |  (SELECT count(*) FROM e$r) AS edges_remaining""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $backboneSqlCtes, e0 AS MATERIALIZED (
       |  SELECT src, dst FROM e
       |),
       |$roundCtes
       |SELECT * FROM (
       |$profile
       |) ORDER BY round""".stripMargin
  }

  // ---- bounded-round label propagation ------------------------------------

  /** Synchronized rounds for [[labelProp]] — after k rounds each node's
    * label is exactly the MIN node id within its ≤k-hop neighborhood, the
    * closed-form the spec and oracle recompute. */
  val LabelPropRounds = 3

  /** BOUNDED-ROUND min-label propagation over the co-purchase backbone —
    * the community-detection shape that scales when full convergence
    * ([[graft.operators.Dedup.componentLabels]]' CC loop) is unaffordable:
    * k synchronized rounds cost exactly k self-joins, no convergence test,
    * no unbounded iteration — the fixed-budget pass a 100 TB pipeline
    * schedules nightly. Label semantics after k rounds are CLOSED-FORM
    * (min id within k hops), which is what makes the gate hash-checkable
    * where true modularity-maximizing label prop (tie-broken by frequency)
    * is not.
    *
    * Scale shape per round: one shuffle join of the label frame against the
    * symmetrized edge list on `u`, one map-side-combined min per node.
    * Output is the community size histogram, not per-node rows. */
  def labelProp(spark: SparkSession, sfDir: String,
      rounds: Int = LabelPropRounds,
      topEdges: Int = CoPurchaseTopEdges,
      maxSuppliersPerCustomer: Int = MaxSuppliersPerCustomer): DataFrame = {
    labelPropOf(
      memoizedBackbone(spark, sfDir, topEdges, maxSuppliersPerCustomer)
        .select(col("src"), col("dst"))
        .localCheckpoint(true), rounds)
  }

  /** The k-round propagation core of [[labelProp]] over an arbitrary
    * (src, dst) edge frame — exposed for the spec's non-complete synthetic
    * graphs (the gate backbone at small sf is one complete component, so
    * its histogram is a single row). */
  private[graft] def labelPropOf(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    // round 1 needs no label frame at all: l₁(u) = min(u, min N(u)) is one
    // aggregate over the symmetrized edges (also yields the node list —
    // every backbone node IS an edge endpoint, so nobody is lost).
    // No per-round checkpoint: with a FIXED small round budget the lineage
    // is k-deep over an already-checkpointed edge frame — the eager
    // materialization barrier each round costs more than replanning saves
    // (unbounded-iteration loops like componentLabels still need it).
    var lab = und.groupBy(col("u").as("node"))
      .agg(min(least(col("u"), col("v"))).as("lab"))
    for (_ <- 2 to rounds) {
      // one edge-sized join per round (labels looked up on the v side),
      // then a node-sized join folds in the node's own label — instead of
      // joining the label frame into the edge list twice
      val nbrMin = und
        .join(lab.select(col("node").as("v"), col("lab").as("vlab")), Seq("v"))
        .groupBy(col("u").as("node")).agg(min(col("vlab")).as("nm"))
      lab = lab.join(nbrMin, Seq("node"))
        .select(col("node"), least(col("lab"), col("nm")).as("lab"))
    }
    lab.groupBy(col("lab")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("lab"))
  }

  /** DuckDB twin of [[labelProp]] — the k rounds unrolled as chained CTEs
    * over the shared backbone. */
  def labelPropOracleSql(rounds: Int = LabelPropRounds): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""lab$r AS MATERIALIZED (
         |  SELECT e.u AS node, min(LEAST(a.lab, b.lab)) AS lab
         |  FROM und e
         |  JOIN lab${r - 1} a ON e.u = a.node
         |  JOIN lab${r - 1} b ON e.v = b.node
         |  GROUP BY 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $backboneSqlCtes, und AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM e
       |  UNION ALL
       |  SELECT dst, src FROM e
       |), lab0 AS (
       |  SELECT node, node AS lab FROM (SELECT DISTINCT u AS node FROM und)
       |),
       |$roundCtes
       |SELECT lab, count(*) AS n_nodes FROM lab$rounds
       |GROUP BY 1 ORDER BY n_nodes DESC, lab""".stripMargin
  }

  // ---- HITS hubs & authorities ---------------------------------------------

  /** Fixed-point scale for [[hits]] scores (10⁹ per unit — deliberately
    * smaller than [[Scale]]: HITS sums UN-normalized neighbor scores, so
    * headroom must absorb a full degree factor between normalizations;
    * Σ|scores| ≤ |E|·2·10⁹ keeps a 6M-edge round below 1.2·10¹⁶). */
  private val HitsScale = 1000000000L

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    * customer→supplier purchase multigraph (edge multiplicity = purchase
    * weight — the [[pageRank]] convention, but NOT symmetrized: the
    * direction is what separates the two scores; on the symmetrized graph
    * hubs ≡ authorities and the gate would be [[pageRank]] in disguise).
    * The alternating power iteration: authority = Σ hub over in-edges,
    * hub = Σ authority over out-edges, renormalized each half-step.
    *
    * Deviation from the paper, with rationale: normalization divides by
    * `greatest(max(score) div 10⁹, 1)` — an L∞-style rescale in TRUNCATING
    * INTEGER arithmetic — instead of the L2 norm. Normalization in HITS is
    * a uniform positive scaling, so the converged RANKING is that of the
    * principal eigenvector of EᵀE / EEᵀ either way; the integer form is
    * what makes the gate hash-exact across engines (an L2 norm needs a
    * sqrt whose libm result differs across builds — the [[pageRank]]
    * fixed-point discipline). Absolute magnitudes are therefore
    * approximations of the L2-normalized paper values; order is the
    * operator's contract.
    *
    * Scale shape: the edge list is cached TWICE, hash-partitioned by `c`
    * and by `s` — HITS alternates aggregation sides every half-round, so
    * each cached orientation serves one half exchange-free and only the
    * node-sized score frame reshuffles (the walk-family loop rule). The
    * per-round max is a 1-row broadcast. AQE is off for the loop
    * ([[withAqeOff]] — partitioning pinned by construction). Bounded
    * iterations (3); each half-round's RAW sum frame is pinned with
    * persist+count (r16 — partitioning-preserving, so the next half-round
    * joins exchange-free; the former localCheckpoint reshuffled the score
    * frame) and the L∞ rescale stays a lazy projection over the pinned
    * node-sized blocks (pinning the normalized frame instead would
    * evaluate the corpus-sized join+aggregate twice per half-round — once
    * under the broadcast max, once for the rescale). */
  def hits(spark: SparkSession, sfDir: String, iterations: Int = 3,
      topK: Int = 25): DataFrame = withAqeOff(spark) {
    // The directed c→s purchase multigraph is exactly the forward half of
    // the memoized [[bipartiteTable]] (src = 2·custkey even, dst =
    // 2·suppkey+1 odd, one row per lineitem⋈orders row): filtering even
    // `src` and halving recovers (c, s) with identical multiplicities —
    // the walk-family derive-once rule applied here too (r15: the gate
    // re-derived the corpus-sized join twice per run, once per cached
    // orientation).
    val fwd = spark.read.parquet(bipartiteTable(spark, sfDir))
      .filter(col("src") % 2 === 0)
      .select(expr("src div 2").as("c"), expr("dst div 2").as("s"))
    val byC = fwd.repartition(col("c")).persist()
    val byS = fwd.repartition(col("s")).persist()
    // Headroom guard (ADVICE r13): each half-round sums ≤|E| scores of
    // < 2·[[HitsScale]] each under NON-ANSI arithmetic, so past
    // |E| ≈ 4.6·10⁹ the int64 sum would WRAP silently rather than error.
    // The count doubles as the cache materialization the loop needs
    // anyway; a graph past the bound must fail loudly here, not rank
    // garbage. (Raising headroom means shrinking HitsScale — see SCALE.md
    // "HITS edge-count ceiling".)
    val edgeCount = byC.count()
    require(edgeCount <= Long.MaxValue / (2L * HitsScale),
      s"hits: $edgeCount edges exceeds the int64 headroom bound " +
        s"${Long.MaxValue / (2L * HitsScale)} — shrink HitsScale to rank " +
        "this graph without silent overflow")
    def normalize(df: DataFrame, key: String, score: String): DataFrame = {
      val m = df.agg(max(col(score)).as("__m"))
      df.crossJoin(broadcast(m))
        .select(col(key),
          expr(s"$score div greatest(__m div ${HitsScale}L, 1L)").as(score))
    }
    var hub = byC.select(col("c")).distinct()
      .select(col("c"), lit(HitsScale).as("h"))
    var auth = byC.select(col("s")).limit(0)
      .select(col("s"), lit(0L).as("a")) // replaced in round 1
    // pin = persist + count, not localCheckpoint (r16): InMemoryRelation
    // preserves the half-step aggregate's hash(s)/hash(c) partitioning —
    // the normalize is partitioning-preserving (broadcast 1-row cross join
    // + projection), so the NEXT half-round's join against the matching
    // cached edge orientation stays exchange-free, where the checkpoint's
    // ExistingRDD reshuffled the node-sized score frame every half-round.
    // Pins are released with the edge caches after the top-k materializes.
    val pins = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def pin(df: DataFrame): DataFrame = {
      val p = df.persist(); p.count(); pins += p; p
    }
    for (_ <- 1 to iterations) {
      // pin the RAW half-step sum, not the normalized frame: the
      // normalize's plan evaluates its input twice (once under the 1-row
      // broadcast max, once for the rescale), so pinning AFTER
      // normalize ran the corpus-sized join+aggregate twice per half-round
      // (r15 measured: half the gate's iteration cost). Normalizing lazily
      // over the pinned node-sized frame re-reads cached blocks
      // instead. Same arithmetic, bit-identical scores.
      // SHUFFLE_HASH hints — the pinned score frames' accurate stats would
      // otherwise broadcast the node-sized side each half-round (see the
      // [[pageRankOf]] loop comment, r16); both sides are co-partitioned
      // on the join key, so the hinted join plans exchange-free
      val rawA = pin(
        byC.join(hub.hint("shuffle_hash"), "c")
          .groupBy(col("s")).agg(sum(col("h")).as("a")))
      auth = normalize(rawA, "s", "a")
      val rawH = pin(
        byS.join(auth.hint("shuffle_hash"), "s")
          .groupBy(col("c")).agg(sum(col("a")).as("h")))
      hub = normalize(rawH, "c", "h")
    }
    val topA = auth.orderBy(col("a").desc, col("s")).limit(topK)
      .select(lit("authority").as("kind"), col("s").as("entity_key"),
        col("a").as("score_fp"))
    val topH = hub.orderBy(col("h").desc, col("c")).limit(topK)
      .select(lit("hub").as("kind"), col("c").as("entity_key"),
        col("h").as("score_fp"))
    val out = topA.unionByName(topH)
      .orderBy(col("kind"), col("score_fp").desc, col("entity_key"))
    materializeAndRelease(out, (Seq(byC, byS) ++ pins): _*)
  }

  /** DuckDB twin of [[hits]] — the alternating half-steps unrolled as
    * (raw sum, 1-row max, rescale) CTE triples; HUGEINT sums cast back to
    * BIGINT at every stage (the driver's hash is dtype-sensitive). Every
    * multiply-referenced CTE is `AS MATERIALIZED` (the [[pageRankOracleSql]]
    * rule): each `a{i}r` feeds both its max and its rescale, so without the
    * hint DuckDB re-inlines the ENTIRE upstream join chain twice per round
    * — 2^rounds copies of the 6M-row join, observed as an 84 GiB OOM at
    * sf1. */
  def hitsOracleSql(iterations: Int = 3, topK: Int = 25): String = {
    val rounds = (1 to iterations).map { i =>
      s"""a${i}r AS MATERIALIZED (
         |  SELECT s, CAST(SUM(h.h) AS BIGINT) AS a
         |  FROM fwd JOIN h${i - 1} h USING (c) GROUP BY s
         |), a${i}m AS (
         |  SELECT greatest(CAST(max(a) AS BIGINT) // $HitsScale, 1) AS d
         |  FROM a${i}r
         |), a$i AS MATERIALIZED (
         |  SELECT s, CAST(a // d AS BIGINT) AS a FROM a${i}r CROSS JOIN a${i}m
         |), h${i}r AS MATERIALIZED (
         |  SELECT c, CAST(SUM(x.a) AS BIGINT) AS h
         |  FROM fwd JOIN a$i x USING (s) GROUP BY c
         |), h${i}m AS (
         |  SELECT greatest(CAST(max(h) AS BIGINT) // $HitsScale, 1) AS d
         |  FROM h${i}r
         |), h$i AS MATERIALIZED (
         |  SELECT c, CAST(h // d AS BIGINT) AS h FROM h${i}r CROSS JOIN h${i}m
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS MATERIALIZED (
       |  SELECT o_custkey AS c, l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), h0 AS MATERIALIZED (
       |  SELECT DISTINCT c, CAST($HitsScale AS BIGINT) AS h FROM fwd
       |),
       |$rounds
       |SELECT kind, entity_key, score_fp FROM (
       |  SELECT 'authority' AS kind, s AS entity_key, a AS score_fp,
       |    row_number() OVER (ORDER BY a DESC, s) AS rn
       |  FROM a$iterations
       |  UNION ALL
       |  SELECT 'hub' AS kind, c AS entity_key, h AS score_fp,
       |    row_number() OVER (ORDER BY h DESC, c) AS rn
       |  FROM h$iterations
       |) WHERE rn <= $topK
       |ORDER BY kind, score_fp DESC, entity_key""".stripMargin
  }
}
