package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import Tables._

/** Dataset-assembly operators for training pipelines over `documents`:
  * deterministic held-out splits and token-budget sequence packing.
  *
  * Scale design (100 TB):
  *   - [[sampleSplit]] is a pure map — the split of a document is a function
  *     of its id alone (salted MD5 bucket), so assignment is stable under
  *     re-runs, repartitioning, and incremental data arrival; no shuffle, no
  *     global state. This is the production-safe way to carve train/val/test.
  *   - [[packSequences]] packs within hash shards: a global pack order would
  *     serialize the whole corpus through one window partition, so documents
  *     are sharded by salted hash (shard count scales with the cluster) and
  *     the cumulative-token window runs per shard in parallel. Chunk identity
  *     is (shard, chunk_id).
  */
object Sampling {

  /** `md5Lower63(salt + id)` as codegen columns — the round-11 native
    * kernel ([[PortableHash.md5Lower63Col]]) replacing the per-row UDF on
    * every sampling gate's hash path. Bit-identical by the kernel's own
    * property test. */
  private def hashCol(salt: String, id: Column): Column =
    PortableHash.md5Lower63Col(concat(lit(salt), id.cast("string")))

  /** Deterministic train/val/test assignment: bucket = salted-MD5(doc_id)
    * mod 1000; < 900 train, < 950 val, else test (90/5/5). */
  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        (hashCol("split:", col("doc_id")) % 1000).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** Token-budget sequence packing (stream-window form): documents in doc_id
    * order within a hash shard are assigned to the chunk in which their first
    * token falls — chunk_id = floor(cumulative_tokens_before / budget).
    * Documents are never split; a document straddling a boundary belongs to
    * the chunk where it starts. Token count is the BPE-ish regex
    * segmentation shared with [[TextAnalysis.tokens]]. */
  def packSequences(spark: SparkSession, sfDir: String,
      budget: Long = 2048L, nShards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, sfDir)
      .select(col("doc_id"),
        (hashCol("shard:", col("doc_id")) % nShards).as("shard"),
        regexp_count(lower(col("text")), lit(TextAnalysis.BpeTokenRegex))
          .cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("chunk_id"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: for every train/val document, the fraction
    * of its distinct word-8-gram hashes that appear anywhere in the test
    * split (the held-out set of [[sampleSplit]]). Standard LLM-pipeline
    * hygiene — test data leaking into train inflates evals.
    *
    * Scale shape: the benchmark side is small by construction (5% here; real
    * benchmark suites are tiny), so its distinct-hash set broadcasts and the
    * probe is a map-side semi-join — the 100 TB train side never shuffles.
    * 8-byte hashes only; document text never leaves the scan. */
  /** Distinct word-8-gram 63-bit hashes per token list — [[decontaminate]]'s
    * gram extractor (object-level so UdfAuditProbe measures the production
    * closure; the audit verdict lives in SCALE.md's UDF table). */
  private[graft] val ngramHash8Udf = udf { (toks: Seq[String]) =>
    val k = 8
    if (toks.length < k) Seq.empty[Long]
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i + k - 1 < toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(PortableHash.md5Lower63(sb.toString))
        i += 1
      }
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.map(_.longValue())
    }
  }

  def decontaminate(spark: SparkSession, sfDir: String,
      flagThreshold: Double = 0.1): DataFrame = {
    val ngramHashUdf = ngramHash8Udf
    val withSplit = documents(spark, sfDir)
      .select(col("doc_id"),
        (hashCol("split:", col("doc_id")) % 1000).as("bucket"),
        ngramHashUdf(split(col("text"), " ")).as("gh"))
    val trainSide = withSplit.filter(col("bucket") < 950)
      .select(col("doc_id"), col("gh"))
    val testGrams = withSplit.filter(col("bucket") >= 950)
      .select(explode(col("gh")).as("h")).distinct()
    val hits = trainSide.select(col("doc_id"), explode(col("gh")).as("h"))
      .join(broadcast(testGrams), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    trainSide
      .select(col("doc_id"), size(col("gh")).cast("long").as("n_8grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contam_frac",
        when(col("n_8grams") > 0, col("n_hit") / col("n_8grams")).otherwise(0.0))
      .withColumn("is_contaminated", col("contam_frac") >= flagThreshold)
      .orderBy(col("doc_id"))
  }

  /** Stratified (per-source rate) sampling — domain re-weighting: keep each
    * document with its source's rate, decided by a salted-MD5 bucket
    * compared against an INTEGER permille threshold (no FP anywhere, so the
    * decision is bit-identical on any engine and stable under re-runs /
    * repartitioning, like [[sampleSplit]]). Every document is emitted with
    * its verdict so downstream stages can audit the rates.
    *
    * `ratesPermille` maps source → keep-rate in 1/1000ths; sources not in
    * the map fall back to a deterministic hash-derived rate in [200, 800)
    * (the gate/demo configuration — production callers pass their domain
    * weights explicitly). Pure map, no shuffle.
    *
    * NULL semantics: the rate/bucket hashes go through SQL `concat`, which
    * propagates a NULL `source`/`doc_id` to a NULL `kept` — exactly what
    * the DuckDB twin's `||` computes (the engines agree), but NOT what the
    * pre-round-11 Scala UDF did (it hashed a "null" string concatenation to
    * a boolean). The documents table's `doc_id`/`source` are non-null by
    * schema; callers with nullable inputs should coalesce explicitly. */
  def sampleStratified(spark: SparkSession, sfDir: String,
      ratesPermille: Map[String, Long] = Map.empty): DataFrame = {
    // bucket, rate and verdict as codegen columns (explicit rates become
    // CASE arms — exactly how the oracle twin renders them)
    val fallbackRate = lit(200L) +
      PortableHash.md5Lower63Col(concat(lit("rate:"), col("source"))) % 600L
    val rate = ratesPermille.toSeq.sortBy(_._1).foldRight(fallbackRate) {
      case ((s, r), acc) => when(col("source") === s, lit(r)).otherwise(acc)
    }
    val bucket = hashCol("strat:", col("doc_id")) % 1000000L
    documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        (bucket < rate * 1000L).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[sampleStratified]] (explicit rates inlined as CASE
    * arms; absent sources get the hash-derived fallback). */
  def sampleStratifiedOracleSql(ratesPermille: Map[String, Long] = Map.empty): String = {
    val fallback =
      "200 + CAST(md5_number_lower('rate:' || source) & 9223372036854775807 AS BIGINT) % 600"
    val rateExpr =
      if (ratesPermille.isEmpty) fallback
      else {
        // SQL-escape the source key — a value containing a single quote
        // would otherwise break (or inject into) the generated oracle
        val arms = ratesPermille.toSeq.sortBy(_._1)
          .map { case (s, r) => s"WHEN source = '${s.replace("'", "''")}' THEN $r" }
          .mkString(" ")
        s"CASE $arms ELSE $fallback END"
      }
    s"""SELECT doc_id, source,
       |  CAST(md5_number_lower('strat:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000000
       |    < ($rateExpr) * 1000 AS kept
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Deterministic WEIGHTED sampling — k documents per source, selection
    * probability proportional to document size (priority sampling:
    * priority = hash/weight, keep the k smallest priorities). The
    * classical weighted-reservoir key (Efraimidis–Spirakis u^(1/w)) needs
    * a pow — not cross-engine-portable and RNG-seeded; the integer form
    * `⌊h/w⌋` (portable `div` ≡ DuckDB `//`, h = 63-bit md5 of the doc id)
    * keeps the same size-biased ordering while being a pure function of
    * the row set: no RNG, re-runs and engines agree row-for-row, and
    * incremental arrival cannot reshuffle earlier picks.
    *
    * Scale shape: weight + priority are a map pass; the per-source top-k
    * is one window over (source) — at fleet scale the same per-group
    * top-k every `topTerms`-style query pays, and k rows per source is
    * the only state that survives. */
  def sampleWeighted(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val prio = documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        greatest(col("n_chars"), lit(1L)).as("weight"),
        PortableHash.md5Lower63Col(
          concat(lit("wsample:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("priority", expr("h div weight"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    prio.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("doc_id"), col("weight"),
        col("priority"))
      .orderBy(col("source"), col("rank"))
  }

  /** DuckDB twin of [[sampleWeighted]] (`//` ≡ Spark `div`). */
  def sampleWeightedOracleSql(k: Int = 10): String =
    s"""WITH d AS (
       |  SELECT source, doc_id, greatest(n_chars, 1) AS weight,
       |    CAST(md5_number_lower('wsample:' || doc_id) & 9223372036854775807 AS BIGINT) AS h
       |  FROM documents
       |), p AS (
       |  SELECT source, doc_id, weight, h // weight AS priority,
       |    row_number() OVER (PARTITION BY source ORDER BY h // weight, doc_id) AS rank
       |  FROM d
       |)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, weight, priority
       |FROM p WHERE rank <= $k ORDER BY source, rank""".stripMargin

  /** Per-source mixture statistics for domain weighting: document/token
    * counts, distinct languages, exact-decimal mean quality score. One
    * small-key groupBy. */
  def sourceMixStats(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextAnalysis.quality(spark, sfDir).select(col("doc_id"), col("quality_score"))
    documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        regexp_count(lower(col("text")), lit(TextAnalysis.BpeTokenRegex))
          .cast("long").as("n_tokens"))
      .join(q, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        Tables.exactAvg(col("quality_score")).as("avg_quality"))
      .orderBy(col("source"))
  }

  /** α-TEMPERATURE source mixing (α = 0.5): sampling weights ∝ n_s^α —
    * the standard corpus-mixing rule that upsamples small sources and
    * damps dominant ones when assembling a training epoch (α=1 is
    * proportional, α=0 uniform; 0.5 is the common middle). Emitted next
    * to the raw proportions so the flattening is visible in the gate row.
    *
    * Determinism: `sqrt` of an exact integer count is ONE correctly-
    * rounded IEEE op (identical on every engine, unlike `pow`/`ln`);
    * each weight is portably rounded to 6 dp and summed as exact
    * DECIMAL, so the normalizing total is bit-identical regardless of
    * source order or partitioning. All division happens on the |sources|-
    * row aggregate. */
  def mixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w6",
        Tables.portableRound6(sqrt(col("n_docs"))).cast("decimal(28,6)"))
    val tot = counts.agg(sum(col("w6")).as("wtot"), sum(col("n_docs")).as("ntot"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        col("w6").cast("double").as("weight6"),
        Tables.portableRound6(
          col("w6").cast("double") / col("wtot").cast("double")).as("p_temp"),
        Tables.portableRound6(
          col("n_docs").cast("double") / col("ntot").cast("double")).as("p_raw"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of [[mixTemperature]]. */
  def mixTemperatureOracleSql: String =
    s"""WITH c AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(${Tables.portableRound6Sql("sqrt(count(*))")} AS DECIMAL(28,6)) AS w6
       |  FROM documents GROUP BY 1
       |), t AS (
       |  SELECT CAST(sum(w6) AS DECIMAL(38,6)) AS wtot,
       |    CAST(sum(n_docs) AS BIGINT) AS ntot
       |  FROM c
       |)
       |SELECT source, n_docs, CAST(w6 AS DOUBLE) AS weight6,
       |  ${Tables.portableRound6Sql(
           "CAST(w6 AS DOUBLE) / CAST(wtot AS DOUBLE)")} AS p_temp,
       |  ${Tables.portableRound6Sql(
           "CAST(n_docs AS DOUBLE) / CAST(ntot AS DOUBLE)")} AS p_raw
       |FROM c, t
       |ORDER BY source""".stripMargin

  /** Shard count for [[packShards]]. */
  val PackShardCount = 8

  /** BALANCED training-shard assignment — documents dealt to
    * [[PackShardCount]] shards in SNAKE order by size rank (rank 1..N by
    * (n_chars desc, doc_id); shard = boustrophedon position of the rank),
    * so every shard gets one document from each consecutive size band:
    * the deterministic load-balancing rule for equal-byte training shards
    * (greedy bin packing balances marginally better but is inherently
    * sequential and arrival-order-dependent — un-oracle-able and
    * un-parallelizable; the snake is ONE rank + modulo arithmetic).
    * Output: per-shard doc count, byte total, and the ppm deviation from
    * the ideal equal share — the balance audit.
    *
    * Scale shape: the global size rank is [[Ranks.globalRank]]'s
    * distributed range-sort + offset-join pass (NO unpartitioned window —
    * an empty-key `row_number` would plan Exchange SinglePartition and
    * funnel the corpus through one task); everything after is a
    * [[PackShardCount]]-row aggregate, and the grand total joins back as a
    * broadcast 1-row aggregate instead of an empty-key window. The plan
    * carries zero `windowspecdefinition`s (PlanSpec-asserted). */
  def packShards(spark: SparkSession, sfDir: String): DataFrame = {
    val s = PackShardCount
    val ranked = Ranks.globalRank(
        documents(spark, sfDir).select(col("doc_id"), col("n_chars")),
        "rk", Seq(col("n_chars").desc, col("doc_id")))
      // snake: ranks 1..s go to shards 0..s-1, ranks s+1..2s to s-1..0, …
      .withColumn("pos", expr(s"(rk - 1) % (2 * $s)"))
      .withColumn("shard",
        expr(s"IF(pos < $s, pos, 2 * $s - 1 - pos)").cast("long"))
    val bands = ranked.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("shard_chars"))
    val tot1 = bands.agg(sum(col("shard_chars")).as("tot"))
    bands
      .crossJoin(broadcast(tot1))
      .select(col("shard"), col("n_docs"), col("shard_chars"),
        // ppm deviation from the ideal tot/s share as |dev| + sign —
        // absolute so the floor division stays on NON-NEGATIVE integers
        // (Spark `div` truncates toward zero, DuckDB `//` floors; they
        // agree only for non-negative operands)
        expr(s"(abs($s * shard_chars - tot) * 1000000) div tot").as("dev_abs_ppm"),
        expr(s"$s * shard_chars >= tot").as("over_ideal"))
      .orderBy(col("shard"))
  }

  /** DuckDB twin of [[packShards]]. */
  def packShardsOracleSql: String = {
    val s = PackShardCount
    s"""WITH r AS (
       |  SELECT doc_id, n_chars,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM documents
       |), sh AS (
       |  SELECT n_chars,
       |    CAST(CASE WHEN (rk - 1) % (2 * $s) < $s THEN (rk - 1) % (2 * $s)
       |         ELSE 2 * $s - 1 - (rk - 1) % (2 * $s) END AS BIGINT) AS shard
       |  FROM r
       |), b AS (
       |  SELECT shard, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS shard_chars
       |  FROM sh GROUP BY 1
       |)
       |SELECT shard, n_docs, shard_chars,
       |  (abs($s * shard_chars - CAST(sum(shard_chars) OVER () AS BIGINT)) * 1000000)
       |    // CAST(sum(shard_chars) OVER () AS BIGINT) AS dev_abs_ppm,
       |  $s * shard_chars >= CAST(sum(shard_chars) OVER () AS BIGINT) AS over_ideal
       |FROM b ORDER BY shard""".stripMargin
  }

  /** CLASS-BALANCED sampling over labeled embeddings: every class is cut
    * to the SIZE OF THE SMALLEST class, members chosen by deterministic
    * hash rank (`md5('bal:' || id)`) — the equal-representation
    * downsampling used before training on skewed labels (contrast
    * [[stratified]], which PRESERVES per-stratum proportions). The cap
    * comes from a one-row aggregate broadcast into a per-class
    * `row_number` filter: one shuffle on `label`, no global sort, and
    * the hash rank makes the kept set a pure function of the data. */
  def sampleBalanced(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, sfDir).select(col("vec_id"), col("label"))
    val cap = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("cap"))
    val w = Window.partitionBy(col("label")).orderBy(col("h"), col("vec_id"))
    e.withColumn("h", graft.functions.PortableHash.md5Lower63Col(
        concat(lit("bal:"), col("vec_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("rn") <= col("cap"))
      .select(col("vec_id"), col("label"))
      .orderBy(col("label"), col("vec_id"))
  }

  /** DuckDB twin of [[sampleBalanced]]. */
  def sampleBalancedOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    CAST(md5_number_lower('bal:' || CAST(vec_id AS VARCHAR))
       |      & 9223372036854775807 AS BIGINT) AS h
       |  FROM embeddings
       |), cap AS (
       |  SELECT min(n) AS cap FROM (
       |    SELECT label, count(*) AS n FROM e GROUP BY 1
       |  )
       |), r AS (
       |  SELECT vec_id, label,
       |    row_number() OVER (PARTITION BY label ORDER BY h, vec_id) AS rn
       |  FROM e
       |)
       |SELECT vec_id, label FROM r, cap WHERE rn <= cap
       |ORDER BY label, vec_id""".stripMargin

  // ---- DuckDB oracle SQL ---------------------------------------------------

  /** DuckDB twin of [[sampleSplit]]. */
  def sampleSplitOracleSql: String =
    s"""SELECT doc_id, lang,
       |  CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 AS bucket,
       |  CASE WHEN CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 < 900 THEN 'train'
       |       WHEN CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 < 950 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[decontaminate]]. */
  def decontaminateOracleSql(flagThreshold: Double = 0.1): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 AS bucket
       |  FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id, bucket,
       |    CAST(md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
       |      w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]) & 9223372036854775807 AS BIGINT) AS h
       |  FROM d, unnest(range(1, len(w) - 6)) AS t(i)
       |), test_g AS (
       |  SELECT DISTINCT h FROM g WHERE bucket >= 950
       |), sizes AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_8grams
       |  FROM g WHERE bucket < 950 GROUP BY doc_id
       |), hits AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM g JOIN test_g ON g.h = test_g.h
       |  WHERE g.bucket < 950 GROUP BY g.doc_id
       |)
       |SELECT d.doc_id, coalesce(s.n_8grams, 0) AS n_8grams,
       |  coalesce(h.n_hit, 0) AS n_hit,
       |  CASE WHEN coalesce(s.n_8grams, 0) > 0
       |       THEN coalesce(h.n_hit, 0) / s.n_8grams ELSE 0.0 END AS contam_frac,
       |  (CASE WHEN coalesce(s.n_8grams, 0) > 0
       |        THEN coalesce(h.n_hit, 0) / s.n_8grams ELSE 0.0 END) >= $flagThreshold AS is_contaminated
       |FROM d
       |LEFT JOIN sizes s ON d.doc_id = s.doc_id
       |LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.bucket < 950
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of [[sourceMixStats]] (quality formula shared with the
    * text_quality oracle via [[TextAnalysis.qualityScoreSqlExpr]]). */
  def sourceMixStatsOracleSql: String =
    s"""WITH b AS (
       |  ${TextAnalysis.qualityCountsSqlCte}
       |), q AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.qualityScoreSqlExpr("n_distinct", "n_stop", "n_tokens")} AS quality_score
       |  FROM b
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(SUM(CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.BpeTokenRegex}')) AS BIGINT)) AS BIGINT) AS total_tokens,
       |  count(DISTINCT lang) AS n_langs,
       |  ${Tables.portableRound6Sql("CAST(SUM(CAST(q.quality_score AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)")} AS avg_quality
       |FROM documents JOIN q USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of [[packSequences]]. */
  def packSequencesOracleSql(budget: Long = 2048L, nShards: Int = 32): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(md5_number_lower('shard:' || doc_id) & 9223372036854775807 AS BIGINT) % $nShards AS shard,
       |    CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.BpeTokenRegex}')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens,
       |  CAST((cum - n_tokens) // $budget AS BIGINT) AS chunk_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** Per-group sample size / pre-aggregation salt width for
    * [[sampleReservoir]]. */
  val ReservoirK = 25
  val ReservoirSalts = 32

  /** Deterministic fixed-size per-group sample — the reservoir-sampling
    * analog under this library's no-RNG rule: within each `source`, keep
    * the [[ReservoirK]] documents with the smallest salted-MD5 rank
    * (tiebreak doc_id). A hash rank is a uniform random order that any
    * engine can recompute, so the "reservoir" is stable under re-runs,
    * repartitioning, and data arrival order — the properties streaming
    * reservoir algorithms buy with per-run RNG state, here for free.
    *
    * Scale shape: `source` is a LOW-cardinality group key, so a single
    * `row_number` window would funnel each group through one partition (a
    * hot-partition serialization at 100 TB). Instead the top-k runs in two
    * levels — per (source, hash-salt) candidate top-k under the window,
    * then the final top-k over ≤ [[ReservoirSalts]]·k survivors per group
    * — the [[QuerySurface.saltedAgg]] rewrite applied to order statistics.
    * Identical output to the single-window form by construction (each
    * salt's global top-k members survive its local top-k), which is what
    * the single-window DuckDB twin certifies. */
  def sampleReservoir(spark: SparkSession, sfDir: String,
      k: Int = ReservoirK, salts: Int = ReservoirSalts): DataFrame = {
    val ranked = documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        hashCol("rsv:", col("doc_id")).as("h"))
    val local = ranked
      .withColumn("salt", col("h") % salts)
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("source"), col("salt"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("lrn") <= k)
    local
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("h"))
      .orderBy(col("source"), col("rn"))
  }

  /** Chunk length / stride (words) for [[chunkOverlap]]. */
  val ChunkLen = 64
  val ChunkStride = 48

  /** Overlapping document chunking — the RAG/retrieval-indexing complement
    * to [[packSequences]] (which packs whole documents into budgets, never
    * splitting): each document yields fixed [[ChunkLen]]-word windows at
    * stride [[ChunkStride]] (the overlap keeps boundary-spanning passages
    * retrievable), each chunk carrying its offset, length, and a portable
    * 63-bit content hash (chunk-level dedup/lineage key — two docs sharing
    * a verbatim chunk collide here, by design). The final (short) window
    * is kept iff it adds tokens beyond the previous chunk. Pure per-row
    * explode — linear, no shuffle; chunk identity is (doc_id, chunk_id).
    */
  /** The per-document chunk extractor of [[chunkOverlap]] (object-level so
    * UdfAuditProbe measures the production closure at a given len/stride). */
  private[graft] def chunkUdfFor(len: Int, stride: Int) =
    udf { (toks: Seq[String]) =>
      val n = toks.length
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var i = 0
      var cid = 0L
      while (i < n) {
        val w = math.min(len, n - i)
        out += ((cid, i.toLong, w.toLong,
          PortableHash.md5Lower63(toks.slice(i, i + w).mkString(" "))))
        cid += 1L
        if (i + len >= n) i = n else i += stride
      }
      out.toSeq
    }

  def chunkOverlap(spark: SparkSession, sfDir: String, len: Int = ChunkLen,
      stride: Int = ChunkStride): DataFrame = {
    val chunkUdf = chunkUdfFor(len, stride)
    documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(chunkUdf(col("t"))).as("c"))
      .select(col("doc_id"), col("c._1").as("chunk_id"),
        col("c._2").as("start_tok"), col("c._3").as("n_toks"),
        col("c._4").as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** DuckDB twin of [[chunkOverlap]] — stride positions via range(), the
    * same keep-final-window rule, and the portable chunk hash. */
  def chunkOverlapOracleSql(len: Int = ChunkLen, stride: Int = ChunkStride): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
       |  FROM documents
       |), pos AS (
       |  -- stride starts strictly below n; the loop's "jump to end" rule
       |  -- means a start is emitted iff start = 0 or start < n
       |  SELECT doc_id, w, n, unnest(range(0, greatest(n, 1), $stride)) AS i
       |  FROM t
       |), keepers AS (
       |  -- the Spark loop jumps to n once a window reaches the end, so a
       |  -- start position i > 0 survives only if the PREVIOUS start's
       |  -- window did not already cover the tail: i - $stride + $len < n
       |  SELECT doc_id, w, n, i FROM pos
       |  WHERE i = 0 OR i - $stride + $len < n
       |), c AS (
       |  SELECT doc_id, i,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_id,
       |    least($len, n - i) AS n_toks,
       |    CAST(md5_number_lower(array_to_string(w[i+1:i+least($len, n - i)], ' '))
       |      & 9223372036854775807 AS BIGINT) AS chunk_hash
       |  FROM keepers
       |)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(i AS BIGINT) AS start_tok, CAST(n_toks AS BIGINT) AS n_toks,
       |  chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** DuckDB twin of [[sampleReservoir]] — the SINGLE-window form; matching
    * it certifies the two-level salted rewrite is semantics-preserving. */
  def sampleReservoirOracleSql(k: Int = ReservoirK): String =
    s"""WITH r AS (
       |  SELECT source, doc_id,
       |    CAST(md5_number_lower('rsv:' || doc_id) & 9223372036854775807 AS BIGINT) AS h
       |  FROM documents
       |), ranked AS (
       |  SELECT source, doc_id, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |  FROM r
       |)
       |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, h
       |FROM ranked WHERE rn <= $k
       |ORDER BY source, rn""".stripMargin

  /** K-FOLD cross-validation assignment with balance accounting — the
    * eval-methodology sibling of [[sampleSplit]]: every document lands in
    * fold `md5(doc_id) mod k` (deterministic, reshuffle-free, stable under
    * corpus growth — a new document never moves an old one between folds,
    * which is exactly why hash folds beat random assignment in pipelines),
    * and the output reports, per (fold, lang), how far the fold deviates
    * from a perfectly even split of that language (exact integer ppm —
    * the number that tells you whether per-fold eval variance is
    * assignment skew or signal).
    *
    * Scale shape: one map pass + a k·|langs|-key map-side-combined
    * aggregate + a |langs|-row broadcast join. Nothing row-scale ever
    * shuffles twice. */
  def sampleKfold(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val folds = documents(spark, sfDir).select(col("doc_id"), col("lang"),
      (hashCol("fold:", col("doc_id")) % k).as("fold"))
    val cells = folds.groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = folds.groupBy(col("lang"))
      .agg(count(lit(1)).as("lang_total"))
    cells.join(broadcast(totals), Seq("lang"))
      .select(col("fold"), col("lang"), col("n_docs"), col("lang_total"),
        expr(s"(abs($k * n_docs - lang_total) * 1000000) div lang_total")
          .as("dev_ppm"))
      .orderBy(col("fold"), col("lang"))
  }

  /** DuckDB twin of [[sampleKfold]]. */
  def sampleKfoldOracleSql(k: Int = 5): String =
    s"""WITH f AS (
       |  SELECT doc_id, lang,
       |    CAST(md5_number_lower('fold:' || doc_id) & 9223372036854775807
       |      AS BIGINT) % $k AS fold
       |  FROM documents
       |), cells AS (
       |  SELECT fold, lang, count(*) AS n_docs FROM f GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, count(*) AS lang_total FROM f GROUP BY 1
       |)
       |SELECT c.fold, c.lang, c.n_docs, t.lang_total,
       |  CAST(abs($k * c.n_docs - t.lang_total) * 1000000 // t.lang_total
       |    AS BIGINT) AS dev_ppm
       |FROM cells c JOIN tot t ON c.lang = t.lang
       |ORDER BY c.fold, c.lang""".stripMargin

  /** Epochs for [[epochOrder]], shared with its oracle. */
  val EpochOrderEpochs = 3

  /** DETERMINISTIC MULTI-EPOCH TRAINING ORDER — the reproducible
    * data-order primitive: every training run (and every resume-from-step)
    * must see the SAME document sequence, and each epoch must be a fresh
    * permutation, without any stateful shuffle. Position of a document in
    * epoch e is its rank under the 63-bit md5 of `"ep<e>:<doc_id>"` —
    * a pure function of (corpus, epoch), so any worker can recompute any
    * slice of the order independently (the property data loaders need for
    * sharded resumption).
    *
    * Scale shape: the per-epoch permutation genuinely needs a total order,
    * but NOT a window — ranks come from ONE [[Ranks.globalRank]] pass over
    * the composite (epoch, hash) order (range sort + broadcast offset
    * join, no SinglePartition funnel), and per-epoch positions are
    * recovered arithmetically as `rank − epoch·N` because every epoch
    * carries exactly the N corpus documents. */
  def epochOrder(spark: SparkSession, sfDir: String,
      epochs: Int = EpochOrderEpochs): DataFrame = {
    val docs = documents(spark, sfDir).select(col("doc_id"))
    val keyed = docs
      .select(col("doc_id"),
        explode(array((0 until epochs).map(lit(_)): _*)).as("epoch"))
      .withColumn("h", PortableHash.md5Lower63Col(
        concat(lit("ep"), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
    val n1 = docs.agg(count(lit(1)).as("n_docs"))
    Ranks.globalRank(keyed, "rk",
        Seq(col("epoch"), col("h"), col("doc_id")))
      .crossJoin(broadcast(n1))
      .select(col("epoch").cast("long").as("epoch"),
        (col("rk") - col("epoch") * col("n_docs")).as("pos"),
        col("doc_id"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** DuckDB twin of [[epochOrder]] — the single-window form; matching it
    * certifies the composite-rank + offset arithmetic. */
  def epochOrderOracleSql(epochs: Int = EpochOrderEpochs): String =
    s"""WITH e AS (
       |  SELECT CAST(ep.e AS BIGINT) AS epoch FROM range($epochs) ep(e)
       |), x AS (
       |  SELECT e.epoch, d.doc_id,
       |    CAST(md5_number_lower('ep' || CAST(e.epoch AS VARCHAR) || ':'
       |        || CAST(d.doc_id AS VARCHAR))
       |      & 9223372036854775807 AS BIGINT) AS h
       |  FROM documents d CROSS JOIN e
       |)
       |SELECT epoch,
       |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
       |    AS BIGINT) AS pos,
       |  doc_id
       |FROM x ORDER BY epoch, pos""".stripMargin

  // ---- preference-pair construction (DPO/RLHF-style) ------------------------

  /** PREFERENCE-PAIR CONSTRUCTION — the best-vs-worst pair mining step of a
    * DPO/reward-model pipeline: within each `source` group, rank documents
    * by an integer quality surrogate (lexical diversity in ppm —
    * `n_distinct·10⁶ div n_tokens`, ties → doc_id) and pair rank i from the
    * top with rank i from the bottom, keeping pairs whose quality gap is
    * strictly positive (a chosen/rejected pair with no gap carries no
    * preference signal). Entirely integer arithmetic — hash-exact by
    * construction.
    *
    * Scale shape: one map pass computes the surrogate (no text leaves the
    * scan — the shuffle carries (source, doc_id, score)); two
    * source-keyed rank windows (never empty-key); the pairing is a self-join
    * on (source, pair rank) — |docs|/2 keys, co-partitioned. At 100 TB
    * sources are the natural partition (each window sees one source's
    * docs); a single giant source would use the [[graft.operators.Ranks]]
    * distributed-rank pass instead of the window. */
  def preferencePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = documents(spark, sfDir).select(
      col("source"), col("doc_id"),
      expr("(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000)" +
        " div CAST(size(split(text, ' ')) AS BIGINT)").as("score"))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    val ranked = scored
      .withColumn("rn", row_number().over(wTop))
      .withColumn("n", count(lit(1)).over(wAll))
    val top = ranked.filter(col("rn") * 2 <= col("n"))
      .select(col("source"), col("rn").as("pair_idx"),
        col("doc_id").as("chosen_id"), col("score").as("chosen_score"))
    val bottom = ranked.filter(col("rn") * 2 > col("n"))
      .select(col("source"), (col("n") - col("rn") + 1).as("pair_idx"),
        col("doc_id").as("rejected_id"), col("score").as("rejected_score"))
    top.join(bottom, Seq("source", "pair_idx"))
      .filter(col("chosen_score") > col("rejected_score"))
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .select(col("source"), col("pair_idx"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        col("gap"))
      .orderBy(col("source"), col("pair_idx"))
  }

  /** DuckDB twin of [[preferencePairs]] — identical surrogate, rank
    * tie-breaks, and mirror pairing. */
  def preferencePairsOracleSql: String =
    """WITH s AS (
      |  SELECT source, doc_id,
      |    (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000)
      |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
      |  FROM documents
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM s
      |), top AS (
      |  SELECT source, CAST(rn AS BIGINT) AS pair_idx, doc_id AS chosen_id,
      |    score AS chosen_score
      |  FROM r WHERE rn * 2 <= n
      |), bottom AS (
      |  SELECT source, CAST(n - rn + 1 AS BIGINT) AS pair_idx,
      |    doc_id AS rejected_id, score AS rejected_score
      |  FROM r WHERE rn * 2 > n
      |)
      |SELECT top.source, top.pair_idx, chosen_id, rejected_id,
      |  chosen_score, rejected_score,
      |  chosen_score - rejected_score AS gap
      |FROM top JOIN bottom
      |  ON top.source = bottom.source AND top.pair_idx = bottom.pair_idx
      |WHERE chosen_score > rejected_score
      |ORDER BY top.source, top.pair_idx""".stripMargin

  // ---- mix concentration (Simpson / HHI) ------------------------------------

  /** MIX CONCENTRATION per language — the Simpson index `D = Σ pᵢ²` of the
    * source distribution (equivalently the Herfindahl–Hirschman
    * concentration index), plus its inverse, the EFFECTIVE SOURCE COUNT
    * `1/D` — the "how many sources is this corpus *really* drawing from?"
    * number a mix designer tracks (log-free, unlike Shannon entropy —
    * libm logs are never evaluated in-engine, the q_benford rule). Kept
    * exact by cross-multiplication: `D_ppm = Σnᵢ²·10⁶ div N²` is pure
    * integer; `1/D = N²/Σnᵢ²` is one shared double division.
    *
    * Scale shape: ONE map-side-combined (lang, source) count — key space
    * |langs|·|sources| — then a |langs|-key aggregate of squared counts.
    * The row-scale pass is the first count; everything after is
    * constant-size. */
  def mixSimpson(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = documents(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("n")).as("n_docs"),
        sum(col("n") * col("n")).as("sum_sq"))
      .withColumn("simpson_ppm",
        expr("(sum_sq * 1000000) div (n_docs * n_docs)"))
      .withColumn("effective_sources", Tables.portableRound6(
        expr("CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_sq AS DOUBLE)")))
      .orderBy(col("lang"))
  }

  /** DuckDB twin of [[mixSimpson]] — identical integer cross-multiplied
    * index and shared inverse expression. */
  def mixSimpsonOracleSql: String =
    s"""WITH c AS (
       |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
       |), g AS (
       |  SELECT lang, count(*) AS n_sources,
       |    CAST(sum(n) AS BIGINT) AS n_docs,
       |    CAST(sum(n * n) AS BIGINT) AS sum_sq
       |  FROM c GROUP BY 1
       |)
       |SELECT lang, n_sources, n_docs, sum_sq,
       |  (sum_sq * 1000000) // (n_docs * n_docs) AS simpson_ppm,
       |  ${Tables.portableRound6Sql(
            "CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_sq AS DOUBLE)")}
       |    AS effective_sources
       |FROM g ORDER BY lang""".stripMargin

  // ---- DSIR-shaped importance selection (hashed n-gram data selection) ----

  /** Hash buckets for the bigram feature space (DSIR's "hashed n-gram"
    * dimensionality; 10⁴ in the paper, 2¹² here so the sf0.01 corpus still
    * produces meaningful bucket collisions). */
  val DsirBuckets = 4096L

  /** The target-domain sample: documents from these sources define the
    * distribution the selection steers toward. */
  val DsirTargetSources: Seq[String] = Seq("src0", "src1", "src2")

  /** Documents selected from the pool. */
  val DsirTopK = 100

  /** Data Selection with Importance Resampling, the hashed-n-gram form
    * (Xie et al. 2023, arXiv:2302.03169), re-expressed in the engine's
    * integer fixed-point discipline: score each POOL document by how much
    * more likely its word bigrams are under the TARGET domain's hashed
    * bigram distribution than under the pool's own.
    *
    *   - features: word bigrams hashed into [[DsirBuckets]] buckets via the
    *     portable md5 kernel (already non-negative, so plain `%` is safe);
    *   - bucket model: Laplace-smoothed count ratio in fixed point,
    *     `r_fp(b) = ((c_tgt(b)+1)·10⁶) div (c_pool(b)+1)`. The paper's
    *     weight multiplies this by the constant `(N_pool+B)/(N_tgt+B)`;
    *     a per-corpus CONSTANT factor cannot change any document ordering,
    *     so it is dropped to keep every value integer-exact;
    *   - per-document score: the MEAN per-occurrence ratio,
    *     `sum(r_fp) div n_bigrams` — the arithmetic-mean form of the
    *     paper's geometric-mean (log-sum) score. The deviation is
    *     deliberate and documented: a transcendental `ln` mid-pipeline
    *     would be the engine's only double-rounding hash risk across two
    *     engines, and both forms rank by target-likeness (they agree on
    *     the tails the selection actually takes; the mean-ratio form
    *     up-weights documents with a few strongly-target bigrams over
    *     uniformly-mild ones).
    *
    * Scale shape (100 TB): both count tables are bounded by
    * [[DsirBuckets]], so the model is a BROADCAST join onto the exploded
    * bigram stream — the corpus-sized side shuffles once (the per-doc
    * aggregate), never joins against itself. Overflow: `sum(r_fp)` per doc
    * is bounded by doc_bigrams · max r_fp; with hashed buckets
    * max r_fp ≈ 10⁶ · (target share of its hottest bucket), so BIGINT
    * holds until a single bucket concentrates ~10¹² target bigrams —
    * raise [[DsirBuckets]] long before that. */
  def sampleDsir(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
    val isTgt = col("source").isin(DsirTargetSources: _*)
    val bi = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("source"),
        (PortableHash.md5Lower63Col(col("bg")) % DsirBuckets).as("b"))
    val tgtC = bi.filter(isTgt).groupBy(col("b")).agg(count(lit(1)).as("c_t"))
    val pool = bi.filter(!isTgt)
    val poolC = pool.groupBy(col("b")).agg(count(lit(1)).as("c_s"))
    // every pool bucket is present in poolC by construction, so the model
    // join below is total for pool rows; target-only buckets are never
    // probed and can be dropped with the left join
    val model = poolC.join(tgtC, Seq("b"), "left")
      .select(col("b"),
        expr("((coalesce(c_t, 0L) + 1L) * 1000000L) div (c_s + 1L)").as("r_fp"))
    pool.join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r_fp")).as("s"))
      .withColumn("score_fp", expr("s div n_bigrams"))
      .drop("s")
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  /** DuckDB twin of [[sampleDsir]] — same hash kernel idiom
    * (`md5_number_lower & maxlong`), same smoothing, `//` ≡ `div`; the
    * HUGEINT sum is cast back to BIGINT after the integer divide. */
  def sampleDsirOracleSql: String = {
    val tgt = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
       |), bi AS (
       |  SELECT doc_id, source,
       |    CAST(md5_number_lower(w[i] || ' ' || w[i+1])
       |      & 9223372036854775807 AS BIGINT) % $DsirBuckets AS b
       |  FROM toks, unnest(range(1, len(w))) AS t(i)
       |), tgtc AS (
       |  SELECT b, count(*) AS c_t FROM bi WHERE source IN ($tgt) GROUP BY b
       |), pool AS (
       |  SELECT * FROM bi WHERE source NOT IN ($tgt)
       |), poolc AS (
       |  SELECT b, count(*) AS c_s FROM pool GROUP BY b
       |), model AS (
       |  SELECT p.b,
       |    ((COALESCE(t.c_t, 0) + 1) * 1000000) // (p.c_s + 1) AS r_fp
       |  FROM poolc p LEFT JOIN tgtc t ON p.b = t.b
       |)
       |SELECT p.doc_id, p.source,
       |  count(*) AS n_bigrams,
       |  CAST(SUM(m.r_fp) // count(*) AS BIGINT) AS score_fp
       |FROM pool p JOIN model m ON p.b = m.b
       |GROUP BY p.doc_id, p.source
       |ORDER BY score_fp DESC, p.doc_id LIMIT $DsirTopK""".stripMargin
  }

  // ---- token-budget corpus assembly ----------------------------------------

  /** Budget share kept by [[sampleTokenBudget]]: 60% of corpus tokens. */
  private val TokenBudgetPct = 60L

  /** TOKEN-BUDGET corpus assembly: the "we can afford N tokens, keep the
    * best documents that fit" step every training run ends with. Greedy by
    * quality: rank documents by ([[TextAnalysis.quality]] score desc,
    * doc_id), running-sum their whitespace token counts in that order, and
    * keep the prefix whose cumulative count stays within the budget
    * (here `total·60 div 100`, derived from the corpus itself so the gate
    * is scale-free). Output carries the greedy rank, each kept document's
    * tokens and the running total — the audit trail a budget decision
    * needs ("what got in, in what order, at what cost").
    *
    * Scale shape: the rank is [[Ranks.globalRank]] (distributed range
    * sort, single boundary draw) and the running sum is [[Ranks.prefixSum]]
    * under the SAME total order — no windowspecdefinition, no
    * SinglePartition funnel; the budget is a broadcast 1-row aggregate.
    * The greedy-prefix rule is exact and deterministic: ties in
    * quality_score break on doc_id, and a document is kept iff its own
    * cumulative total fits (no partial documents — the Lee-style span
    * surgery is [[Dedup]]'s territory, not the assembler's). */
  def sampleTokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val q = TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val order = Seq(col("quality_score").desc, col("doc_id"))
    // fused rank+prefix: ONE ranged checkpoint instead of the composed
    // form's two (ADVICE r13 — same semantics, half the pinned blocks)
    val cum = Ranks.rankAndPrefixSum(q, "rk", "n_tokens", "cum_tokens", order)
    // corpus token total summed over the rank's own checkpointed frame
    // (same rows) — aggregating `q` directly re-ran the whole quality
    // pipeline a second time just for one number (r15)
    val tot = cum.agg(sum(col("n_tokens")).as("__total"))
    cum.crossJoin(broadcast(tot))
      .filter(col("cum_tokens") <= expr(s"(__total * $TokenBudgetPct) div 100"))
      .select(col("rk"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"), col("quality_score"))
      .orderBy(col("rk"))
  }

  /** PER-SOURCE token budgets — the mixing-aware form of
    * [[sampleTokenBudget]]: each source keeps its own quality-first greedy
    * prefix under its own budget (60% of ITS token total), so the output
    * corpus preserves the source mix while still shedding the worst 40% of
    * every domain. This is the assembly rule behind "downsample each crawl
    * snapshot to its best X% by tokens" — a GLOBAL budget ([[
    * sampleTokenBudget]]) lets one high-quality source crowd out the rest;
    * the per-source rule is what mixing pipelines actually run.
    *
    * Scale shape — the grouped-rank pattern WITHOUT `Window.partitionBy
    * (source)` (a handful of sources would funnel 100 TB through a
    * handful of reducers): ONE fused [[Ranks.rankAndPrefixSum]] under
    * the source-major total order (source,
    * quality desc, doc_id), then per-source rank/cum recovered
    * arithmetically — `src_cum = cum − offset(source)` where
    * `offset(source) = min(cum − n_tokens)` over the source's rows (the
    * global prefix just before its first row; exact because every
    * n_tokens ≥ 1), and `src_rank = rk − min(rk) + 1` likewise. The
    * offsets and budgets are a |sources|-row broadcast. */
  def mixTokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val q = documents(spark, sfDir).select(col("doc_id"), col("source"))
      .join(TextAnalysis.quality(spark, sfDir)
        .select(col("doc_id"), col("n_tokens"), col("quality_score")), "doc_id")
    val order = Seq(col("source"), col("quality_score").desc, col("doc_id"))
    val cum = Ranks.rankAndPrefixSum(q, "rk", "n_tokens", "cum_tokens", order)
    val perSource = cum.groupBy(col("source")).agg(
      min(col("cum_tokens") - col("n_tokens")).as("__off"),
      min(col("rk")).as("__rk0"),
      expr(s"(sum(n_tokens) * $TokenBudgetPct) div 100").as("__budget"))
    cum.join(broadcast(perSource), "source")
      .withColumn("src_cum_tokens", col("cum_tokens") - col("__off"))
      .filter(col("src_cum_tokens") <= col("__budget"))
      .select(col("source"), (col("rk") - col("__rk0") + 1).as("src_rank"),
        col("doc_id"), col("n_tokens"), col("src_cum_tokens"),
        col("quality_score"))
      .orderBy(col("source"), col("src_rank"))
  }

  /** DuckDB twin of [[mixTokenBudget]] — source-partitioned windows
    * (exact per-source twins of the arithmetic recovery). */
  def mixTokenBudgetOracleSql: String =
    s"""WITH b AS (
       |  ${TextAnalysis.qualityCountsSqlCte}
       |), q AS (
       |  SELECT d.source, b.doc_id, b.n_tokens,
       |    ${TextAnalysis.qualityScoreSqlExpr("n_distinct", "n_stop", "n_tokens")} AS quality_score
       |  FROM b JOIN documents d ON b.doc_id = d.doc_id
       |), r AS (
       |  SELECT source, doc_id, n_tokens, quality_score,
       |    CAST(row_number() OVER w AS BIGINT) AS src_rank,
       |    CAST(sum(n_tokens) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS src_cum_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total
       |  FROM q
       |  WINDOW w AS (PARTITION BY source ORDER BY quality_score DESC, doc_id)
       |)
       |SELECT source, src_rank, doc_id, n_tokens, src_cum_tokens,
       |  quality_score
       |FROM r WHERE src_cum_tokens <= (total * $TokenBudgetPct) // 100
       |ORDER BY source, src_rank""".stripMargin

  /** DuckDB twin of [[sampleTokenBudget]] — same quality CTEs, a
    * row_number + running-sum window under the identical total order, and
    * the same integer budget rule. */
  def sampleTokenBudgetOracleSql: String =
    s"""WITH b AS (
       |  ${TextAnalysis.qualityCountsSqlCte}
       |), q AS (
       |  SELECT doc_id, n_tokens,
       |    ${TextAnalysis.qualityScoreSqlExpr("n_distinct", "n_stop", "n_tokens")} AS quality_score
       |  FROM b
       |), r AS (
       |  SELECT doc_id, n_tokens, quality_score,
       |    CAST(row_number() OVER w AS BIGINT) AS rk,
       |    CAST(sum(n_tokens) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS cum_tokens,
       |    CAST(sum(n_tokens) OVER () AS BIGINT) AS total
       |  FROM q
       |  WINDOW w AS (ORDER BY quality_score DESC, doc_id)
       |)
       |SELECT rk, doc_id, n_tokens, cum_tokens, quality_score
       |FROM r WHERE cum_tokens <= (total * $TokenBudgetPct) // 100
       |ORDER BY rk""".stripMargin
}
