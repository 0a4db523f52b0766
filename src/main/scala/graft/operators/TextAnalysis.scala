package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Text-analysis operators for training-data pipelines over `documents`:
  * token counting, quality scoring, language-ID, document fingerprinting.
  *
  * All scoring arithmetic is integer counts + single divisions/products —
  * bit-identical across engines, so these are oracle-checkable without
  * rounding tricks. No transcendental functions (exp/ln are not
  * correctly-rounded and may differ across libm implementations); sqrt is
  * IEEE-exact and allowed.
  *
  * Everything except the fingerprint is pure codegen HOFs — one map pass,
  * no shuffle, trivially scalable.
  */
object TextAnalysis {

  /** BPE-ish segmentation regex (letter runs / digit runs / single
    * punctuation) — ONE definition shared by [[tokens]],
    * [[Sampling.packSequences]], [[Sampling.sourceMixStats]], and every
    * oracle (Spark's Java regex and DuckDB's RE2 agree on this subset).
    * Editing it in one place keeps all token counts consistent. */
  val BpeTokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** DuckDB quality-score expression over precomputed count columns — ONE
    * definition shared by the `text_quality` and `mix_source_stats` oracles
    * (must mirror [[quality]]'s Column expression exactly: same operand
    * association, same weights). */
  def qualityScoreSqlExpr(nDistinct: String, nStop: String,
      nTokens: String): String =
    s"least(1.0, ($nDistinct / $nTokens) * 0.6 + ($nStop / $nTokens) * 2.0 + " +
      s"CASE WHEN $nTokens >= 50 AND $nTokens <= 2000 THEN 0.2 ELSE 0.0 END)"

  /** The shared token-count CTE body both quality oracles build on. */
  def qualityCountsSqlCte: String =
    """SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> list_contains(['the','a','and','of','to'], t))) AS BIGINT) AS n_stop
      |  FROM documents""".stripMargin

  private val Stopwords = Seq("the", "a", "and", "of", "to")

  /** Per-language marker words (tiny n-gram/stopword profile). */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "las", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("的", "了", "是", "在", "和"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t))).cast("long")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokens(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    documents(spark, sfDir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        regexp_count(lower(col("text")), lit(BpeTokenRegex))
          .cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("chars_per_token", col("n_chars") / col("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length / stopword / diversity signals combined with
    * rational arithmetic only. */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val base = documents(spark, sfDir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      countIn(toks, Stopwords).as("n_stop"),
      length(col("text")).cast("long").as("n_chars"))
    base.select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
        (col("n_stop") / col("n_tokens")).as("stopword_ratio"),
        (col("n_distinct") / col("n_tokens")).as("diversity"),
        least(lit(1.0),
          (col("n_distinct") / col("n_tokens")) * lit(0.6) +
            (col("n_stop") / col("n_tokens")) * lit(2.0) +
            when(col("n_tokens") >= 50 && col("n_tokens") <= 2000, lit(0.2))
              .otherwise(lit(0.0))).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Decile binning of the quality score — the "keep only the top quality
    * buckets" selection step of a training-data pipeline. `ntile(10)` over
    * a TOTAL order (score, then doc_id as the tie-break) makes bucket
    * boundaries deterministic and engine-identical: both Spark and DuckDB
    * implement the SQL-standard distribution where the first `n mod 10`
    * buckets take the extra row.
    *
    * Scale shape: exact decile ranks genuinely need a total order, but NOT
    * a window — an unpartitioned `ntile` would plan Exchange
    * SinglePartition (every row through one task). Instead the rank comes
    * from [[Ranks.globalRank]]'s distributed range-sort + offset-join pass
    * and the SQL-standard ntile distribution is recovered arithmetically
    * from (rank, total count) via [[Ranks.ntileFromRank]] — hash-identical
    * to the window form, zero `windowspecdefinition`s in the plan
    * (PlanSpec-asserted). At 100 TB the production form is still
    * approximate bucket BOUNDARIES from a quantile sketch joined back as a
    * broadcast range lookup — gated as `q_equi_depth`, with this gate as
    * its exact reference. */
  def qualityNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quality(spark, sfDir).select(col("doc_id"), col("quality_score"))
    val n1 = q.agg(count(lit(1)).as("n_docs"))
    Ranks.globalRank(q, "rk", Seq(col("quality_score"), col("doc_id")))
      .crossJoin(broadcast(n1))
      .withColumn("decile", Ranks.ntileFromRank(col("rk"), col("n_docs"), 10))
      .select(col("doc_id"), col("quality_score"), col("decile"))
      .orderBy(col("doc_id"))
  }

  def qualityNtileOracleSql: String =
    s"""WITH b AS (
       |  $qualityCountsSqlCte
       |), q AS (
       |  SELECT doc_id,
       |    ${qualityScoreSqlExpr("n_distinct", "n_stop", "n_tokens")} AS quality_score
       |  FROM b
       |)
       |SELECT doc_id, quality_score,
       |  CAST(ntile(10) OVER (ORDER BY quality_score, doc_id) AS BIGINT) AS decile
       |FROM q ORDER BY doc_id""".stripMargin

  /** Language-ID: argmax of per-language marker-word counts; ties resolve in
    * language-code order (the chained CASE order, identical in the oracle). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val counted = documents(spark, sfDir).select(
      col("doc_id") +: col("lang") +:
        LangMarkers.map { case (l, ws) => countIn(toks, ws).as(s"c_$l") }: _*)
    val best = greatest(LangMarkers.map { case (l, _) => col(s"c_$l") }: _*)
    // chained CASE de → en → es → fr → zh: first language hitting the max
    // wins; all-zero counts fall through to "und"
    val caseExpr = LangMarkers.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"c_$l") === best && best > 0, lit(l)).otherwise(els)
    }
    counted
      .select(col("doc_id") +: col("lang") +:
        LangMarkers.map { case (l, _) => col(s"c_$l") } :+
        caseExpr.as("pred_lang"): _*)
      .withColumn("is_correct", col("pred_lang") === col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Repetition scoring (the Gopher-rules family): fraction of duplicated
    * word n-grams within a document and the most-frequent-token share —
    * the standard signals for machine-generated/boilerplate filtering.
    * Integer counts + one division each → bit-identical cross-engine.
    * Pure map pass, no shuffle. */
  /** [[repetition]]'s per-document counters (object-level so UdfAuditProbe
    * measures the production closure). */
  private[graft] val repetitionStatsUdf = udf { (toks: Seq[String]) =>
    val n = toks.length
    val n3 = math.max(n - 2, 0)
    val d3 = if (n3 == 0) 0
      else {
        val seen = new java.util.HashSet[String]()
        var i = 0
        while (i + 2 < n) { seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)); i += 1 }
        seen.size
      }
    val counts = new java.util.HashMap[String, Int]()
    toks.foreach(t => counts.merge(t, 1, Integer.sum))
    var topCnt = 0
    counts.values.forEach(c => if (c > topCnt) topCnt = c)
    (n.toLong, n3.toLong, d3.toLong, topCnt.toLong)
  }

  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val statsUdf = repetitionStatsUdf
    documents(spark, sfDir)
      .select(col("doc_id"), statsUdf(split(col("text"), " ")).as("s"))
      .select(col("doc_id"),
        col("s._1").as("n_tokens"), col("s._2").as("n_3grams"),
        col("s._3").as("distinct_3grams"), col("s._4").as("top_token_count"))
      .withColumn("dup_3gram_frac",
        when(col("n_3grams") > 0,
          lit(1.0) - col("distinct_3grams") / col("n_3grams")).otherwise(0.0))
      .withColumn("top_token_frac",
        when(col("n_tokens") > 0, col("top_token_count") / col("n_tokens"))
          .otherwise(0.0))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[repetition]]. */
  def repetitionOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), tg AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
      |), g3 AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_3grams,
      |    CAST(count(DISTINCT g) AS BIGINT) AS distinct_3grams
      |  FROM tg GROUP BY doc_id
      |), tc AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_token_count FROM (
      |    SELECT doc_id, count(*) AS c
      |    FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
      |    GROUP BY doc_id, tok
      |  ) GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
      |  coalesce(g3.n_3grams, 0) AS n_3grams,
      |  coalesce(g3.distinct_3grams, 0) AS distinct_3grams,
      |  coalesce(tc.top_token_count, 0) AS top_token_count,
      |  CASE WHEN coalesce(g3.n_3grams, 0) > 0
      |       THEN 1.0 - g3.distinct_3grams / g3.n_3grams ELSE 0.0 END AS dup_3gram_frac,
      |  CASE WHEN len(t.w) > 0
      |       THEN tc.top_token_count / CAST(len(t.w) AS BIGINT) ELSE 0.0 END AS top_token_frac
      |FROM toks t
      |LEFT JOIN g3 ON t.doc_id = g3.doc_id
      |LEFT JOIN tc ON t.doc_id = tc.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Winnowing window parameters of [[fingerprint]] (k-gram size / window). */
  private val WinnowK = 8
  private val WinnowW = 50

  /** [[fingerprint]]'s winnowing pass (object-level so UdfAuditProbe
    * measures the production closure). */
  private[graft] val winnowUdf = {
    import graft.functions.PortableHash
    val k = WinnowK
    val w = WinnowW
    udf { (s: String) =>
      // k-grams over CODE POINTS: the oracle's substr/length are code-point-
      // based, so UTF-16 indexing would desynchronize on any supplementary-
      // plane character
      val cps = if (s == null) Array.empty[Int] else s.codePoints().toArray
      if (cps.length < k) (0L, 0L)
      else {
        val n = cps.length - k + 1
        val hs = new Array[Long](n)
        var i = 0
        while (i < n) {
          hs(i) = PortableHash.md5Lower63(new String(cps, i, k))
          i += 1
        }
        var globalMin = Long.MaxValue
        val mins = new java.util.HashSet[Long]()
        // sliding-window min via monotonic deque: O(n), windows [i, i+w-1]
        // clipped to the tail (the oracle's ROWS BETWEEN CURRENT ROW AND
        // w-1 FOLLOWING frame has the same shrinking-tail semantics)
        val deque = new java.util.ArrayDeque[Int]()
        // seed: indices of window starting at 0 are handled in the loop below
        var start = 0
        while (start < n) {
          val end = math.min(start + w - 1, n - 1) // inclusive
          if (start == 0) {
            var j = 0
            while (j <= end) {
              while (!deque.isEmpty && hs(deque.peekLast()) >= hs(j)) deque.pollLast()
              deque.addLast(j); j += 1
            }
          } else {
            if (!deque.isEmpty && deque.peekFirst() < start) deque.pollFirst()
            if (end == start + w - 1) { // a new element entered the window
              while (!deque.isEmpty && hs(deque.peekLast()) >= hs(end)) deque.pollLast()
              deque.addLast(end)
            }
          }
          val m = hs(deque.peekFirst())
          mins.add(m)
          if (m < globalMin) globalMin = m
          start += 1
        }
        (globalMin, mins.size.toLong)
      }
    }
  }

  /** Document fingerprinting, MOSS-style winnowing over k-gram hashes
    * (k = [[WinnowK]], window w = [[WinnowW]]):
    *   - `fingerprint`  — 63-bit MD5-derived hash of the full text;
    *   - `winnow_min`   — minimum k-gram hash (the strongest single shared-
    *                      substring signal between near-dup docs);
    *   - `n_winnow`     — number of DISTINCT window-minimum hashes (the size
    *                      of the winnowed fingerprint set: each length-w
    *                      window of k-gram positions contributes its min).
    * All hashes are MD5-derived 63-bit values ([[graft.functions.PortableHash]])
    * so the whole output is recomputable by the DuckDB oracle — an earlier
    * Karp–Rabin rolling-hash variant ([[fingerprintKR]]) is kept for the
    * rolling-hash formulation but is JVM-wrapping-multiply-specific.
    * UDF-based (per-char loop is not expressible in codegen HOFs); one map
    * pass, no shuffle. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.PortableHash
    documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .withColumn("fp", PortableHash.md5Lower63Col(col("text")))
      .withColumn("wn", winnowUdf(col("text")))
      .select(col("doc_id"), col("fp").as("fingerprint"),
        col("wn._1").as("winnow_min"), col("wn._2").as("n_winnow"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[fingerprint]]: same MD5-derived 63-bit k-gram hashes;
    * the winnow windows are the `ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`
    * frame per doc (shrinking tail included, like the Scala deque). */
  def fingerprintOracleSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, i,
       |    md5_number_lower(substr(text, CAST(i AS INTEGER), 8)) & 9223372036854775807 AS h
       |  FROM documents, unnest(range(1, length(text) - 6)) AS t(i)
       |), w AS (
       |  SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN CURRENT ROW AND 49 FOLLOWING) AS wmin
       |  FROM g
       |), a AS (
       |  SELECT doc_id, CAST(min(wmin) AS BIGINT) AS winnow_min,
       |    CAST(count(DISTINCT wmin) AS BIGINT) AS n_winnow
       |  FROM w GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(md5_number_lower(d.text) & 9223372036854775807 AS BIGINT) AS fingerprint,
       |  coalesce(a.winnow_min, 0) AS winnow_min,
       |  coalesce(a.n_winnow, 0) AS n_winnow
       |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Karp–Rabin rolling-hash fingerprint (wrapping 64-bit multiply —
    * deterministic on the JVM, not SQL-portable; spec-verified only). */
  def fingerprintKR(spark: SparkSession, sfDir: String): DataFrame = {
    val fpUdf = udf { (s: String) =>
      var h = 0L
      var i = 0
      while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
      h
    }
    val winnowUdf = udf { (s: String) =>
      val k = 8
      if (s.length < k) 0L
      else {
        // rolling hash of each k-gram; keep the minimum (unsigned compare)
        var pow = 1L
        var j = 0
        while (j < k - 1) { pow *= 1000003L; j += 1 }
        var h = 0L
        var i = 0
        while (i < k) { h = h * 1000003L + s.charAt(i); i += 1 }
        var min = h
        while (i < s.length) {
          h = (h - s.charAt(i - k) * pow) * 1000003L + s.charAt(i)
          if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
          i += 1
        }
        min
      }
    }
    documents(spark, sfDir)
      .select(col("doc_id"), fpUdf(col("text")).as("fingerprint"),
        winnowUdf(col("text")).as("winnow_min"))
      .orderBy(col("doc_id"))
  }

  /** Stop-terms dropped from the vocabulary head — the function-word tier
    * that dominates raw frequency but carries no tokenizer signal. */
  val StopTerms: Seq[String] = Seq("a", "the")

  /** Per-source vocabulary head: top-k terms by corpus frequency after a
    * stoplist drop — the vocabulary-pruning / tokenizer-training statistic
    * (which terms earn merges, per domain).
    *
    * Scale shape: explode → (source, term) groupBy is the only big shuffle
    * and it partial-aggregates map-side (counts are associative); the
    * window top-k then runs over the AGGREGATED table (|sources| × |vocab|
    * rows, orders of magnitude smaller than the corpus), partitioned by
    * source. Deterministic tiebreak: count desc, then term. */
  def topTerms(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val ex = documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "" && !col("term").isin(StopTerms: _*))
    val counts = ex.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("term"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"), col("n"))
      .orderBy(col("source"), col("rank"))
  }

  /** DuckDB twin of [[topTerms]]. */
  def topTermsOracleSql(k: Int = 5): String = {
    val stop = StopTerms.map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    s"""WITH ex AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
       |), f AS (
       |  SELECT source, term, count(*) AS n FROM ex
       |  WHERE term <> '' AND term NOT IN ($stop)
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT source, term, n,
       |    row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS rank
       |  FROM f
       |)
       |SELECT source, CAST(rank AS BIGINT) AS rank, term, n
       |FROM r WHERE rank <= $k ORDER BY source, rank""".stripMargin
  }

  // ---- rarity / tf-idf-style scoring ---------------------------------------

  /** Document rarity scoring — the TF-IDF-family novelty signal with
    * rational arithmetic only (no log: transcendental functions are not
    * correctly-rounded and diverge across libm implementations; N/df is
    * monotone in idf and equally rankable). Per document: mean inverse
    * document frequency of its tokens (Σ N/df(tok) over token OCCURRENCES,
    * divided by token count) plus the rarest token and its df. High scores
    * flag novel/rare vocabulary; low scores flag boilerplate — the
    * standard corpus-curation axis next to [[quality]] and [[repetition]].
    *
    * Scale shape: one doc-frequency aggregate over exploded (token, doc)
    * pairs — term-keyed, partial-combining — then the df table (|vocab|
    * rows) joins back onto the explode. The join strategy is SIZE-AWARE:
    * |vocab| is corpus-dependent and open-ended (web-scale corpora reach
    * billions of distinct tokens), so the df side is broadcast only when its
    * measured row count is ≤ `broadcastVocabLimit` (default 2,000,000 rows ≈
    * tens of MB — well inside executor memory); above the threshold the join
    * falls back to a token-keyed shuffle join, which the explode side
    * already partitions for. The vocab count is one small aggregate job over
    * the already-shuffled df table, the same pattern as the `nDocs` probe.
    * Arithmetic is fixed-point: per-occurrence idf =
    * ⌊N·10⁶/df⌋ (truncating integer division, identical on any engine),
    * summed as exact integers; only the final mean is one IEEE division.
    * Decimal division would NOT be portable here — engines disagree on the
    * quotient's derived scale. Long overflow bound: N·10⁶ ≤ 2⁶³ up to
    * N≈9×10¹² docs. */
  def rarity(spark: SparkSession, sfDir: String,
             broadcastVocabLimit: Long = 2000000L): DataFrame = {
    val docs = documents(spark, sfDir)
    val nDocs = docs.count() // one tiny job; N is a literal in the oracle too
    val pairs = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val df = pairs.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // size-aware join strategy: broadcast is a measured decision, not a hint
    // baked into the plan regardless of |vocab|. hint("shuffle_hash") on the
    // over-threshold path ALSO suppresses Spark's own size-estimated
    // auto-broadcast, so the fallback genuinely exercises the shuffle join.
    val dfSized =
      if (df.count() <= broadcastVocabLimit) broadcast(df)
      else df.hint("shuffle_hash")
    val joined = pairs.join(dfSized, "tok")
    joined.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(expr(s"(${nDocs}L * 1000000L) div df")).as("sum_idf_scaled"),
        max(col("df")).as("max_df"),
        min(col("df")).as("min_df"))
      .withColumn("mean_idf",
        col("sum_idf_scaled").cast("double") /
          (col("n_toks") * lit(1000000L)).cast("double"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[rarity]] — N recomputed as a scalar subquery (the
    * Spark side inlines `documents.count()` at build time, so both engines
    * see the sf-dependent N), same fixed-point rule (`//` ≡ Spark `div`). */
  def rarityOracleSql: String =
    """WITH n AS (
      |  SELECT count(*) AS nd FROM documents
      |), pairs AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), p AS (
      |  SELECT doc_id, tok FROM pairs WHERE tok <> ''
      |), df AS (
      |  SELECT tok, count(*) AS df
      |  FROM (SELECT DISTINCT tok, doc_id FROM p) GROUP BY tok
      |)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum((n.nd * 1000000) // df.df) AS BIGINT) AS sum_idf_scaled,
      |  CAST(max(df.df) AS BIGINT) AS max_df,
      |  CAST(min(df.df) AS BIGINT) AS min_df,
      |  CAST(sum((n.nd * 1000000) // df.df) AS DOUBLE)
      |    / CAST(count(*) * 1000000 AS DOUBLE) AS mean_idf
      |FROM p JOIN df USING (tok), n
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- inverted index ------------------------------------------------------

  private val PostingsCap = 20

  /** Inverted-index build: term → document frequency + the first 20 doc ids
    * (sorted ascending, comma-joined). The index is the retrieval-side twin
    * of [[topTerms]] — BM25/boolean retrieval, contamination lookup, and
    * targeted corpus surgery ("delete every doc containing X") all start
    * from this table. Posting lists are emitted as joined strings so the
    * result is dtype-stable across engines (array columns round-trip
    * differently through pandas).
    *
    * Scale shape: explode → one distinct + one aggregate, all keyed on the
    * term — the classic inverted-index shuffle. The postings cap bounds
    * per-term reducer output (a stopword's full posting list would be the
    * corpus itself); production would shard hot terms' lists
    * ([[PostingsCap]]-sized blocks per reducer) — the cap here is the
    * honest small-scale stand-in that keeps the operator's output bounded
    * per key.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    ex.groupBy(col("term"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            slice(sort_array(collect_set(col("doc_id"))), 1, PostingsCap),
            _.cast("string")),
          ",").as("postings"))
      .orderBy(col("term"))
  }

  /** DuckDB twin of [[invertedIndex]]. */
  def invertedIndexOracleSql: String =
    s"""WITH ex AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), f AS (
       |  SELECT DISTINCT term, doc_id FROM ex WHERE term <> ''
       |)
       |SELECT term, count(*) AS n_docs,
       |  array_to_string(list_sort(list(doc_id))[1:$PostingsCap], ',') AS postings
       |FROM f GROUP BY term
       |ORDER BY term""".stripMargin

  // ---- BM25 retrieval ------------------------------------------------------

  /** The fixed retrieval query for the [[bm25]] gate (terms chosen to span
    * common-to-rare document frequencies in the synthetic corpus). */
  val Bm25QueryTerms = Seq("spark", "window", "merge")

  private val Bm25TopK = 20

  /** BM25 retrieval: score every document against [[Bm25QueryTerms]] and
    * return the top-[[Bm25TopK]] — the standard lexical ranking on top of
    * [[invertedIndex]], and the retrieval half of contamination checking and
    * targeted corpus surgery.
    *
    * The tf-saturation core of BM25 — `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with k1=1.2, b=0.75 — is evaluated in 10⁻⁶ fixed point with truncating
    * integer division at every step: avgdl = T/N (T = corpus tokens, N =
    * docs) is quantized ONCE as `avgdl_fp = T·10⁶ div N`, the denominator is
    * `tf·10⁶ + 0.3·10⁶ + (0.9·10⁶·dl·10⁶) div avgdl_fp` (k1·(1−b) = 0.3,
    * k1·b = 0.9), and the numerator is `tf·2.2·10⁶` (k1+1 = 2.2) — every
    * intermediate is bounded by PER-DOCUMENT quantities (dl ≤ 10⁶ keeps all
    * products < 2·10¹⁸ regardless of corpus size, unlike the multiply-
    * through-by-T form which overflows at ~10¹¹ corpus tokens). The idf
    * factor is the Robertson–Sparck-Jones RATIO `(N−df+0.5)/(df+0.5)` in
    * the same fixed point — its `log` is deliberately absent (the
    * [[lmScore]] rule: no transcendentals, libm results are not
    * engine-portable). Per term the ranking is monotone-identical to
    * log-idf BM25; across terms rare terms weigh heavier than the log form
    * — documented, deterministic, and the saturation behaviour (the part
    * that makes BM25 BM25) stays exact to the 10⁻⁶ quantization.
    *
    * Scale shape: the term filter collapses the explode to query-term
    * postings BEFORE any shuffle (predicate on the exploded term — Catalyst
    * pushes it into the generate), df is a |q|-row aggregate joined back by
    * broadcast, and the final ranking is top-k (TakeOrderedAndProject).
    * N and T are two tiny scalar aggregates (the [[rarity]] `nDocs`
    * pattern), inlined as literals on both engines. Overflow bound:
    * `idf_fp·sat_fp < 2·N·10⁶ · 2.2·10⁶` — safe to N ≈ 10⁶ docs at 10⁻⁶
    * scale; past that drop idf to 10⁻³ scale. */
  def bm25(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Bm25QueryTerms, k: Int = Bm25TopK): DataFrame = {
    val docs = documents(spark, sfDir)
    val nDocs = docs.count() // tiny scalar job; literal in the oracle too
    val totToks = docs
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect()(0).getLong(0)
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isInCollection(terms))
    val avgdlFp = totToks * 1000000L / nDocs
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .withColumn("idf_fp",
        expr(s"((2 * (${nDocs}L - df) + 1) * 1000000L) div (2 * df + 1)"))
      .withColumn("sat_fp",
        expr(s"(tf * 2200000L * 1000000L) div " +
          s"(tf * 1000000L + 300000L + (900000L * dl * 1000000L) div ${avgdlFp}L)"))
      .withColumn("contrib_fp", expr("(idf_fp * sat_fp) div 1000000L"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib_fp")).as("score_fp"))
      .withColumn("score", col("score_fp").cast("double") / lit(1000000.0))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB twin of [[bm25]] — N and T recomputed as scalar subqueries,
    * identical fixed-point algebra. */
  def bm25OracleSql(terms: Seq[String] = Bm25QueryTerms,
      k: Int = Bm25TopK): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH n AS (
       |  SELECT count(*) AS nd,
       |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tt
       |  FROM documents
       |), a AS (
       |  SELECT nd, (tt * 1000000) // nd AS avgdl_fp FROM n
       |), toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
       |  FROM toks WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |), df AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), scored AS (
       |  SELECT tf.doc_id,
       |    (((2 * (a.nd - df.df) + 1) * 1000000) // (2 * df.df + 1) *
       |     ((tf.tf * 2200000 * 1000000) //
       |      (tf.tf * 1000000 + 300000 + (900000 * tf.dl * 1000000) // a.avgdl_fp)))
       |     // 1000000 AS contrib_fp
       |  FROM tf JOIN df USING (term), a
       |)
       |SELECT doc_id, count(*) AS n_hit,
       |  CAST(sum(contrib_fp) AS BIGINT) AS score_fp,
       |  CAST(sum(contrib_fp) AS DOUBLE) / 1000000.0 AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score_fp DESC, doc_id LIMIT $k""".stripMargin
  }

  // ---- Bigram language-model scoring ----

  /** Per-document bigram-LM predictability score — the shape of the
    * CCNet-style LM quality filter, with the model self-trained on the
    * corpus: every adjacent token pair scores `P(w2|w1) =
    * count(w1,w2)/count(w1 ·)` in fixed point (⌊c_bi·10⁶/c_pre⌋,
    * truncating integer division — no transcendentals, no FP accumulation,
    * identical on any engine), and the doc reports the mean and min over
    * its positions. Low mean = unpredictable/garbled text; min flags the
    * single most surprising transition. In production the count tables
    * come from a held-out reference corpus (swap the `bi`-derived model
    * frames for a read of that table — the scoring join is unchanged);
    * perplexity's exp/log is deliberately absent, mean-P ranks documents
    * monotonically enough for filtering and stays oracle-exact.
    *
    * Scale shape: bigram explode (map-only) → two count aggregates
    * (map-side combined) → model join, size-aware like [[rarity]]:
    * broadcast under the threshold, shuffle_hash above (the hint also
    * suppresses auto-broadcast, so the fallback is real). Overflow:
    * c_bi·10⁶ ≤ 2⁶³ up to ~9×10¹² occurrences of one bigram.
    */
  def lmScore(spark: SparkSession, sfDir: String,
      broadcastVocabLimit: Long = 2000000L): DataFrame = {
    val toks = Tables.spreadIfNarrow(documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i + 1]))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // persisted: the vocab-sized bigram count table anchors everything
    // downstream — uncached, the corpus-sized exploded `bi` was re-derived
    // for EACH of: the bigram counts, the prefix counts, both evaluations
    // of the model under its size probe, and the final join (~6 passes,
    // r15). The prefix counts are derived FROM the bigram counts
    // (c_pre = Σ_w2 c_bi — exactly the former count over `bi` grouped by
    // w1, partial aggregation done once), so `bi` is now computed twice:
    // once into `bc`, once as the final join's probe side.
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bi"))
      .persist()
    val pc = bc.groupBy(col("w1")).agg(sum(col("c_bi")).as("c_pre"))
    // fold the prefix counts INTO the bigram model (model-side join of two
    // count tables) so the 10⁶×-larger exploded side joins ONCE, not twice
    val model = bc.join(pc, "w1")
      .select(col("w1"), col("w2"), expr("(c_bi * 1000000L) div c_pre").as("p_fp"))
    val modelSized =
      if (model.count() <= broadcastVocabLimit) broadcast(model)
      else model.hint("shuffle_hash")
    val out = bi.join(modelSized, Seq("w1", "w2"))
      .select(col("doc_id"), col("p_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_fp")).as("s"),
        min(col("p_fp")).as("min_p_fp"))
      .withColumn("avg_p_fp", expr("s div n_bigrams"))
      .drop("s")
    Tables.materializeAndRelease(out, bc).orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[lmScore]] — 1-based list indexing where Spark's
    * bracket indexing is 0-based; same fixed-point rules (`//` ≡ `div`). */
  def lmScoreOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), bi AS (
      |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM toks, unnest(range(1, len(w))) AS t(i)
      |), bc AS (
      |  SELECT w1, w2, count(*) AS c_bi FROM bi GROUP BY 1, 2
      |), pc AS (
      |  SELECT w1, count(*) AS c_pre FROM bi GROUP BY 1
      |), sc AS (
      |  SELECT doc_id, (bc.c_bi * 1000000) // pc.c_pre AS p_fp
      |  FROM bi JOIN bc USING (w1, w2) JOIN pc USING (w1)
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(min(p_fp) AS BIGINT) AS min_p_fp,
      |  CAST(sum(p_fp) // count(*) AS BIGINT) AS avg_p_fp
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- collocation / phrase mining ----

  private val CollocMinSupport = 5L
  private val CollocTopK = 30

  /** Collocation mining: the `CollocTopK` adjacent-word pairs with the
    * highest LIFT `c_xy·N / (c_x·c_y)` among bigrams seen at least
    * [[CollocMinSupport]] times — the phrase-discovery step before
    * tokenizer/vocab training (PMI ranks identically: PMI = log lift, and
    * log is monotone — dropping it keeps the ranking and the no-
    * transcendentals rule). Lift is evaluated in 10⁻⁶ fixed point with two
    * truncating divisions in a FIXED order (`((c_xy·10⁶ div c_x)·N) div
    * c_y` — the floor composition is part of the operator contract,
    * mirrored in the oracle); N is the total token count, used for both
    * the unigram and bigram denominators (the standard approximation —
    * they differ by one per document).
    *
    * Scale shape: one bigram explode (map-only) feeding two count
    * aggregates (map-side combined, term-keyed); the unigram table joins
    * onto the BIGRAM COUNT table (|bigram vocab| rows), never onto the
    * exploded corpus — the [[lmScore]] model-side-join rule — and the
    * ranking is top-k (TakeOrderedAndProject). Overflow: the first floor
    * is ≤ 10⁶ (c_xy ≤ c_x), so the product is bounded by N·10⁶ — safe to
    * N ≈ 9·10¹² tokens. */
  def collocations(spark: SparkSession, sfDir: String,
      minSupport: Long = CollocMinSupport, k: Int = CollocTopK): DataFrame = {
    val toks = documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
    val nToks = uni.count() // one tiny scalar job; a literal in the oracle
    val uc = uni.groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i + 1]))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minSupport)
    bc.join(uc.withColumnRenamed("tok", "w1").withColumnRenamed("c_uni", "c_x"), "w1")
      .join(uc.withColumnRenamed("tok", "w2").withColumnRenamed("c_uni", "c_y"), "w2")
      .withColumn("lift_fp",
        expr(s"(((c_xy * 1000000L) div c_x) * ${nToks}L) div c_y"))
      .select(col("w1"), col("w2"), col("c_xy"), col("lift_fp"),
        (col("lift_fp").cast("double") / lit(1000000.0)).as("lift"))
      .orderBy(col("lift_fp").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** DuckDB twin of [[collocations]] — same fixed floor order, N as a
    * scalar subquery. */
  def collocationsOracleSql(minSupport: Long = CollocMinSupport,
      k: Int = CollocTopK): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), uni AS (
       |  SELECT unnest(w) AS tok FROM toks
       |), n AS (
       |  SELECT count(*) AS nt FROM uni
       |), uc AS (
       |  SELECT tok, count(*) AS c_uni FROM uni GROUP BY tok
       |), bi AS (
       |  SELECT w[i] AS w1, w[i+1] AS w2
       |  FROM toks, unnest(range(1, len(w))) AS t(i)
       |), bc AS (
       |  SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2
       |  HAVING count(*) >= $minSupport
       |)
       |SELECT bc.w1, bc.w2, bc.c_xy,
       |  CAST((((bc.c_xy * 1000000) // ux.c_uni) * n.nt) // uy.c_uni AS BIGINT)
       |    AS lift_fp,
       |  CAST((((bc.c_xy * 1000000) // ux.c_uni) * n.nt) // uy.c_uni AS DOUBLE)
       |    / 1000000.0 AS lift
       |FROM bc JOIN uc ux ON bc.w1 = ux.tok JOIN uc uy ON bc.w2 = uy.tok, n
       |ORDER BY lift_fp DESC, bc.w1, bc.w2 LIMIT $k""".stripMargin

  // ---- per-document keyword extraction ----

  /** Keywords kept per document by [[keywords]]. */
  val KeywordsPerDoc = 3

  /** Per-document TF-IDF keyword extraction: each document's top
    * [[KeywordsPerDoc]] terms by `tf · idf_fp`, where `tf` is the term's
    * in-document occurrence count and `idf_fp = (N·10⁶) div df` is the
    * [[rarity]] fixed-point inverse document frequency (no log — the
    * integer ratio is order-equivalent for ranking within a document and
    * engine-exact, per the lm-score no-transcendentals rule). Ties break
    * to the lexicographically smaller term. The per-doc keyword set is the
    * standard lightweight document descriptor for tagging, routing, and
    * near-dup triage.
    *
    * Scale shape: one token explode (linear), one distinct+groupBy for the
    * df table (8-byte-ish keys), a size-aware df join (broadcast under the
    * [[rarity]] vocabulary threshold), and a `row_number` window
    * partitioned by `doc_id` — high-cardinality, no hot partition. */
  def keywords(spark: SparkSession, sfDir: String,
      k: Int = KeywordsPerDoc): DataFrame = {
    val docs = documents(spark, sfDir)
    val nDocs = docs.count() // one tiny scalar job; a literal in the oracle
    val pairs = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val df = pairs.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tf = pairs.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .withColumn("score_fp", expr(s"tf * ((${nDocs}L * 1000000L) div df)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("tok"), col("tf"), col("df"), col("score_fp"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** DuckDB twin of [[keywords]] — same tf/df derivations, fixed-point
    * score, and tie rule; N as a scalar subquery. */
  def keywordsOracleSql(k: Int = KeywordsPerDoc): String =
    s"""WITH pairs AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), p AS (
       |  SELECT doc_id, tok FROM pairs WHERE tok <> ''
       |), n AS (
       |  SELECT count(*) AS nd FROM documents
       |), dfs AS (
       |  SELECT tok, count(DISTINCT doc_id) AS df FROM p GROUP BY tok
       |), tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM p GROUP BY doc_id, tok
       |), scored AS (
       |  SELECT tf.doc_id, tf.tok, tf.tf, dfs.df,
       |    tf.tf * ((n.nd * 1000000) // dfs.df) AS score_fp
       |  FROM tf JOIN dfs ON tf.tok = dfs.tok, n
       |)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, tf, df,
       |  CAST(score_fp AS BIGINT) AS score_fp
       |FROM (
       |  SELECT doc_id, tok, tf, df, score_fp,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_fp DESC, tok) AS rank
       |  FROM scored
       |) WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  // ---- sparse TF-IDF similarity join --------------------------------------

  /** Document-frequency cap / cosine threshold for [[tfidfPairs]]. */
  val TfidfDfCap = 25
  val TfidfThreshold = 0.5

  /** Sparse-vector document similarity join — the TF-IDF/inverted-index
    * complement to the dense-embedding pair ops ([[Similarity]]): documents
    * are TF-IDF vectors over DISCRIMINATIVE terms only (2 ≤ df ≤
    * [[TfidfDfCap]] — df=1 terms cannot pair, and frequent terms carry no
    * signal while exploding the index join: the same df-cap rule as the
    * capped Jaccard), candidate pairs come from the inverted index
    * (self-join on the term), and cosine is computed in the capped-term
    * subspace with exact integer weights `tf·⌊N·10³/df⌋` — dot products and
    * squared norms are DECIMAL/HUGEINT-exact sums of integer products, and
    * only the final `dot/√(n1²)·√(n2²)` runs in doubles (the casts of
    * identical exact integers are correctly rounded on both engines, so
    * round6 sees bit-identical inputs).
    *
    * Scale shape: the index join's fan-out is ≤C(dfCap, 2) pairs per term
    * by construction; the pair aggregate shuffles on the (d1, d2) key;
    * norms are one map-side-combined aggregate joined back by doc id.
    * At 100 TB this is exactly the shape of sparse candidate generation in
    * hybrid (BM25 + dense) retrieval pipelines. The ABSOLUTE df cap is the
    * fan-out guard and deliberately does NOT scale with N — "discriminative"
    * is a density notion, so a corpus that multiplies every term's df
    * (e.g. the replicated sf1 sweep corpus, where both engines agree on an
    * empty result because no term stays under the cap) legitimately yields
    * fewer candidates; production tunes `dfCap` to the corpus' df
    * distribution (a percentile of the df table this pipeline already
    * builds), never to a fraction of N — a relative cap re-inflates the
    * C(df,2) blow-up the cap exists to prevent. */
  def tfidfPairs(spark: SparkSession, sfDir: String, dfCap: Int = TfidfDfCap,
      threshold: Double = TfidfThreshold): DataFrame = {
    val docs = documents(spark, sfDir)
    val nDocs = docs.count() // scalar; a literal in the oracle
    val pairs = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val dfs = pairs.select(col("tok"), col("doc_id")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
    val w = pairs.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(dfs), "tok")
      .withColumn("w_fp", expr(s"tf * ((${nDocs}L * 1000L) div df)"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(expr("CAST(w_fp AS DECIMAL(20,0)) * w_fp")).as("nsq"))
    val dots = w.as("a").join(w.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(expr("CAST(a.w_fp AS DECIMAL(20,0)) * b.w_fp")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("nsq").as("nsq1")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("nsq").as("nsq2")), "d2")
      .withColumn("cos", Tables.portableRound6(
        col("dot").cast("double") /
          (sqrt(col("nsq1").cast("double")) * sqrt(col("nsq2").cast("double")))))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("n_shared_terms"), col("cos"))
      .orderBy(col("d1"), col("d2"))
  }

  /** DuckDB twin of [[tfidfPairs]] — same capped vocabulary, integer
    * weights, HUGEINT-exact sums, and double association. */
  def tfidfPairsOracleSql(dfCap: Int = TfidfDfCap,
      threshold: Double = TfidfThreshold): String =
    s"""WITH p AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), pp AS (
       |  SELECT doc_id, tok FROM p WHERE tok <> ''
       |), n AS (
       |  SELECT count(*) AS nd FROM documents
       |), dfs AS (
       |  SELECT tok, count(DISTINCT doc_id) AS df FROM pp GROUP BY tok
       |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $dfCap
       |), w AS (
       |  SELECT t.doc_id, t.tok, t.tf * ((n.nd * 1000) // dfs.df) AS w_fp
       |  FROM (SELECT doc_id, tok, count(*) AS tf FROM pp GROUP BY 1, 2) t
       |  JOIN dfs ON t.tok = dfs.tok, n
       |), norms AS (
       |  SELECT doc_id, sum(CAST(w_fp AS HUGEINT) * w_fp) AS nsq
       |  FROM w GROUP BY doc_id
       |), dots AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared_terms,
       |    sum(CAST(a.w_fp AS HUGEINT) * b.w_fp) AS dot
       |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT d1, d2, n_shared_terms,
       |  ${Tables.portableRound6Sql(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))")} AS cos
       |FROM dots
       |JOIN norms n1 ON n1.doc_id = d1
       |JOIN norms n2 ON n2.doc_id = d2
       |WHERE ${Tables.portableRound6Sql(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))")} >= $threshold
       |ORDER BY d1, d2""".stripMargin

  // ---- PII detection / redaction ----

  /** Patterns restricted to the syntax subset Java regex and RE2 (DuckDB)
    * interpret identically: ASCII classes, `\b`, `\d`, bounded repetition —
    * no backrefs, no lookaround (RE2 has neither). */
  private[operators] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[operators] val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Generic PII scrub over any text column: count and redact emails, IPv4
    * addresses, and phone-shaped digit runs, in that fixed order (each
    * replacement sees the previous one's output, so the order is part of
    * the operator contract and is mirrored exactly in the oracle).
    * Pure per-row regex work — codegen'd `RegExpReplace`/`RegExpCount`, no
    * shuffle, embarrassingly parallel: the 100 TB cost is one scan.
    */
  def piiScrubCols(text: Column): (Column, Column, Column, Column) = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    (regexp_count(text, lit(EmailRe)).cast("bigint"),
      regexp_count(text, lit(Ipv4Re)).cast("bigint"),
      regexp_count(text, lit(PhoneRe)).cast("bigint"),
      scrubbed)
  }

  /** Gate query: the synthetic corpus carries no PII, so the gate derives a
    * deterministic PII-bearing text from each row (email/IP/phone built
    * from `doc_id` arithmetic — no RNG, so DuckDB reconstructs the same
    * input) and then runs the scrub. The operator under test is
    * [[piiScrubCols]]; the injection is test scaffolding, mirrored
    * literally in the oracle.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val injected = documents(spark, sfDir).select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ip 10."),
        (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"),
        lit(".17 call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("txt"))
    val (emails, ips, phones, scrubbed) = piiScrubCols(col("txt"))
    injected.select(
      col("doc_id"),
      emails.as("n_emails"),
      ips.as("n_ipv4"),
      phones.as("n_phone"),
      scrubbed.as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[piiScrub]] — same injection, same patterns, same
    * replacement order ('g' flag: DuckDB replaces first-match-only by
    * default where Spark replaces all). */
  def piiScrubOracleSql: String =
    s"""WITH inj AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com ip 10.'
       |      || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
       |      || '.17 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(txt, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phone,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
       |FROM inj ORDER BY doc_id""".stripMargin

  // ---- boilerplate prefix detection ---------------------------------------

  /** Prefix length (words) and minimum group size for [[boilerplate]]. */
  val BoilerplatePrefixWords = 8
  val BoilerplateMinDocs = 2

  /** BOILERPLATE detection — the shared document PREFIXES (first
    * [[BoilerplatePrefixWords]] words) appearing in ≥[[BoilerplateMinDocs]]
    * docs: the scaffold of the strip-headers/footers pass every web-corpus
    * pipeline runs (cookie banners, license headers, navigation chrome all
    * surface as high-count shared prefixes). One map-side-combined count
    * keyed by the prefix string; at 100 TB key it by the prefix's 64-bit
    * hash instead and the shuffle narrows to 8 bytes/row (the
    * `dedup_span_coverage` discipline). */
  def boilerplate(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"),
        expr(s"array_join(slice(split(text, ' '), 1, $BoilerplatePrefixWords), ' ')")
          .as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_id"))
      .filter(col("n_docs") >= BoilerplateMinDocs)
      .orderBy(col("n_docs").desc, col("prefix"))

  /** Docs per bucket for [[vocabGrowth]]. */
  val VocabBucketDocs = 20L

  /** 3-gram md5 stream per token list. UDF verdict (SCALE.md round-12
    * audit): 0.11 s udf-only at sf1 — digest-bound leaf computation. */
  private[graft] val vocabGram3Udf = udf { (toks: Seq[String]) =>
    if (toks.length < 3) Array.empty[Long]
    else (0 to toks.length - 3).map(i =>
      graft.functions.PortableHash
        .md5Lower63(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))).toArray
  }

  /** VOCABULARY GROWTH curve (Heaps' law, measured) over word 3-GRAMS: per
    * [[VocabBucketDocs]]-doc bucket in `doc_id` order, how many 3-grams
    * appear for the FIRST time and the cumulative 3-gram vocabulary — the
    * corpus-sizing diagnostic (is new data still adding novel phrasing, or
    * repeating it?) and the before/after instrument for dedup passes.
    * 3-grams, not unigrams: this corpus generation draws from a ~31-word
    * unigram vocabulary (everything "first-appears" in bucket 0 — a flat
    * line), while the 3-gram space genuinely decays (993 → ~360 new per
    * bucket at sf0.01).
    *
    * Shape: one explode + min-aggregate keyed by the gram's 63-bit md5
    * (8-byte shuffle rows, the `dedup_span_coverage` discipline — never
    * shuffle the text), then all curve algebra on the |buckets|-row
    * frame. No range join of vocabulary × checkpoints (the naive O(V·C)
    * formulation this avoids). */
  def vocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val firstSeen = documents(spark, sfDir)
      .select(col("doc_id"),
        explode(vocabGram3Udf(split(lower(col("text")), " "))).as("gh"))
      .groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
    val buckets = firstSeen
      .groupBy(expr(s"first_doc div $VocabBucketDocs").as("bucket"))
      .agg(count(lit(1)).as("new_grams"))
    // cumulative vocabulary via the DISTRIBUTED prefix sum (bucket count
    // grows linearly with the corpus — the last empty-key window on the
    // surface funneled it through one partition)
    Ranks.prefixSum(buckets, "new_grams", "vocab_size", Seq(col("bucket")))
      .select(col("bucket"), col("new_grams"), col("vocab_size"))
      .orderBy(col("bucket"))
  }

  /** DuckDB twin of [[vocabGrowth]] — identical md5 gram keys. */
  def vocabGrowthOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    CAST(md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      & 9223372036854775807 AS BIGINT) AS gh
       |  FROM t, unnest(range(1, len(w) - 1)) AS r(i)
       |), fs AS (
       |  SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY 1
       |), b AS (
       |  SELECT first_doc // $VocabBucketDocs AS bucket, count(*) AS new_grams
       |  FROM fs GROUP BY 1
       |)
       |SELECT bucket, CAST(new_grams AS BIGINT) AS new_grams,
       |  CAST(sum(new_grams) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       |    AS BIGINT) AS vocab_size
       |FROM b ORDER BY bucket""".stripMargin

  /** DuckDB twin of [[boilerplate]]. */
  def boilerplateOracleSql: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    array_to_string(string_split(text, ' ')[1:$BoilerplatePrefixWords], ' ') AS prefix
       |  FROM documents
       |)
       |SELECT prefix, count(*) AS n_docs, min(doc_id) AS example_id
       |FROM p GROUP BY 1 HAVING count(*) >= $BoilerplateMinDocs
       |ORDER BY n_docs DESC, prefix""".stripMargin

  /** Per-token md5-congruence weight accumulation. UDF verdict (SCALE.md
    * round-12 audit): ≈0.01 s udf-only at sf1 — indistinguishable from the
    * tokenize baseline. */
  private[graft] val classifierScoreUdf = udf { (toks: Seq[String]) =>
    var s = 0L
    val it = toks.iterator
    while (it.hasNext)
      s += graft.functions.PortableHash.md5Lower63(it.next()) % 1000L - 500L
    s
  }

  /** HASHED LINEAR QUALITY CLASSIFIER — the fastText-shaped model-scoring
    * pass of a web-corpus curation pipeline (CCNet/DataComp style: a
    * linear model over hashed token features decides keep/drop per
    * document). The feature map is the trained reality: each token hashes
    * to a weight-table slot and the document score is the mean slot
    * weight; `keep` is the sign test. Here the weight table is a
    * DETERMINISTIC congruence of the 63-bit md5 slot id (`h mod 1000 −
    * 500` ∈ [−500, 499]) so the gate is oracle-checkable — production
    * broadcasts the trained `Array[Float]` table instead and the shape is
    * unchanged (the hash, the per-token lookup, the integer accumulation).
    *
    * Exactness: the accumulation is pure BIGINT (token weights are ints,
    * so summation order cannot perturb the result — no FP reassociation
    * hazard), and the displayed mean divides once at the end, portably
    * rounded. Scale shape: ONE map pass over `documents` — no shuffle, no
    * join, no state; the classifier parallelizes per-row at any corpus
    * size, which is exactly why hashed linear models are the industry
    * keep/drop front door at 100 TB. */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    documents(spark, sfDir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        classifierScoreUdf(toks).as("score_sum"))
      .withColumn("score", portableRound6(
        col("score_sum").cast("double") / (col("n_tokens") * lit(1000.0))))
      .withColumn("keep", col("score_sum") > 0L)
      .orderBy(col("doc_id"))
  }

  /** END-TO-END CURATION PIPELINE accounting — the composed
    * classifier→dedup→assembly pass a training-data team actually ships,
    * as ONE query: score every document with the hashed linear classifier
    * ([[qualityClassifier]]'s exact arithmetic), drop the rejects, keep
    * one survivor per exact-duplicate group (min doc_id per md5(text) —
    * `dedup_exact`'s rule), then account the surviving corpus per
    * (source, lang): raw/kept/unique doc counts, final whitespace-token
    * total, and each cell's exact integer ppm share of the final token
    * budget — the numbers a data-mixture spec is written against.
    *
    * Scale shape: one map pass (score + hash + token count, no text
    * leaves the scan stage except into md5), a survivor groupBy keyed on
    * the 16-byte digest ("never shuffle the text" — the join back is on
    * (digest, doc_id)), three map-side-combined rollups on (source,
    * lang) keys, and a 1-row total broadcast for the share arithmetic.
    * Every stage is a shape already gated in isolation; this gate proves
    * the COMPOSITION stays exact and scale-safe. */
  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val scored = documents(spark, sfDir).select(
      col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      classifierScoreUdf(toks).as("score_sum"),
      md5(col("text")).as("h"))
    val raw = scored.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_raw"))
    val kept = scored.filter(col("score_sum") > 0L)
    val uni = kept.join(
        kept.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
          .withColumnRenamed("h", "h2"),
        col("h") === col("h2") && col("doc_id") === col("keep_id"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("n_tokens")).as("tokens_final"))
    val keptAgg = kept.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_kept"))
    val tot = uni.agg(sum(col("tokens_final")).as("tot_tokens"))
    raw.join(keptAgg, Seq("source", "lang"), "left")
      .join(uni, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n_kept", "n_unique", "tokens_final"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_raw"), col("n_kept"),
        col("n_unique"), col("tokens_final"),
        expr("tokens_final * 1000000 div tot_tokens").as("share_ppm"))
      .orderBy(col("source"), col("lang"))
  }

  /** DuckDB twin of [[curationPipeline]] — identical classifier weights,
    * survivor rule, and integer share arithmetic. */
  def curationPipelineOracleSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(list_aggregate(list_transform(string_split(lower(text), ' '),
       |      t -> CAST(md5_number_lower(t) & 9223372036854775807 AS BIGINT)
       |           % 1000 - 500), 'sum') AS BIGINT) AS score_sum,
       |    md5(text) AS h
       |  FROM documents
       |), k AS (
       |  SELECT * FROM s WHERE score_sum > 0
       |), sv AS (
       |  SELECT h, min(doc_id) AS keep_id FROM k GROUP BY 1
       |), u AS (
       |  SELECT k.source, k.lang, k.n_tokens
       |  FROM k JOIN sv ON k.h = sv.h AND k.doc_id = sv.keep_id
       |), raw AS (
       |  SELECT source, lang, count(*) AS n_raw FROM s GROUP BY 1, 2
       |), kept AS (
       |  SELECT source, lang, count(*) AS n_kept FROM k GROUP BY 1, 2
       |), uni AS (
       |  SELECT source, lang, count(*) AS n_unique,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_final
       |  FROM u GROUP BY 1, 2
       |), tot AS (
       |  SELECT CAST(sum(tokens_final) AS BIGINT) AS tot_tokens FROM uni
       |)
       |SELECT r.source, r.lang, r.n_raw,
       |  CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(coalesce(uni.n_unique, 0) AS BIGINT) AS n_unique,
       |  CAST(coalesce(uni.tokens_final, 0) AS BIGINT) AS tokens_final,
       |  CAST(coalesce(uni.tokens_final, 0) * 1000000 // tot.tot_tokens
       |    AS BIGINT) AS share_ppm
       |FROM raw r
       |LEFT JOIN kept USING (source, lang)
       |LEFT JOIN uni USING (source, lang)
       |CROSS JOIN tot
       |ORDER BY r.source, r.lang""".stripMargin

  /** DuckDB twin of [[qualityClassifier]] — identical md5 slot ids,
    * integer weight congruence, and rounding. */
  def qualityClassifierOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
       |), s AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(list_aggregate(list_transform(w,
       |      t -> CAST(md5_number_lower(t) & 9223372036854775807 AS BIGINT)
       |           % 1000 - 500), 'sum') AS BIGINT) AS score_sum
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, score_sum,
       |  ${Tables.portableRound6Sql(
            "CAST(score_sum AS DOUBLE) / (n_tokens * 1000.0)")} AS score,
       |  score_sum > 0 AS keep
       |FROM s ORDER BY doc_id""".stripMargin

  // ---- RAG chunking --------------------------------------------------------

  /** Chunk geometry for [[chunking]], shared with its oracle: 64-token
    * chunks on a 48-token stride (16-token overlap) — the retrieval-index
    * shape (each chunk embeddable independently; the overlap keeps
    * boundary-spanning answers findable). */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** RAG CHUNK TABLE — the document→chunk explosion every retrieval
    * pipeline materializes before embedding: one row per (doc, chunk
    * start), with the chunk's token count and a 63-bit md5 content hash
    * (the stable chunk identity an index uses for incremental re-embeds:
    * unchanged text ⇒ unchanged hash ⇒ no re-embed). Starts are every
    * [[ChunkStride]] tokens while any token remains, so trailing partial
    * chunks are kept (standard practice — dropping them loses document
    * tails from the index).
    *
    * Scale shape: pure map + explode, zero shuffles before the output
    * sort; the chunk hash is the codegen'd builtin composition
    * ([[graft.functions.PortableHash.md5Lower63Col]] over
    * `array_join(slice(...))`), so the whole pipeline stays inside
    * WholeStageCodegen. At 100 TB this is the shape that feeds the
    * embedding UDF batch job — chunk rows are written partitioned and the
    * heavy model pass reads them back. */
  def chunking(spark: SparkSession, sfDir: String): DataFrame =
    chunksOf(documents(spark, sfDir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** The chunk explosion over an arbitrary (doc_id, text) frame — shared
    * by [[chunking]] and [[chunkDelta]]. */
  private def chunksOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("w"), col("n"),
        explode(expr(s"sequence(0L, n - 1, $ChunkStride)")).as("start"))
      .select(col("doc_id"),
        expr(s"start div $ChunkStride").as("chunk_idx"),
        col("start").as("start_tok"),
        least(lit(ChunkTokens.toLong), col("n") - col("start")).as("n_toks"),
        graft.functions.PortableHash.md5Lower63Col(
          expr(s"array_join(slice(w, CAST(start + 1 AS INT), $ChunkTokens), ' ')"))
          .as("chunk_hash"))

  /** INCREMENTAL RE-EMBED WORKING SET — the chunk-level diff an index
    * maintainer computes between two corpus versions to know what to
    * re-embed: chunks keyed by (doc_id, chunk_idx), full-outer-joined
    * across versions, classified `added` / `removed` / `changed` (hash
    * differs) / `unchanged`, summarized per status with chunk and
    * document counts. The "new" corpus is a deterministic twist of the
    * base (every 7th document dropped, every 5th appended one token —
    * the append moves only the tail chunk, which the counts prove), so
    * the gate is a pure function of the corpus and oracle-checkable; a
    * production run feeds two real snapshot paths.
    *
    * Scale shape: two chunk explosions (map-only, [[chunksOf]]) and one
    * (doc_id, chunk_idx)-keyed full outer join — chunk identity never
    * compares text, only 8-byte hashes ("never shuffle the text"). */
  def chunkDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val base = documents(spark, sfDir).select(col("doc_id"), col("text"))
    val newDocs = base.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zzedit")))
          .otherwise(col("text")).as("text"))
    val oc = chunksOf(base)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_hash").as("old_hash"))
    val nc = chunksOf(newDocs)
      .select(col("doc_id").as("n_doc"), col("chunk_idx").as("n_idx"),
        col("chunk_hash").as("new_hash"))
    oc.join(nc,
        col("doc_id") === col("n_doc") && col("chunk_idx") === col("n_idx"),
        "full_outer")
      .select(coalesce(col("doc_id"), col("n_doc")).as("d"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_chunks"), countDistinct(col("d")).as("n_docs"))
      .orderBy(col("status"))
  }

  /** The chunk-explosion CTE chain over source CTE/table `src`, emitting
    * chunk rows as CTE `out` — shared by [[chunkingOracleSql]] and
    * [[chunkDeltaOracleSql]]. */
  private def chunkSqlCtes(src: String, out: String): String =
    s"""${out}_toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n
       |  FROM $src
       |), $out AS (
       |  SELECT doc_id, CAST(s.v // $ChunkStride AS BIGINT) AS chunk_idx,
       |    CAST(s.v AS BIGINT) AS start_tok,
       |    CAST(least($ChunkTokens, n - s.v) AS BIGINT) AS n_toks,
       |    CAST(md5_number_lower(array_to_string(w[s.v + 1 : s.v + $ChunkTokens], ' '))
       |      & 9223372036854775807 AS BIGINT) AS chunk_hash
       |  FROM ${out}_toks, unnest(generate_series(0, n - 1, $ChunkStride)) s(v)
       |  WHERE n > 0
       |)""".stripMargin

  /** DuckDB twin of [[chunking]] — identical stride grid, 1-based slice
    * bounds, and md5 chunk identity. */
  def chunkingOracleSql: String =
    s"""WITH ${chunkSqlCtes("documents", "ch")}
       |SELECT doc_id, chunk_idx, start_tok, n_toks, chunk_hash
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB twin of [[chunkDelta]] — the same deterministic corpus twist
    * and status classification. */
  def chunkDeltaOracleSql: String =
    s"""WITH nd AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' zzedit' ELSE text END AS text
       |  FROM documents WHERE doc_id % 7 <> 0
       |),
       |${chunkSqlCtes("documents", "co")},
       |${chunkSqlCtes("nd", "cn")},
       |j AS (
       |  SELECT coalesce(co.doc_id, cn.doc_id) AS d,
       |    CASE WHEN co.chunk_hash IS NULL THEN 'added'
       |         WHEN cn.chunk_hash IS NULL THEN 'removed'
       |         WHEN co.chunk_hash <> cn.chunk_hash THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM co FULL JOIN cn
       |    ON co.doc_id = cn.doc_id AND co.chunk_idx = cn.chunk_idx
       |)
       |SELECT status, count(*) AS n_chunks, count(DISTINCT d) AS n_docs
       |FROM j GROUP BY 1 ORDER BY status""".stripMargin

  // ---- content-defined chunking --------------------------------------------

  /** Rolling-window width (tokens) for [[cdcChunks]] boundary detection. */
  val CdcWindow = 4
  /** Boundary when the window hash ≡ 0 (mod [[CdcModulus]]) — ~32-token
    * mean chunks. */
  val CdcModulus = 32L

  /** CONTENT-DEFINED CHUNKING — the insertion-robust complement of the
    * fixed-stride [[chunking]] gate: chunk boundaries fall where the
    * 63-bit md5 of the trailing [[CdcWindow]]-token window hits
    * `0 mod` [[CdcModulus]], so an edit only reflows chunks up to the next
    * content boundary instead of shifting every downstream chunk (the
    * property storage dedup and incremental RAG re-indexing rely on).
    * Chunks are identified by the md5 of their token text and audited
    * corpus-wide: per document, the chunk count, token count, and how
    * many of its chunks also occur elsewhere (`cnt > 1` on the 63-bit
    * hash — the chunk-level dup signal).
    *
    * Scale shape: boundary flags are computed IN-ARRAY (one codegen map
    * pass per doc — no cross-row state, CDC's window is intra-document by
    * construction); the cumulative boundary→chunk-id sum is a doc_id-keyed
    * window (never empty-key); chunk identity shuffles the 8-byte hash,
    * never chunk text, and the dup join is hash-keyed ("never shuffle the
    * text", the [[Dedup]] invariant). */
  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame = {
    // chunk derivation is ONE native codegen'd pass over the token array
    // (graft.functions.CdcChunksExpr — boundary windows, chunk extents,
    // and 63-bit chunk identities computed digest-bytes-to-long; the
    // earlier builtin md5/substr/conv composition paid a hex round-trip
    // per window and was the slowest gate on the bench at 8.3 s). The
    // token text never leaves the map task — only (n_toks, hash) structs
    // explode. spreadIfNarrow first: O(tokens) digest work per doc over a
    // single unsplittable row group otherwise runs as one task (75 s →
    // 15 s at sf1 even for the column form).
    val chunks = Tables.spreadIfNarrow(
        documents(spark, sfDir).select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.functions.CdcExpressions.cdcChunks(
          split(col("text"), " "), CdcWindow, CdcModulus))
          .as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.n_toks").as("n_toks"), col("c.h").as("chunk_hash"))
    val dup = chunks.groupBy(col("chunk_hash")).agg(count(lit(1)).as("cnt"))
    chunks.join(dup, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("cnt") > 1L, 1L).otherwise(0L)).as("n_dup_chunks"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[cdcChunks]] — identical window hash, boundary
    * congruence, and chunk identity. */
  def cdcChunksOracleSql: String = {
    val w = CdcWindow
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, w, unnest(generate_series(1, n)) AS i FROM tk
       |), fl AS (
       |  SELECT doc_id, i, w[i] AS tok,
       |    CASE WHEN i >= $w AND
       |        (md5_number_lower(array_to_string(w[i - ${w - 1} : i], ' '))
       |          & 9223372036854775807) % $CdcModulus = 0
       |      THEN 1 ELSE 0 END AS flag
       |  FROM p
       |), cid AS (
       |  SELECT doc_id, i, tok,
       |    COALESCE(sum(flag) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
       |  FROM fl
       |), ch AS (
       |  SELECT doc_id, chunk_idx, count(*) AS n_toks,
       |    CAST(md5_number_lower(string_agg(tok, ' ' ORDER BY i))
       |      & 9223372036854775807 AS BIGINT) AS chunk_hash
       |  FROM cid GROUP BY 1, 2
       |), dup AS (
       |  SELECT chunk_hash, count(*) AS cnt FROM ch GROUP BY 1
       |)
       |SELECT ch.doc_id, count(*) AS n_chunks,
       |  CAST(sum(ch.n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN d.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_chunks
       |FROM ch JOIN dup d USING (chunk_hash)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- BPE merge training --------------------------------------------------

  /** Merge rounds trained by [[bpeMerges]]. */
  val BpeMergeRounds = 3
  /** Final-symbol rows emitted alongside the merge table. */
  val BpeTopSymbols = 15

  /** The [a-z]+ word-frequency dictionary materialized ONCE per
    * (JVM, corpus) — BPE training's working set is the VOCABULARY, not the
    * corpus: one row-scale aggregate collapses 100 TB of text into a
    * dictionary of (word, freq) pairs, and every merge round thereafter
    * touches only that tiny frame. Memoizing it as a parquet table (the
    * [[Graph.backboneTable]] pattern) also bounds the unrolled loop's
    * lineage: each round re-reads a vocab-sized file instead of
    * re-deriving the corpus scan through k levels of argmax subtrees. */
  private def bpeWordDictTable(spark: SparkSession, sfDir: String): String =
    MemoTables.dir(s"bpedict|$sfDir", "graft-bpedict") { dir =>
      documents(spark, sfDir)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }

  /** Adjacent symbol pairs of a space-joined symbol string, as
    * `"left right"` strings — the guard keeps 1-symbol words out because
    * Spark's `sequence(1, 0)` would generate DESCENDING [1, 0], not empty
    * (the [[OtelQueries]] histogram gates hit the same trap). */
  private def adjacentPairs(sym: Column): Column = {
    val toks = split(sym, " ")
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** BYTE-PAIR-ENCODING MERGE TRAINING — the tokenizer-construction
    * primitive of every LLM data pipeline: [[BpeMergeRounds]] rounds of
    * (count adjacent symbol pairs over the word-frequency dict, weighted
    * by word frequency) → (merge the argmax pair corpus-wide), emitting
    * the learned merge table plus the [[BpeTopSymbols]] most frequent
    * final symbols. Ties break lexicographically so the trainer is fully
    * deterministic. Merge APPLICATION is two passes of space-guarded
    * literal `replace` (`' x y ' → ' xy '` on the sentinel-padded string):
    * left-to-right non-overlapping, second pass catching occurrences whose
    * shared boundary space the first consumed — equal to canonical BPE's
    * leftmost-rescan rule except on runs of ≥5 repeats of one symbol,
    * and (the property that matters for the gate) EXACTLY the rule the
    * oracle runs.
    *
    * Scale shape: after the one corpus-scale aggregate ([[bpeWordDictTable]])
    * every round is a map-side-combined pair count over the vocab frame
    * plus a 1-row `TakeOrderedAndProject` argmax broadcast back — the
    * driver never holds data, rounds never reshuffle the dict, and corpus
    * size only enters through the dictionary build. That is how
    * production BPE trainers run at 100 TB: dictionary job, then
    * vocab-local iteration. */
  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    var cur = spark.read.parquet(bpeWordDictTable(spark, sfDir))
      .select(rtrim(regexp_replace(col("word"), "([a-z])", "$1 ")).as("sym"),
        col("freq"))
    var merges = Seq.empty[DataFrame]
    for (k <- 1 to BpeMergeRounds) {
      val counts = cur
        .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      val best = counts.orderBy(col("n").desc, col("pair")).limit(1)
      merges = merges :+ best.select(lit("merge").as("kind"),
        lit(k.toLong).as("step"), col("pair").as("token"), col("n"))
      val pat = best.select(
        concat(lit(" "), col("pair"), lit(" ")).as("__pat"),
        concat(lit(" "), expr("replace(pair, ' ', '')"), lit(" ")).as("__rep"))
      cur = cur.crossJoin(broadcast(pat))
        .withColumn("sym", expr("trim(replace(replace(concat(' ', sym, ' '), " +
          "__pat, __rep), __pat, __rep))"))
        .select(col("sym"), col("freq"))
    }
    val symbols = cur
      .select(explode(split(col("sym"), " ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(BpeTopSymbols)
      .select(lit("symbol").as("kind"), lit(BpeMergeRounds.toLong).as("step"),
        col("token"), col("n"))
    merges.reduce(_ unionByName _).unionByName(symbols)
      .orderBy(col("kind"), col("step"), col("token"))
  }

  /** TOKENIZE WITH THE LEARNED MERGES — the apply side of [[bpeMerges]]
    * (train once, encode the corpus): every `[a-z]+` word occurrence is
    * exploded, char-split, and pushed through the [[BpeMergeRounds]]
    * learned merges (same two-pass space-guarded replace rule the trainer
    * and the oracle use), then per-document symbol counts and the
    * chars-per-symbol compression ratio come back from one aggregate.
    * This is the pipeline's real token accounting: `n_symbols` is what a
    * trained BPE tokenizer would bill the document at.
    *
    * Scale shape: the merge table is derived from the vocab-sized
    * memoized dict ([[bpeWordDictTable]]) and broadcast as ONE 1-row
    * frame of (pattern, replacement) pairs; the corpus-scale word frame
    * is scanned ONCE, transformed map-only (chained codegen'd `replace`s,
    * no shuffle), and aggregated back to doc keys — encode cost is one
    * pass over the text regardless of merge count. */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    var cur = spark.read.parquet(bpeWordDictTable(spark, sfDir))
      .select(rtrim(regexp_replace(col("word"), "([a-z])", "$1 ")).as("sym"),
        col("freq"))
    // re-run the trainer's argmax rounds over the memoized dict, folding
    // each round's (pattern, replacement) into one 1-row broadcast frame
    var mergeFrame: DataFrame = null
    for (k <- 1 to BpeMergeRounds) {
      val counts = cur
        .select(explode(adjacentPairs(col("sym"))).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      val best = counts.orderBy(col("n").desc, col("pair")).limit(1)
      val pat = best.select(
        concat(lit(" "), col("pair"), lit(" ")).as(s"__pat$k"),
        concat(lit(" "), expr("replace(pair, ' ', '')"), lit(" ")).as(s"__rep$k"))
      mergeFrame = if (mergeFrame == null) pat else mergeFrame.crossJoin(pat)
      cur = cur.crossJoin(broadcast(pat.select(col(s"__pat$k").as("__pat"),
          col(s"__rep$k").as("__rep"))))
        .withColumn("sym", expr("trim(replace(replace(concat(' ', sym, ' '), " +
          "__pat, __rep), __pat, __rep))"))
        .select(col("sym"), col("freq"))
    }
    val words = documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
    var enc = words
      .crossJoin(broadcast(mergeFrame))
      .withColumn("sym", rtrim(regexp_replace(col("word"), "([a-z])", "$1 ")))
    for (k <- 1 to BpeMergeRounds)
      enc = enc.withColumn("sym",
        expr(s"trim(replace(replace(concat(' ', sym, ' '), __pat$k, __rep$k), " +
          s"__pat$k, __rep$k))"))
    enc
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_alpha_chars"),
        sum(size(split(col("sym"), " ")).cast("long")).as("n_symbols"))
      .withColumn("chars_per_symbol", Tables.portableRound6(
        col("n_alpha_chars").cast("double") / col("n_symbols").cast("double")))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[bpeEncode]] — the trainer CTE chain for the merge
    * table, then the identical per-word replace chain and doc rollup. */
  def bpeEncodeOracleSql: String = {
    val rounds = (1 to BpeMergeRounds)
      .map(k => bpeRoundSqlCtes(k, if (k == 1) "s0" else s"s${k - 1}"))
      .mkString(",\n")
    val encs = (1 to BpeMergeRounds).map { k =>
      s"""e$k AS (
         |  SELECT doc_id, word, trim(replace(replace(' ' || sym || ' ',
         |      ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
         |      ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '))
         |    AS sym
         |  FROM e${k - 1} CROSS JOIN best$k b
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents
       |), dict AS (
       |  SELECT word, count(*) AS freq FROM w GROUP BY 1
       |), s0 AS (
       |  SELECT rtrim(regexp_replace(word, '([a-z])', '\\1 ', 'g')) AS sym, freq
       |  FROM dict
       |),
       |$rounds,
       |dw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents
       |), e0 AS (
       |  SELECT doc_id, word,
       |    rtrim(regexp_replace(word, '([a-z])', '\\1 ', 'g')) AS sym
       |  FROM dw
       |),
       |$encs
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(length(word)) AS BIGINT) AS n_alpha_chars,
       |  CAST(sum(len(string_split(sym, ' '))) AS BIGINT) AS n_symbols,
       |  ${Tables.portableRound6Sql(
            "CAST(sum(length(word)) AS DOUBLE) / CAST(sum(len(string_split(sym, ' '))) AS DOUBLE)")}
       |    AS chars_per_symbol
       |FROM e$BpeMergeRounds
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** One merge round as DuckDB CTEs: pair counts over `$in`, argmax
    * `best$k`, merged dict `s$k` — the same two-pass space-guarded
    * replace as the Spark side. */
  private def bpeRoundSqlCtes(k: Int, in: String): String =
    s"""t$k AS (
       |  SELECT string_split(sym, ' ') AS toks, freq FROM $in
       |), i$k AS (
       |  SELECT toks, freq, unnest(generate_series(1, len(toks) - 1)) AS i
       |  FROM t$k WHERE len(toks) >= 2
       |), c$k AS (
       |  SELECT toks[i] || ' ' || toks[i + 1] AS pair,
       |    CAST(sum(freq) AS BIGINT) AS n
       |  FROM i$k GROUP BY 1
       |), best$k AS (
       |  SELECT pair, n FROM c$k ORDER BY n DESC, pair LIMIT 1
       |), s$k AS (
       |  SELECT trim(replace(replace(' ' || sym || ' ',
       |      ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
       |      ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '))
       |    AS sym, freq
       |  FROM $in CROSS JOIN best$k b
       |)""".stripMargin

  /** DuckDB twin of [[bpeMerges]] — unrolled [[BpeMergeRounds]] rounds of
    * the identical count/argmax/replace algebra. */
  def bpeMergesOracleSql: String = {
    val rounds = (1 to BpeMergeRounds)
      .map(k => bpeRoundSqlCtes(k, if (k == 1) "s0" else s"s${k - 1}"))
      .mkString(",\n")
    val mergeSelects = (1 to BpeMergeRounds)
      .map(k => s"SELECT 'merge' AS kind, CAST($k AS BIGINT) AS step, " +
        s"pair AS token, n FROM best$k")
      .mkString("\nUNION ALL\n")
    s"""WITH w AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents
       |), dict AS (
       |  SELECT word, count(*) AS freq FROM w GROUP BY 1
       |), s0 AS (
       |  SELECT rtrim(regexp_replace(word, '([a-z])', '\\1 ', 'g')) AS sym, freq
       |  FROM dict
       |),
       |$rounds,
       |syms AS (
       |  SELECT unnest(string_split(sym, ' ')) AS token, freq
       |  FROM s$BpeMergeRounds
       |), topsym AS (
       |  SELECT 'symbol' AS kind, CAST($BpeMergeRounds AS BIGINT) AS step,
       |    token, CAST(sum(freq) AS BIGINT) AS n
       |  FROM syms GROUP BY 3
       |  ORDER BY n DESC, token LIMIT $BpeTopSymbols
       |)
       |SELECT * FROM (
       |  $mergeSelects
       |  UNION ALL
       |  SELECT * FROM topsym
       |) ORDER BY kind, step, token""".stripMargin
  }

  // ---- corpus novelty ------------------------------------------------------

  /** PER-DOCUMENT NOVELTY — what fraction of a document's 3-gram shingles
    * appears NOWHERE else in the corpus (df = 1), alongside the
    * boilerplate tier (df > 20, the same cap `dedup_jaccard_capped`
    * blacklists): the diversity/uniqueness profile a data curator reads
    * before weighting sources — high-novelty docs add information,
    * high-boilerplate docs add templates. Integer ppm, hash-exact. Docs
    * with < 3 tokens have no shingles and no row (they carry no n-gram
    * evidence either way; the token-level gates cover them).
    *
    * Scale shape: the same "never shuffle the text" discipline as every
    * shingle gate — one map pass to 8-byte hashes, one (h)-keyed df
    * aggregate, one (h)-keyed join back, one doc_id aggregate. All
    * map-side combined; no window, no self-join. */
  def novelty(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = graft.operators.Dedup.docShingleHashes(spark, sfDir).persist()
    val ex = sh.select(col("doc_id"), explode(col("shh")).as("h"))
    val dfh = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val out = ex.join(dfh, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("df") > 20, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("novelty_ppm", expr("(n_unique * 1000000) div n_sh"))
      .withColumn("boiler_ppm", expr("(n_boiler * 1000000) div n_sh"))
    Tables.materializeAndRelease(out, sh).orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[novelty]] — identical distinct-shingle hashes, df
    * tiers, and integer ppm. */
  def noveltyOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
      |), hs AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(md5_number_lower(shingle) & 9223372036854775807 AS BIGINT) AS h
      |  FROM sh
      |), dfh AS (
      |  SELECT h, count(*) AS df FROM hs GROUP BY 1
      |)
      |SELECT hs.doc_id, count(*) AS n_sh,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(sum(CASE WHEN df > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |    // count(*) AS novelty_ppm,
      |  CAST(sum(CASE WHEN df > 20 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |    // count(*) AS boiler_ppm
      |FROM hs JOIN dfh ON hs.h = dfh.h
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- readability proxy ---------------------------------------------------

  /** READABILITY PROXY per document — the integer-exact skeleton of a
    * Flesch-style score: words per sentence (periods as sentence marks,
    * floor-1 so period-free fragments don't divide by zero) and characters
    * per word, both in integer ppm, plus the long-word share (≥ 7 chars —
    * the syllable-count stand-in that needs no dictionary). The features a
    * complexity-based quality filter thresholds on; kept fully integral so
    * the gate is hash-exact and the 100 TB pass is pure map + one
    * aggregate-free projection.
    *
    * Scale shape: a single map pass over the scan — no shuffle at all
    * except the output sort. */
  def readability(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        greatest(regexp_count(col("text"), lit("\\.")), lit(1))
          .cast("long").as("n_sentences"),
        length(col("text")).cast("long").as("n_chars"),
        size(filter(split(col("text"), " "), t => length(t) >= 7))
          .cast("long").as("n_long_words"))
      .withColumn("words_per_sentence_ppm",
        expr("(n_words * 1000000) div n_sentences"))
      .withColumn("chars_per_word_ppm",
        expr("(n_chars * 1000000) div n_words"))
      .withColumn("long_word_ppm",
        expr("(n_long_words * 1000000) div n_words"))
      .orderBy(col("doc_id"))

  /** DuckDB twin of [[readability]] — identical counts and integer ppm. */
  def readabilityOracleSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |    CAST(greatest(len(text) - len(replace(text, '.', '')), 1) AS BIGINT)
      |      AS n_sentences,
      |    CAST(len(text) AS BIGINT) AS n_chars,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> len(t) >= 7)) AS BIGINT) AS n_long_words
      |  FROM documents
      |)
      |SELECT doc_id, n_words, n_sentences, n_chars, n_long_words,
      |  (n_words * 1000000) // n_sentences AS words_per_sentence_ppm,
      |  (n_chars * 1000000) // n_words AS chars_per_word_ppm,
      |  (n_long_words * 1000000) // n_words AS long_word_ppm
      |FROM b ORDER BY doc_id""".stripMargin

  // ---- duplicated-line accounting ------------------------------------------

  /** DUPLICATED-LINE ACCOUNTING per document — the Gopher/MassiveText
    * line-level repetition rule: split each document on '.' sentence
    * marks (this corpus's line analogue), hash each non-empty trimmed
    * line, and report how many of a document's lines ALSO appear in other
    * documents (cross-document boilerplate — nav bars, license footers,
    * quote chains) vs repeated within itself. Emits per-doc line counts
    * and the integer-ppm duplicated share — the number the Gopher quality
    * rule thresholds at 30%.
    *
    * Scale shape: the novelty/shingle discipline — explode to (doc,
    * line_hash) pairs, ONE hash-keyed df aggregate, one join back, one
    * doc aggregate. Exchanges carry 8-byte hashes, never line text. */
  def lineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val lines = documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("filter(transform(split(text, '\\\\.'), x -> trim(x)), x -> x != '')"))
          .as("line"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Lower63Col(col("line")).as("lh"))
    val perDoc = lines.groupBy(col("doc_id"), col("lh"))
      .agg(count(lit(1)).as("n_in_doc"))
    val docFreq = perDoc.groupBy(col("lh"))
      .agg(count(lit(1)).as("df"))
    perDoc.join(docFreq, Seq("lh"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_in_doc")).as("n_lines"),
        count(lit(1)).as("n_distinct_lines"),
        sum(when(col("df") > 1, col("n_in_doc")).otherwise(0L))
          .as("n_cross_dup"),
        sum(when(col("n_in_doc") > 1, col("n_in_doc") - 1).otherwise(0L))
          .as("n_self_dup"))
      .withColumn("cross_dup_ppm", expr("(n_cross_dup * 1000000) div n_lines"))
      .withColumn("flag_gopher", col("cross_dup_ppm") > 300000L)
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[lineDedup]] — identical split/trim/hash and integer
    * ppm. */
  def lineDedupOracleSql: String =
    """WITH l AS (
      |  SELECT doc_id,
      |    CAST(md5_number_lower(x) & 9223372036854775807 AS BIGINT) AS lh
      |  FROM documents,
      |    unnest(list_filter(list_transform(string_split(text, '.'),
      |      x -> trim(x)), x -> x != '')) AS t(x)
      |), pd AS (
      |  SELECT doc_id, lh, count(*) AS n_in_doc FROM l GROUP BY 1, 2
      |), dfq AS (
      |  SELECT lh, count(*) AS df FROM pd GROUP BY 1
      |), g AS (
      |  SELECT pd.doc_id,
      |    CAST(sum(pd.n_in_doc) AS BIGINT) AS n_lines,
      |    count(*) AS n_distinct_lines,
      |    CAST(sum(CASE WHEN dfq.df > 1 THEN pd.n_in_doc ELSE 0 END) AS BIGINT)
      |      AS n_cross_dup,
      |    CAST(sum(CASE WHEN pd.n_in_doc > 1 THEN pd.n_in_doc - 1 ELSE 0 END)
      |      AS BIGINT) AS n_self_dup
      |  FROM pd JOIN dfq ON pd.lh = dfq.lh
      |  GROUP BY 1
      |)
      |SELECT doc_id, n_lines, n_distinct_lines, n_cross_dup, n_self_dup,
      |  (n_cross_dup * 1000000) // n_lines AS cross_dup_ppm,
      |  (n_cross_dup * 1000000) // n_lines > 300000 AS flag_gopher
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- Zipf rank-frequency audit --------------------------------------------

  /** ZIPF RANK-FREQUENCY AUDIT over the corpus vocabulary — Zipf's law
    * says rank × frequency ≈ constant, so per rank-decile this emits the
    * min / median / max of the exact integer product `rank · freq`: a
    * natural-language corpus holds a flat-ish median across deciles while
    * template-heavy or synthetic corpora collapse in the tail — the
    * corpus-naturalness check beside `text_vocab_growth`'s Heaps curve,
    * sqrt/log-free (the classic log-log slope needs IEEE `ln`; the product
    * curve reads the same fit in exact BIGINTs).
    *
    * Scale shape: explode → term groupBy is the only row-scale shuffle
    * (map-side combined counts); ranking the |vocab|-row frequency table
    * uses the distributed [[Ranks.globalRank]] (range shuffle + broadcast
    * offsets — no SinglePartition funnel, no windowspecdefinition); the
    * decile stats run under (decile)-keyed windows over |vocab| rows. */
  def zipf(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.spreadIfNarrow(documents(spark, sfDir), col("doc_id"))
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val ranked = Ranks.globalRank(tf, "rank",
      Seq(col("freq").desc, col("term")))
    val tot = tf.agg(count(lit(1)).as("n_vocab"))
    val dec = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rank - 1) * 10) div n_vocab"))
      .withColumn("rf", col("rank") * col("freq"))
    val w = Window.partitionBy(col("decile")).orderBy(col("rf"), col("rank"))
    val wAll = Window.partitionBy(col("decile"))
    dec
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(wAll))
      .groupBy(col("decile"))
      .agg(max(col("np")).as("n_terms"),
        min(col("rf")).as("min_rf"),
        max(when(col("rn") === expr("(np + 1) div 2"), col("rf")))
          .as("median_rf"),
        max(col("rf")).as("max_rf"))
      .orderBy(col("decile"))
  }

  /** DuckDB twin of [[zipf]] — identical tokenization, rank tie-break,
    * decile split, and longhand median pick. */
  def zipfOracleSql: String =
    """WITH tf AS (
      |  SELECT term, count(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS term FROM documents
      |  ) WHERE term <> '' GROUP BY 1
      |), r AS (
      |  SELECT term, freq,
      |    row_number() OVER (ORDER BY freq DESC, term) AS rank,
      |    count(*) OVER () AS n_vocab
      |  FROM tf
      |), d AS (
      |  SELECT ((rank - 1) * 10) // n_vocab AS decile, rank * freq AS rf,
      |    rank
      |  FROM r
      |), rn AS (
      |  SELECT decile, rf,
      |    row_number() OVER (PARTITION BY decile ORDER BY rf, rank) AS rn,
      |    count(*) OVER (PARTITION BY decile) AS np
      |  FROM d
      |)
      |SELECT decile, CAST(max(np) AS BIGINT) AS n_terms,
      |  CAST(min(rf) AS BIGINT) AS min_rf,
      |  CAST(max(CASE WHEN rn = (np + 1) // 2 THEN rf END) AS BIGINT)
      |    AS median_rf,
      |  CAST(max(rf) AS BIGINT) AS max_rf
      |FROM rn GROUP BY 1 ORDER BY 1""".stripMargin
}
