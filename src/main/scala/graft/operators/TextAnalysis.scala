package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
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

  /** Document fingerprinting: 64-bit Karp–Rabin rolling hash of the full
    * text (wrapping multiply — deterministic on the JVM), plus a winnowed
    * minimum over 8-gram window hashes (the MOSS-style selection). UDF-based
    * (per-char loop is not expressible in codegen HOFs); one map pass.
    * No SQL oracle: DuckDB has checked 64-bit arithmetic. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
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
}
