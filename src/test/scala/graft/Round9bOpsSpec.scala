package graft

import graft.operators.{OtelQueries, Tables, TextAnalysis}
import graft.operators.QuerySurface

/** Round-9 extension gates: Mann–Whitney U (doubled-midrank algebra),
  * Apdex per root service over trace durations, and the BPE merge
  * trainer — each verified by a full plain-Scala recompute that shares
  * no Spark or SQL machinery with the operator under test. */
class Round9bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("q_mannwhitney: plain-Scala midrank recompute (doubled rank sums, " +
      "z^2 normal approximation)") {
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(floor(value * 1000000) AS BIGINT)",
        "user_id % 2 = 0")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expected = raw.groupBy(_._1).map { case (et, xs) =>
      val byVal = xs.groupBy(_._2).view
        .mapValues(g => (g.length.toLong, g.count(_._3).toLong)).toMap
      var r2a = 0L
      var start = 1L
      byVal.keys.toSeq.sorted.foreach { v =>
        val (nV, naV) = byVal(v)
        r2a += naV * (2 * start + nV - 1)
        start += nV
      }
      val na = xs.count(_._3).toLong
      val nb = xs.length - na
      val u2a = r2a - na * (na + 1)
      val d = u2a.toDouble - na.toDouble * nb.toDouble
      val zSq = round6(3.0 * d * d / (na.toDouble * nb.toDouble * (na + nb + 1.0)))
      et -> ((na, nb, r2a, u2a, zSq))
    }
    val out = QuerySurface.mannWhitney(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (na, nb, r2a, u2a, zSq) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
      assert(r.getAs[Long]("r2a") == r2a, s"r2a for ${r.getString(0)}")
      assert(r.getAs[Long]("u2a") == u2a)
      assert(r.getAs[Double]("z_sq") == zSq)
      assert(r.getAs[Boolean]("significant") == (zSq > 3.841459))
      // U is bounded by the cohort-product by construction
      assert(u2a >= 0L && u2a <= 2 * na * nb)
    }
  }

  test("q_ks_test: plain-Scala ECDF sup recompute (cross-multiplied " +
      "integer numerator, squared critical value)") {
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(floor(value * 1000000) AS BIGINT)",
        "user_id % 2 = 0")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expected = raw.groupBy(_._1).map { case (et, xs) =>
      val na = xs.count(_._3).toLong
      val nb = xs.length - na
      val byVal = xs.groupBy(_._2).view
        .mapValues(g => (g.count(_._3).toLong, g.count(!_._3).toLong)).toMap
      var (cumA, cumB, dNum) = (0L, 0L, 0L)
      byVal.keys.toSeq.sorted.foreach { v =>
        val (a, b) = byVal(v)
        cumA += a; cumB += b
        dNum = math.max(dNum, math.abs(cumA * nb - cumB * na))
      }
      val dStat = round6(dNum.toDouble / (na.toDouble * nb.toDouble))
      val reject = dNum.toDouble * dNum.toDouble >
        1.844964 * (na.toDouble + nb.toDouble) * na.toDouble * nb.toDouble
      et -> ((na, nb, dNum, dStat, reject))
    }
    val out = QuerySurface.ksTest(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (na, nb, dNum, dStat, reject) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
      assert(r.getAs[Long]("d_num") == dNum)
      assert(r.getAs[Double]("d_stat") == dStat)
      assert(r.getAs[Boolean]("reject") == reject)
    }
  }

  test("otel_apdex: congruence recompute of trace totals, all three " +
      "classes populated, ppm algebra exact") {
    val n = 2000L
    // spanTrees generation rule: trace t has spans 0..t%15, duration
    // 1000 + ((t*31 + i*17) % 97) * 10
    val totals = (0L until n).map { t =>
      val tot = (0L to (t % 15)).map(i => 1000L + ((t * 31 + i * 17) % 97) * 10).sum
      (t, tot)
    }
    val T = OtelQueries.ApdexTNs
    val expected = totals.groupBy { case (t, _) => s"svc-${t % 6}" }.view
      .mapValues { xs =>
        val sat = xs.count(_._2 <= T).toLong
        val tol = xs.count(x => x._2 > T && x._2 <= 4 * T).toLong
        val fru = xs.count(_._2 > 4 * T).toLong
        (xs.length.toLong, sat, tol, fru, (2 * sat + tol) * 500000L / xs.length)
      }.toMap
    val out = OtelQueries.apdex(spark, sf).collect()
    assert(out.length == 6)
    var (sumSat, sumTol, sumFru) = (0L, 0L, 0L)
    out.foreach { r =>
      val (nT, sat, tol, fru, ppm) = expected(r.getAs[String]("root_svc"))
      assert(r.getAs[Long]("n_traces") == nT)
      assert(r.getAs[Long]("n_satisfied") == sat)
      assert(r.getAs[Long]("n_tolerating") == tol)
      assert(r.getAs[Long]("n_frustrated") == fru)
      assert(r.getAs[Long]("apdex_ppm") == ppm)
      sumSat += sat; sumTol += tol; sumFru += fru
    }
    // the T/4T thresholds must genuinely split this corpus three ways
    assert(sumSat > 0 && sumTol > 0 && sumFru > 0)
  }

  test("text_bpe_merges: full plain-Scala recompute of the 3-round " +
      "trainer (weighted pair counts, lexicographic argmax, two-pass " +
      "space-guarded merge)") {
    val wordRe = "[a-z]+".r
    val dict = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select("text").collect().foreach { r =>
      wordRe.findAllIn(r.getString(0).toLowerCase(java.util.Locale.ROOT))
        .foreach(w => dict(w) = dict.getOrElse(w, 0L) + 1L)
    }
    var syms: Seq[(String, Long)] =
      dict.toSeq.map { case (w, f) => (w.mkString(" "), f) }
    var merges = Seq.empty[(Long, String, Long)]
    for (k <- 1 to TextAnalysis.BpeMergeRounds) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      syms.foreach { case (s, f) =>
        val t = s.split(" ")
        (0 until t.length - 1).foreach { i =>
          val p = s"${t(i)} ${t(i + 1)}"
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (bestPair, bestN) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      merges = merges :+ ((k.toLong, bestPair, bestN))
      val pat = s" $bestPair "
      val rep = s" ${bestPair.replace(" ", "")} "
      syms = syms.map { case (s, f) =>
        (s" $s ".replace(pat, rep).replace(pat, rep).trim, f)
      }
    }
    val finalSyms = scala.collection.mutable.Map.empty[String, Long]
    syms.foreach { case (s, f) =>
      s.split(" ").foreach(t => finalSyms(t) = finalSyms.getOrElse(t, 0L) + f)
    }
    val topSyms = finalSyms.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextAnalysis.BpeTopSymbols)
    val out = TextAnalysis.bpeMerges(spark, sf).collect()
    val gotMerges = out.filter(_.getString(0) == "merge")
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(gotMerges == merges, s"merge table: got $gotMerges want $merges")
    val gotSyms = out.filter(_.getString(0) == "symbol")
      .map(r => (r.getString(2), r.getLong(3))).toSet
    assert(gotSyms == topSyms.toSet)
    // merges must actually compose: at least one merged token of length
    // >= 2 appears in the final top symbols
    assert(topSyms.exists(_._1.length >= 2))
  }

  test("text_bpe_encode: per-doc symbol accounting matches a plain-Scala " +
      "train-then-encode recompute") {
    val wordRe = "[a-z]+".r
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        wordRe.findAllIn(r.getString(1).toLowerCase(java.util.Locale.ROOT)).toSeq))
    // train: same trainer as the merges spec
    val dict = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._2.foreach(w => dict(w) = dict.getOrElse(w, 0L) + 1L))
    var syms: Seq[(String, Long)] =
      dict.toSeq.map { case (w, f) => (w.mkString(" "), f) }
    var patterns = Seq.empty[(String, String)]
    for (_ <- 1 to TextAnalysis.BpeMergeRounds) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      syms.foreach { case (s, f) =>
        val t = s.split(" ")
        (0 until t.length - 1).foreach { i =>
          val p = s"${t(i)} ${t(i + 1)}"
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (bestPair, _) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val pat = s" $bestPair "
      val rep = s" ${bestPair.replace(" ", "")} "
      patterns = patterns :+ ((pat, rep))
      syms = syms.map { case (s, f) =>
        (s" $s ".replace(pat, rep).replace(pat, rep).trim, f)
      }
    }
    def encode(w: String): Int = {
      var s = w.mkString(" ")
      patterns.foreach { case (pat, rep) =>
        s = s" $s ".replace(pat, rep).replace(pat, rep).trim
      }
      s.split(" ").length
    }
    val expected = docs.filter(_._2.nonEmpty).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(encode(_).toLong).sum))
    }.toMap
    val out = TextAnalysis.bpeEncode(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nW, nCh, nSym) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nW)
      assert(r.getAs[Long]("n_alpha_chars") == nCh)
      assert(r.getAs[Long]("n_symbols") == nSym,
        s"n_symbols for doc ${r.getAs[Long]("doc_id")}")
      // merges can only shrink the char-level tokenization
      assert(nSym <= nCh)
    }
  }

  test("q_benford: plain-Scala recompute (cents leading digit, integer " +
      "ppm vs precomputed expectation)") {
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 >= 1L)
    val expected = raw.groupBy(_._1).flatMap { case (et, xs) =>
      val n = xs.length.toLong
      xs.groupBy(t => t._2.toString.head.asDigit.toLong).map {
        case (d, g) =>
          val obs = g.length.toLong
          val obsPpm = obs * 1000000L / n
          val expPpm = QuerySurface.BenfordPpm(d.toInt - 1)
          (et, d) -> ((obs, obsPpm, expPpm, obsPpm - expPpm))
      }
    }
    val out = QuerySurface.benford(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (obs, obsPpm, expPpm, dev) =
        expected((r.getAs[String]("event_type"), r.getAs[Long]("digit")))
      assert(r.getAs[Long]("n_obs") == obs)
      assert(r.getAs[Long]("obs_ppm") == obsPpm)
      assert(r.getAs[Long]("exp_ppm") == expPpm)
      assert(r.getAs[Long]("dev_ppm") == dev)
    }
    // the expectation literals are the Benford distribution: monotone
    // decreasing, summing to ~10^6
    assert(QuerySurface.BenfordPpm.zip(QuerySurface.BenfordPpm.tail)
      .forall { case (a, b) => a > b })
    assert(math.abs(QuerySurface.BenfordPpm.sum - 1000000L) <= 9)
  }

  /** Plain-Scala CDC: returns the chunk token-lists of a token sequence
    * under the gate's window-hash boundary rule. */
  private def cdcOf(toks: Seq[String]): Seq[Seq[String]] = {
    val w = TextAnalysis.CdcWindow
    val flags = toks.indices.map { i0 =>
      val i = i0 + 1
      i >= w && graft.functions.PortableHash.md5Lower63(
        toks.slice(i - w, i).mkString(" ")) % TextAnalysis.CdcModulus == 0L
    }
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    toks.indices.foreach { i =>
      out.last += toks(i)
      if (flags(i) && i < toks.length - 1)
        out += scala.collection.mutable.ArrayBuffer.empty[String]
    }
    out.map(_.toSeq).toSeq
  }

  test("text_cdc_chunks: plain-Scala recompute of the per-doc census " +
      "and the corpus-wide dup counts") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val chunks = docs.flatMap { case (id, toks) =>
      cdcOf(toks).map(c => (id, graft.functions.PortableHash.md5Lower63(
        c.mkString(" ")), c.length.toLong))
    }
    val dupCnt = chunks.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = chunks.groupBy(_._1).view.mapValues { cs =>
      (cs.length.toLong, cs.map(_._3).sum,
        cs.count(c => dupCnt(c._2) > 1).toLong)
    }.toMap
    val out = TextAnalysis.cdcChunks(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nC, nT, nD) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_chunks") == nC,
        s"n_chunks for doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_tokens") == nT)
      assert(r.getAs[Long]("n_dup_chunks") == nD)
    }
    // the boundary rule must actually fire on this corpus
    assert(out.exists(_.getAs[Long]("n_chunks") > 1L))
  }

  test("CDC edit-locality: inserting a token reflows only chunks up to " +
      "the next content boundary (fixed-stride chunking shifts them all)") {
    val doc = Tables.documents(spark, sf)
      .selectExpr("text", "length(text) AS l", "doc_id")
      .orderBy(org.apache.spark.sql.functions.col("l").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .limit(1).collect()(0).getString(0)
    val toks = doc.split(" ", -1).toSeq
    assume(toks.length > 40)
    val edited = toks.head +: "zznew" +: toks.tail
    val orig = cdcOf(toks).map(_.mkString(" "))
    val post = cdcOf(edited).map(_.mkString(" "))
    assume(orig.length > 2)
    // every original chunk except a bounded prefix survives verbatim
    val survivors = orig.toSet.intersect(post.toSet)
    assert(survivors.nonEmpty, "an early edit must not reflow every chunk")
    assert(orig.drop(2).forall(survivors.contains),
      "chunks past the first boundary after the edit must be unchanged")
  }

  test("rank-test gates window only under the event_type key — no " +
      "empty-key window, no SinglePartition data funnel") {
    for (df <- Seq(QuerySurface.mannWhitney(spark, sf),
        QuerySurface.ksTest(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      val windowLines = plan.split("\n").filter(_.contains("Window "))
      assert(windowLines.nonEmpty, plan)
      assert(windowLines.forall(_.contains("event_type")), plan)
    }
  }

  test("text_bpe_encode: word/symbol strings never cross an exchange; " +
      "all joins broadcast") {
    val plan = TextAnalysis.bpeEncode(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only shuffles carry doc-keyed partial counts (and the final
    // orderBy's range exchange) — never the exploded word or symbol text
    val exchanges = plan.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(exchanges.nonEmpty, plan)
    assert(exchanges.forall(l => !l.contains("word") && !l.contains("sym")),
      plan)
  }
}
