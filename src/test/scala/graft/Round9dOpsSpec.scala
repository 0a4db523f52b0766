package graft

import graft.operators.{OtelQueries, QuerySurface, Sampling, Tables}

/** Round-9 third-extension gates: Simpson/HHI mix concentration, Fano
  * burstiness, and per-op exemplar selection — plain-Scala recomputes
  * sharing no Spark/SQL machinery with the operator under test. */
class Round9dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("mix_simpson: plain-Scala concentration recompute; effective count " +
      "bounded by the source count") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val counts = xs.groupBy(_._2).map(_._2.length.toLong)
      val nDocs = counts.sum
      val sumSq = counts.map(c => c * c).sum
      lang -> ((counts.size.toLong, nDocs, sumSq,
        sumSq * 1000000L / (nDocs * nDocs),
        round6(nDocs.toDouble * nDocs.toDouble / sumSq.toDouble)))
    }
    val out = Sampling.mixSimpson(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nSrc, nDocs, sumSq, ppm, eff) = expected(row.getAs[String]("lang"))
      assert(row.getAs[Long]("n_sources") == nSrc)
      assert(row.getAs[Long]("n_docs") == nDocs)
      assert(row.getAs[Long]("sum_sq") == sumSq)
      assert(row.getAs[Long]("simpson_ppm") == ppm)
      assert(row.getAs[Double]("effective_sources") == eff)
      // 1 <= effective sources <= actual sources (equality iff uniform)
      assert(eff >= 1.0 - 1e-9 && eff <= nSrc + 1e-9)
    }
  }

  test("q_fano: plain-Scala variance-to-mean recompute over hourly counts") {
    val counts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, h), g) => (et, h, g.length.toLong) }
    val expected = counts.groupBy(_._1).map { case (et, xs) =>
      val nh = xs.size.toLong
      val sx = xs.map(_._3).sum
      val sxx = xs.map(x => x._3 * x._3).sum
      val fano = round6((nh * sxx - sx * sx).toDouble / (nh * sx).toDouble)
      et -> ((nh, sx, sxx, fano, nh * sxx - sx * sx > 2 * nh * sx))
    }
    val out = QuerySurface.fano(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nh, sx, sxx, fano, bursty) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("nh") == nh && row.getAs[Long]("sx") == sx)
      assert(row.getAs[Long]("sxx") == sxx)
      assert(row.getAs[Double]("fano") == fano, s"fano ${row.getString(0)}")
      assert(row.getAs[Boolean]("is_bursty") == bursty)
      assert(fano >= 0.0) // population variance is non-negative
    }
  }

  test("q_sax: plain-Scala PAA + z-breakpoint symbolization recompute") {
    val counts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, h), g) => (et, h, g.length.toLong) }
      .toSeq
    val expected = counts.groupBy(_._1).map { case (et, xs) =>
      val h0 = xs.map(_._2).min; val h1 = xs.map(_._2).max
      val nh = xs.size.toLong
      val sx = xs.map(_._3).sum
      val sxx = xs.map(x => x._3 * x._3).sum
      val varnum = nh * sxx - sx * sx
      val segs = xs.groupBy(x => (x._2 - h0) * 8 / (h1 - h0 + 1))
      val word = segs.toSeq.sortBy(_._1).map { case (_, ss) =>
        val nS = ss.size.toLong
        val d = ss.map(_._3).sum * nh - sx * nS
        val dd = d.toDouble * d.toDouble
        val cut = 0.45495025 * nS.toDouble * nS.toDouble * varnum.toDouble
        if (d < 0 && dd > cut) "a" else if (d < 0) "b"
        else if (dd > cut) "d" else "c"
      }.mkString
      et -> ((nh, word))
    }
    val out = QuerySurface.sax(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nh, word) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n_hours") == nh)
      assert(row.getAs[String]("sax_word") == word,
        s"sax ${row.getString(0)}: got ${row.getAs[String]("sax_word")} want $word")
      assert(word.length <= QuerySurface.SaxSegments &&
        word.forall("abcd".contains(_)))
    }
  }

  test("q_topn_share: plain-Scala whale-share recompute") {
    val perUser = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST(floor(value * 1000000) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).map { case ((et, u), g) => (et, u, g.map(_._3).sum) }
      .toSeq
    val expected = perUser.groupBy(_._1).map { case (et, xs) =>
      val ranked = xs.sortBy(x => (-x._3, x._2))
      val total = xs.map(_._3).sum
      val topn = ranked.take(10).map(_._3).sum
      et -> ((xs.size.toLong, total, topn, topn * 1000000L / total))
    }
    val out = QuerySurface.topNShare(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nU, total, topn, ppm) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n_users") == nU)
      assert(row.getAs[Long]("total_fp") == total)
      assert(row.getAs[Long]("topn_fp") == topn)
      assert(row.getAs[Long]("topn_share_ppm") == ppm)
      // whale share is at least the uniform share of 10 users
      assert(ppm >= 10000000L / nU)
    }
  }

  test("text_readability: plain-Scala feature recompute") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val words = text.split(" ", -1)
      val nW = words.length.toLong
      val nS = math.max(text.count(_ == '.').toLong, 1L)
      val nC = text.length.toLong
      val nLong = words.count(_.length >= 7).toLong
      id -> ((nW, nS, nC, nLong,
        nW * 1000000L / nS, nC * 1000000L / nW, nLong * 1000000L / nW))
    }.toMap
    val out = graft.operators.TextAnalysis.readability(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nW, nS, nC, nLong, wps, cpw, lw) = expected(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_words") == nW)
      assert(row.getAs[Long]("n_sentences") == nS)
      assert(row.getAs[Long]("n_chars") == nC)
      assert(row.getAs[Long]("n_long_words") == nLong)
      assert(row.getAs[Long]("words_per_sentence_ppm") == wps)
      assert(row.getAs[Long]("chars_per_word_ppm") == cpw)
      assert(row.getAs[Long]("long_word_ppm") == lw && lw <= 1000000L)
    }
  }

  test("text_line_dedup: plain-Scala cross-document line accounting " +
      "(Gopher rule)") {
    import graft.functions.PortableHash
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc: Map[Long, Seq[Long]] = docs.map { case (id, text) =>
      id -> text.split("\\.", -1).map(_.trim).filter(_.nonEmpty)
        .map(PortableHash.md5Lower63).toSeq
    }.toMap
    val df = perDoc.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val expected = perDoc.collect { case (id, lhs) if lhs.nonEmpty =>
      val byHash = lhs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nLines = lhs.length.toLong
      val cross = byHash.collect { case (h, n) if df(h) > 1 => n }.sum
      val self = byHash.values.collect { case n if n > 1 => n - 1 }.sum
      val ppm = cross * 1000000L / nLines
      id -> ((nLines, byHash.size.toLong, cross, self, ppm, ppm > 300000L))
    }
    val out = graft.operators.TextAnalysis.lineDedup(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nL, nD, cross, self, ppm, flag) = expected(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_lines") == nL)
      assert(row.getAs[Long]("n_distinct_lines") == nD)
      assert(row.getAs[Long]("n_cross_dup") == cross)
      assert(row.getAs[Long]("n_self_dup") == self)
      assert(row.getAs[Long]("cross_dup_ppm") == ppm)
      assert(row.getAs[Boolean]("flag_gopher") == flag)
      assert(cross <= nL && self <= nL - nD)
    }
  }

  test("q_theilsen: plain-Scala median-of-pairwise-slopes recompute; " +
      "robust to the level shift that drags OLS") {
    val counts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, h), g) => (et, h, g.length.toLong) }
      .toSeq
    val expected = counts.groupBy(_._1).map { case (et, xs) =>
      val slopes = (for {
        (_, h1, c1) <- xs; (_, h2, c2) <- xs; if h1 < h2
      } yield {
        val num = (c2 - c1) * 1000000L
        val den = h2 - h1
        // mirror Spark div / DuckDB //: truncation toward zero
        num / den
      }).sorted
      val med = slopes(((slopes.length + 1) / 2) - 1)
      et -> ((slopes.length.toLong, med, med > 0L))
    }
    val out = QuerySurface.theilSen(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (np, med, rising) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n_pairs") == np)
      assert(row.getAs[Long]("theil_sen_slope_fp") == med,
        s"slope ${row.getString(0)}")
      assert(row.getAs[Boolean]("rising") == rising)
    }
  }

  test("otel_exemplars: plain-Scala per-op top-3 argmax with deterministic " +
      "tie-break") {
    val n = 2000L
    val spans = for {
      t <- 0L until n
      i <- 0L to (t % 15)
    } yield (s"op-${(t + i) % 7}", t, i, 1000L + ((t * 31 + i * 17) % 97) * 10)
    val expected = spans.groupBy(_._1).flatMap { case (name, ss) =>
      ss.sortBy { case (_, t, i, d) => (-d, t, i) }.take(3).zipWithIndex
        .map { case ((_, t, i, d), idx) =>
          (name, idx + 1L) -> ((t, i, d))
        }
    }
    val out = OtelQueries.exemplars(spark, sf).collect()
    assert(out.length == expected.size && out.length == 21)
    out.foreach { row =>
      val k = (row.getAs[String]("span_name"), row.getAs[Long]("rk"))
      val (t, i, d) = expected(k)
      assert(row.getAs[Long]("trace_id") == t, s"trace $k")
      assert(row.getAs[Long]("span_idx") == i)
      assert(row.getAs[Long]("duration_ns") == d)
    }
    // exemplar durations are non-increasing within each op
    out.groupBy(_.getAs[String]("span_name")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("duration_ns"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
