package graft

import graft.functions.PortableHash
import graft.operators.{Dedup, OtelQueries, QuerySurface, Tables}
import org.apache.spark.sql.functions.col

/** Round-9 second-extension gates: hourly-count autocorrelation, 3×3
  * normal-equation OLS, MAD robust outliers, error root-cause attribution
  * over the span forest, and directed shingle containment — each verified
  * by a full plain-Scala recompute sharing no Spark/SQL machinery with the
  * operator under test (the same discipline as Round9bOpsSpec). */
class Round9cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  private def eventRows(): Array[(String, Long, Long)] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts)",
        "CAST(floor(value * 1000000) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q_acf: plain-Scala Pearson recompute over hourly counts at lags 1-3") {
    val counts = eventRows()
      .groupBy { case (et, us, _) => (et, us / 3600000000L) }
      .view.mapValues(_.length.toLong).toMap
    val expected = (for {
      ((et, h), ca) <- counts.toSeq
      lag <- 1L to 3L
      cb <- counts.get((et, h + lag))
    } yield (et, lag, ca, cb))
      .groupBy(t => (t._1, t._2))
      .map { case ((et, lag), ps) =>
        val np = ps.length.toLong
        val sx = ps.map(_._3).sum; val sy = ps.map(_._4).sum
        val sxx = ps.map(p => p._3 * p._3).sum
        val syy = ps.map(p => p._4 * p._4).sum
        val sxy = ps.map(p => p._3 * p._4).sum
        val num = np * sxy - sx * sy
        val r = num.toDouble / math.sqrt(
          (np.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
            (np.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
        (et, lag) -> ((np, num, round6(r)))
      }
    val out = QuerySurface.acf(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (np, num, r) =
        expected((row.getAs[String]("event_type"), row.getAs[Long]("lag")))
      assert(row.getAs[Long]("np") == np)
      assert(row.getAs[Long]("num") == num)
      assert(row.getAs[Double]("acf") == r,
        s"acf ${row.getAs[String]("event_type")} lag ${row.getAs[Long]("lag")}")
      assert(math.abs(r) <= 1.000001)
    }
  }

  test("q_ols: plain-Scala Cramer recompute + residual-sum invariant") {
    val rows = eventRows().map { case (et, us, yFp) =>
      (et, (us / 3600000000L) % 24, ((us / 86400000000L) + 4) % 7, yFp)
    }
    val expected = rows.groupBy(_._1).map { case (et, xs) =>
      val n = xs.length.toLong
      val s1 = xs.map(_._2).sum; val s2 = xs.map(_._3).sum
      val s11 = xs.map(x => x._2 * x._2).sum
      val s12 = xs.map(x => x._2 * x._3).sum
      val s22 = xs.map(x => x._3 * x._3).sum
      val sy = xs.map(_._4).sum
      val s1y = xs.map(x => x._2 * x._4).sum
      val s2y = xs.map(x => x._3 * x._4).sum
      def d(v: Long) = v.toDouble
      val det = d(n) * (d(s11) * d(s22) - d(s12) * d(s12)) -
        d(s1) * (d(s1) * d(s22) - d(s12) * d(s2)) +
        d(s2) * (d(s1) * d(s12) - d(s11) * d(s2))
      val det0 = d(sy) * (d(s11) * d(s22) - d(s12) * d(s12)) -
        d(s1) * (d(s1y) * d(s22) - d(s12) * d(s2y)) +
        d(s2) * (d(s1y) * d(s12) - d(s11) * d(s2y))
      val det1 = d(n) * (d(s1y) * d(s22) - d(s2y) * d(s12)) -
        d(sy) * (d(s1) * d(s22) - d(s12) * d(s2)) +
        d(s2) * (d(s1) * d(s2y) - d(s1y) * d(s2))
      val det2 = d(n) * (d(s11) * d(s2y) - d(s12) * d(s1y)) -
        d(s1) * (d(s1) * d(s2y) - d(s1y) * d(s2)) +
        d(sy) * (d(s1) * d(s12) - d(s11) * d(s2))
      et -> ((n, sy, round6(det0 / det / 1000000.0),
        round6(det1 / det / 1000000.0), round6(det2 / det / 1000000.0)))
    }
    val out = QuerySurface.ols(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val et = row.getAs[String]("event_type")
      val (n, sy, b0, b1, b2) = expected(et)
      assert(row.getAs[Long]("n") == n && row.getAs[Long]("sy") == sy)
      assert(row.getAs[Double]("beta0") == b0, s"beta0 $et")
      assert(row.getAs[Double]("beta1") == b1, s"beta1 $et")
      assert(row.getAs[Double]("beta2") == b2, s"beta2 $et")
      // first normal equation: residuals sum to ~0 (betas are 10^-6-rounded,
      // so the bound is the rounding error propagated through n rows)
      val resid = rows.filter(_._1 == et).map { case (_, x1, x2, yFp) =>
        yFp / 1000000.0 - b0 - b1 * x1 - b2 * x2
      }.sum
      assert(math.abs(resid) < 0.05, s"residual sum $et = $resid")
    }
  }

  test("q_mad_outliers: plain-Scala median/MAD recompute, integer threshold") {
    val byType = eventRows().groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted).toMap
    val expected = byType.map { case (et, vs) =>
      val n = vs.length
      val med = vs(((n + 1) / 2) - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs(((n + 1) / 2) - 1)
      val nOut = devs.count(d => d * 10000L > 44478L * mad).toLong
      et -> ((n.toLong, med, mad, nOut, nOut * 1000000L / n))
    }
    val out = QuerySurface.madOutliers(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (n, med, mad, nOut, ppm) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("med") == med, s"med ${row.getString(0)}")
      assert(row.getAs[Long]("mad") == mad, s"mad ${row.getString(0)}")
      assert(row.getAs[Long]("n_outliers") == nOut)
      assert(row.getAs[Long]("outlier_ppm") == ppm)
    }
  }

  test("otel_root_cause: plain-Scala forest regeneration + deepest-error argmax") {
    val n = 2000L
    case class S(trace: Long, idx: Long, name: String, dur: Long, svc: String,
      err: Boolean, depth: Int)
    val spans = for {
      t <- 0L until n
      i <- 0L to (t % 15)
    } yield S(t, i, s"op-${(t + i) % 7}",
      1000L + ((t * 31 + i * 17) % 97) * 10,
      s"svc-${(t + i * 5) % 6}",
      (t * 13 + i * 7) % 37 == 0,
      if (i == 0) 0 else if (i <= 2) 1 else if (i <= 6) 2 else 3)
    val errs = spans.filter(_.err)
    val expected = errs.groupBy(_.trace).toSeq.map { case (_, es) =>
      val pick = es.maxBy(s => (s.depth, s.idx))
      (pick, es.length.toLong)
    }.groupBy { case (p, _) => (p.svc, p.name) }
      .map { case (k, ps) =>
        k -> ((ps.length.toLong, ps.map(_._2).sum,
          ps.map(_._1.dur).sum, ps.map(_._1.depth.toLong).sum))
      }
    val out = OtelQueries.errorRootCause(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val k = (row.getAs[String]("svc"), row.getAs[String]("span_name"))
      val (nt, ne, dur, dep) = expected(k)
      assert(row.getAs[Long]("n_traces") == nt, s"n_traces $k")
      assert(row.getAs[Long]("n_err_spans") == ne)
      assert(row.getAs[Long]("dur_ns_total") == dur)
      assert(row.getAs[Long]("depth_total") == dep)
    }
    // every attributed trace carries >= 1 error span; echoes never exceed
    // the trace's span budget (15)
    val totalTraces = out.map(_.getAs[Long]("n_traces")).sum
    val totalErrs = out.map(_.getAs[Long]("n_err_spans")).sum
    assert(totalErrs >= totalTraces && totalErrs <= totalTraces * 15)
  }

  test("otel_self_time: plain-Scala child-sum recompute (flamegraph " +
      "exclusive-time algebra)") {
    val n = 2000L
    val spans = for {
      t <- 0L until n
      i <- 0L to (t % 15)
    } yield (t, i, s"op-${(t + i) % 7}", 1000L + ((t * 31 + i * 17) % 97) * 10)
    val childSum = spans.filter(_._2 > 0)
      .groupBy { case (t, i, _, _) => (t, (i - 1) / 2) }
      .view.mapValues(_.map(_._4).sum).toMap
    val expected = spans.groupBy(_._3).map { case (name, ss) =>
      val incl = ss.map(_._4).sum
      val child = ss.map(s => childSum.getOrElse((s._1, s._2), 0L)).sum
      name -> ((ss.length.toLong, incl, child, incl - child,
        (incl - child) * 1000000L / incl))
    }
    val out = graft.operators.OtelQueries.selfTime(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (ns, incl, child, self, ppm) = expected(row.getAs[String]("span_name"))
      assert(row.getAs[Long]("n_spans") == ns)
      assert(row.getAs[Long]("incl_ns") == incl)
      assert(row.getAs[Long]("child_ns") == child)
      assert(row.getAs[Long]("self_ns") == self)
      assert(row.getAs[Long]("self_ppm") == ppm)
      // inclusive always covers self by the algebra
      assert(self == incl - child)
    }
    // forest-wide conservation: Σ self = Σ incl − Σ child
    assert(out.map(_.getAs[Long]("self_ns")).sum ==
      out.map(_.getAs[Long]("incl_ns")).sum - out.map(_.getAs[Long]("child_ns")).sum)
  }

  test("pair_preference: plain-Scala best-vs-worst mirror pairing recompute") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val scored = docs.map { case (src, id, text) =>
      val toks = text.split(" ")
      (src, id, toks.distinct.length.toLong * 1000000L / toks.length)
    }
    val expected = scored.groupBy(_._1).flatMap { case (src, xs) =>
      val ranked = xs.sortBy(x => (-x._3, x._2))
      val nDocs = ranked.length
      (1 to nDocs / 2).flatMap { i =>
        val chosen = ranked(i - 1)
        val rejected = ranked(nDocs - i)
        if (chosen._3 > rejected._3)
          Some((src, i.toLong) ->
            ((chosen._2, rejected._2, chosen._3, rejected._3)))
        else None
      }
    }
    val out = graft.operators.Sampling.preferencePairs(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val k = (row.getAs[String]("source"), row.getAs[Long]("pair_idx"))
      val (cid, rid, cs, rs) = expected(k)
      assert(row.getAs[Long]("chosen_id") == cid && row.getAs[Long]("rejected_id") == rid)
      assert(row.getAs[Long]("chosen_score") == cs)
      assert(row.getAs[Long]("rejected_score") == rs)
      assert(row.getAs[Long]("gap") == cs - rs && cs > rs)
      assert(cid != rid)
    }
  }

  test("q_winsorize: plain-Scala p5/p95 clamp recompute; winsorized mean " +
      "sits inside the band") {
    val byType = eventRows().groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted).toMap
    val expected = byType.map { case (et, vs) =>
      val n = vs.length
      val p5 = vs(((n + 19) / 20) - 1)
      val p95 = vs(((19 * n + 19) / 20) - 1)
      val clamped = vs.map(v => math.max(p5, math.min(p95, v)))
      def avg(xs: Seq[Long]): Double = {
        // mirror exactAvg: 6-dp decimal sum of v/1e6, then /n, then round6
        val dec = xs.map(v => BigDecimal(v.toDouble / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        round6(dec.toDouble / n)
      }
      et -> ((n.toLong, p5, p95, avg(vs), avg(clamped)))
    }
    val out = QuerySurface.winsorize(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (n, p5, p95, mRaw, mW) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("p5") == p5 && row.getAs[Long]("p95") == p95)
      assert(row.getAs[Double]("mean_raw") == mRaw, s"raw ${row.getString(0)}")
      assert(row.getAs[Double]("mean_winsor") == mW, s"winsor ${row.getString(0)}")
      // the winsorized mean is clamped into the band; the raw one need not be
      assert(mW * 1000000.0 >= p5 - 1 && mW * 1000000.0 <= p95 + 1)
    }
  }

  test("ShingleHashExpr property: 200 seeded token strings match the " +
      "plain-Scala distinct-shingle digest bit-for-bit, first-occurrence " +
      "order preserved") {
    import spark.implicits._
    import graft.functions.{ShingleExpressions, ShingleHash}
    val rnd = new scala.util.Random(20260815L)
    val vocab = Seq("the", "a", "fox", "中文", "x9", "", "-", "lorem", "é")
    val samples = (1 to 200).map { _ =>
      val len = rnd.nextInt(12)
      (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }.distinct
    val got = samples.toDF("text")
      .withColumn("shh", ShingleExpressions.shingleHashes(col("text")))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    samples.foreach { s =>
      val toks = s.split(" ", -1)
      val expected =
        if (toks.length < 3) Seq.empty[Long]
        else {
          val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
          toks.sliding(3).foreach(w =>
            seen += PortableHash.md5Lower63(w.mkString(" ")))
          seen.toSeq
        }
      assert(got(s) == expected, s"shingles of '${s.take(40)}'")
      assert(got(s) == ShingleHash.computeArray(s).toSeq)
    }
  }

  test("docShingleHashes signs via the native expression — no ScalaUDF on " +
      "the shingle path") {
    val plan = graft.operators.Dedup.docShingleHashes(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("shingle_hashes"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("q_snaive: plain-Scala lag-168 seasonal-naive MAE/bias recompute") {
    val counts = eventRows()
      .groupBy { case (et, us, _) => (et, us / 3600000000L) }
      .view.mapValues(_.length.toLong).toMap
    val errs = (for {
      ((et, h), ca) <- counts.toSeq
      cb <- counts.get((et, h + 168L))
    } yield (et, cb - ca)).groupBy(_._1)
    def avg(xs: Seq[Long]): Double = {
      val dec = xs.map(v => BigDecimal(v.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      round6(dec.toDouble / xs.length)
    }
    val expected = errs.map { case (et, es) =>
      val e = es.map(_._2)
      et -> ((e.length.toLong, e.map(math.abs).sum, e.sum,
        avg(e.map(math.abs)), avg(e)))
    }
    val out = QuerySurface.seasonalNaive(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (n, aet, bt, mae, bias) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n_hours") == n)
      assert(row.getAs[Long]("abs_err_total") == aet)
      assert(row.getAs[Long]("bias_total") == bt)
      assert(row.getAs[Double]("mae") == mae, s"mae ${row.getString(0)}")
      assert(row.getAs[Double]("bias") == bias)
      // MAE dominates |bias| by the triangle inequality
      assert(mae >= math.abs(bias) - 1e-9)
    }
  }

  test("text_novelty: plain-Scala df-tier recompute (unique vs boilerplate " +
      "shingle shares)") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val shingles: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val sh = if (toks.length < 3) Set.empty[Long]
      else toks.sliding(3).map(w => PortableHash.md5Lower63(w.mkString(" "))).toSet
      id -> sh
    }.toMap
    val df = shingles.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = shingles.collect { case (id, sh) if sh.nonEmpty =>
      val nU = sh.count(df(_) == 1).toLong
      val nB = sh.count(df(_) > 20).toLong
      id -> ((sh.size.toLong, nU, nB,
        nU * 1000000L / sh.size, nB * 1000000L / sh.size))
    }
    val out = graft.operators.TextAnalysis.novelty(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nSh, nU, nB, nppm, bppm) = expected(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_sh") == nSh)
      assert(row.getAs[Long]("n_unique") == nU)
      assert(row.getAs[Long]("n_boiler") == nB)
      assert(row.getAs[Long]("novelty_ppm") == nppm)
      assert(row.getAs[Long]("boiler_ppm") == bppm)
      // tiers never overlap: df=1 and df>20 are disjoint
      assert(nU + nB <= nSh)
    }
  }

  test("dedup_containment: plain-Scala capped shingle-set recompute, " +
      "directed near-subset rule") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val shingles: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val sh = if (toks.length < 3) Set.empty[Long]
      else toks.sliding(3).map(w => PortableHash.md5Lower63(w.mkString(" "))).toSet
      id -> sh
    }.toMap
    val df = shingles.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = shingles.view.mapValues(_.filter(h => df(h) <= 20)).toMap
    val expected = (for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq
      if a != b && sa.nonEmpty
      c = (sa & sb).size.toLong
      if c * 10 >= sa.size * 8 && sa.size < sb.size
    } yield (a, b) -> ((sa.size.toLong, sb.size.toLong, c,
      round6(c.toDouble / sa.size.toDouble)))).toMap
    val out = Dedup.shingleContainment(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val k = (row.getAs[Long]("id_sub"), row.getAs[Long]("id_super"))
      val (nSub, nSuper, c, cont) = expected(k)
      assert(row.getAs[Long]("n_sub") == nSub && row.getAs[Long]("n_super") == nSuper)
      assert(row.getAs[Long]("c") == c)
      assert(row.getAs[Double]("containment") == cont)
      // the directed rule: contained side strictly smaller, containment >= 0.8
      assert(nSub < nSuper && cont >= 0.8)
    }
  }
}
