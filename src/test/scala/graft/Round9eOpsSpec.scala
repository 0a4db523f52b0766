package graft

import graft.functions.PortableHash
import graft.operators.{QuerySurface, Tables}

/** Round-9 fourth-extension gates: Kendall τ-a, Spearman ρ, and the
  * Poisson-bootstrap CI — plain-Scala recomputes sharing no Spark/SQL
  * machinery with the operators under test. */
class Round9eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The spec's own copy of the Poisson(1) CDF thresholds — independently
    * recomputed (decimal e^{-1} partial sums × 2⁶³), not read from the
    * operator, so a constant typo there fails here. */
  private val PoissonTs = Seq(3393088950634442637L, 6786177901268885274L,
    8482722376586106593L, 9048237201691847032L, 9189615907968282142L,
    9217891649223569164L, 9222604272766117001L, 9223277504700766692L,
    9223361658692597904L)

  /** The shared hourly (cnt, fixed-point value-sum) frame both rank gates
    * aggregate first — recomputed here straight off the raw collect. */
  private def hourly: Map[String, Seq[(Long, Long, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 as h",
        "CAST(floor(value * 1000000) AS BIGINT) as v_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((et, h), g) => (et, h, g.size.toLong, g.map(_._3).sum) }
      .groupBy(_._1).map { case (et, xs) =>
        et -> xs.map(x => (x._2, x._3, x._4)).sortBy(_._1)
      }

  test("q_kendall: pairwise sign-concordance recompute; tau bounded; " +
      "conc+disc+ties covers every pair") {
    val expected = hourly.map { case (et, xs) =>
      val pairs = for {
        i <- xs.indices; j <- xs.indices if xs(i)._1 < xs(j)._1
      } yield (xs(j)._2 - xs(i)._2, xs(j)._3 - xs(i)._3)
      val c = pairs.count { case (dc, ds) => (dc > 0 && ds > 0) || (dc < 0 && ds < 0) }
      val d = pairs.count { case (dc, ds) => (dc > 0 && ds < 0) || (dc < 0 && ds > 0) }
      et -> ((pairs.size.toLong, c.toLong, d.toLong,
        (c.toLong - d.toLong) * 1000000L / pairs.size.toLong))
    }
    val out = QuerySurface.kendall(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val et = row.getAs[String]("event_type")
      val (np, c, d, tau) = expected(et)
      assert(row.getAs[Long]("n_pairs") == np, s"n_pairs $et")
      assert(row.getAs[Long]("n_conc") == c && row.getAs[Long]("n_disc") == d)
      assert(row.getAs[Long]("n_ties") == np - c - d)
      assert(row.getAs[Long]("tau_a_ppm") == tau, s"tau $et")
      assert(math.abs(tau) <= 1000000L)
    }
  }

  test("q_spearman: rank-difference recompute with the (metric, h) " +
      "tie-break; rho within [-1e6, 1e6]") {
    val expected = hourly.collect { case (et, xs) if xs.size > 1 =>
      def ranks(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
        xs.sortBy(x => (key(x), x._1)).zipWithIndex
          .map { case (x, i) => x._1 -> (i + 1L) }.toMap
      val rc = ranks(_._2); val rs = ranks(_._3)
      val n = xs.size.toLong
      val d2 = xs.map(x => { val d = rc(x._1) - rs(x._1); d * d }).sum
      et -> ((n, d2, 1000000L - 6L * d2 * 1000000L / (n * (n * n - 1L))))
    }
    val out = QuerySurface.spearman(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val et = row.getAs[String]("event_type")
      val (n, d2, rho) = expected(et)
      assert(row.getAs[Long]("n_hours") == n && row.getAs[Long]("sum_d2") == d2)
      assert(row.getAs[Long]("spearman_fp") == rho, s"rho $et")
      assert(rho >= -1000000L && rho <= 1000000L)
    }
  }

  test("q_bootstrap_ci: Poisson-weight recompute from the same hash and " +
      "thresholds; replicate means, rank picks, and point estimate agree") {
    val b = 32
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "event_id",
        "CAST(floor(value * 1000000) AS BIGINT) as v_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ts = PoissonTs
    val expected = rows.groupBy(_._1).map { case (et, xs) =>
      val repMeans = (0 until b).flatMap { bi =>
        val (swv, sw) = xs.foldLeft((0L, 0L)) { case ((a, c), (_, id, v)) =>
          val h = PortableHash.md5Lower63(s"boot:$bi:$id")
          val w = ts.count(h >= _).toLong
          (a + w * v, c + w)
        }
        if (sw > 0) Some((swv / sw, bi.toLong)) else None
      }.sorted
      val np = repMeans.size
      et -> ((xs.length.toLong, xs.map(_._3).sum / xs.length,
        np.toLong, repMeans(1)._1, repMeans(np - 2)._1))
    }
    val out = QuerySurface.bootstrapCi(spark, sf, b).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val et = row.getAs[String]("event_type")
      val (n, mean, np, lo, hi) = expected(et)
      assert(row.getAs[Long]("n_rows") == n && row.getAs[Long]("mean_fp") == mean)
      assert(row.getAs[Long]("n_reps") == np)
      assert(row.getAs[Long]("boot_lo_fp") == lo, s"lo $et")
      assert(row.getAs[Long]("boot_hi_fp") == hi, s"hi $et")
      assert(lo <= hi)
    }
  }

  test("cluster_eval: member counts and cohesion recompute from the kmeans " +
      "assignment; margin identity; nearest-centroid invariants; determinism") {
    import graft.operators.Clustering
    val asg = Clustering.kmeans(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Double]("cos")))
      .filter(x => !x._2.isNaN)
    def round6(x: Double): Double =
      math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val expected = asg.groupBy(_._1).map { case (cl, xs) =>
      val sum = xs.map(x => BigDecimal(x._2).setScale(6)).sum
      cl -> ((xs.length.toLong, round6(sum.toDouble / xs.length)))
    }
    val out = Clustering.clusterEval(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val cl = row.getAs[Long]("cluster")
      val (n, coh) = expected(cl)
      assert(row.getAs[Long]("n_members") == n, s"n_members $cl")
      assert(row.getAs[Double]("cohesion") == coh, s"cohesion $cl")
      val nnCl = row.getAs[Long]("nn_cluster")
      val nnCos = row.getAs[Double]("nn_cos")
      assert(nnCl != cl && nnCl >= 0)
      assert(nnCos <= 1.000001, s"nn_cos $nnCos")
      assert(row.getAs[Double]("margin") ==
        row.getAs[Double]("cohesion") - nnCos)
    }
    val again = Clustering.clusterEval(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("text_zipf: full rank-frequency recompute — deciles, products, " +
      "median picks; head decile dominates the tail") {
    import graft.operators.TextAnalysis
    val freqs = Tables.documents(spark, sf).selectExpr("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val ranked = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((t, f), i) => (i + 1L, f) }
    val nv = ranked.size.toLong
    val expected = ranked
      .map { case (r, f) => ((r - 1L) * 10L / nv, r * f, r) }
      .groupBy(_._1).map { case (dec, xs) =>
        val sortedRf = xs.sortBy(x => (x._2, x._3)).map(_._2)
        val np = sortedRf.size.toLong
        dec -> ((np, sortedRf.min, sortedRf(((np + 1L) / 2L).toInt - 1),
          sortedRf.max))
      }
    val out = TextAnalysis.zipf(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val dec = row.getAs[Long]("decile")
      val (np, mn, med, mx) = expected(dec)
      assert(row.getAs[Long]("n_terms") == np, s"n $dec")
      assert(row.getAs[Long]("min_rf") == mn && row.getAs[Long]("max_rf") == mx)
      assert(row.getAs[Long]("median_rf") == med, s"median $dec")
    }
    // Zipf shape: the head decile's median product is far below the tail's
    // (tail ranks grow while tail freqs floor at 1)
    val meds = out.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("median_rf"))
    assert(meds.head < meds.last)
  }

  test("sim_ann_mrr: first-hit rank recomputes from the green exact-top-k " +
      "and annLsh gates; reciprocal is exact ppm; recall=0 queries score 0") {
    import graft.operators.Similarity
    val exact = Similarity.topK(spark, sf, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val annRanks = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id")))
    val expected = exact.map(_._1).map { q =>
      val hits = annRanks.filter(a =>
        a._1 == q && exact.contains((q, a._3))).map(_._2)
      q -> (if (hits.isEmpty) 0L else hits.min)
    }.toMap
    val out = Similarity.annMrr(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val q = row.getAs[Long]("query_id")
      val fh = row.getAs[Long]("first_hit_rank")
      assert(fh == expected(q), s"first_hit_rank $q")
      assert(row.getAs[Long]("mrr_ppm") ==
        (if (fh > 0) 1000000L / fh else 0L))
    }
    // at least one query must find a true neighbor (else the gate is vacuous)
    assert(out.exists(_.getAs[Long]("first_hit_rank") > 0))
  }

  test("stream_boot: closed-hour Poisson-band recompute from raw events " +
      "with the same hash, thresholds, and rank picks") {
    val HourUs = 3600000000L
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) as us", "event_id",
        "CAST(floor(value * 1000000) AS BIGINT) as v_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wmMs = rows.map(_._1).max / 1000L -
      graft.streaming.StreamGate.WindowDelayMs
    val expected = rows.groupBy(_._1 / HourUs * HourUs)
      .filter { case (h, _) => (h + HourUs) / 1000L <= wmMs }
      .map { case (h, xs) =>
        val reps = (0 until 32).flatMap { b =>
          val (swv, sw) = xs.foldLeft((0L, 0L)) { case ((a, c), (_, id, v)) =>
            val w = PoissonTs.count(PortableHash.md5Lower63(s"boot:$b:$id") >= _)
            (a + w * v, c + w)
          }
          if (sw > 0) Some((swv / sw, b.toLong)) else None
        }.sorted
        h -> ((reps.size.toLong, reps(1)._1, reps(reps.size - 2)._1))
      }
    val out = graft.streaming.StreamGate.bootWindows(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Long]("hour_us")
      val (np, lo, hi) = expected(h)
      assert(r.getAs[Long]("n_reps") == np, s"n_reps $h")
      assert(r.getAs[Long]("boot_lo_fp") == lo, s"lo $h")
      assert(r.getAs[Long]("boot_hi_fp") == hi, s"hi $h")
    }
  }

  test("q_gini: rank-weighted recompute over user totals; bounds; the " +
      "uniform distribution scores 0") {
    val totals = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST(floor(value * 1000000) AS BIGINT) as v_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((et, u), g) => (et, u, g.map(_._3).sum) }
    val expected = totals.groupBy(_._1).map { case (et, xs) =>
      val ranked = xs.sortBy(x => (x._3, x._2)).zipWithIndex
        .map { case (x, i) => (i + 1L, x._3) }
      val n = ranked.size.toLong
      val s = ranked.map(x => BigInt(x._2)).sum
      val w = ranked.map(x => BigInt(x._1) * BigInt(x._2)).sum
      et -> ((n, ((w * 2 - s * (n + 1)) * 1000000 / (s * n)).toLong))
    }
    val out = QuerySurface.gini(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val et = row.getAs[String]("event_type")
      val (n, g) = expected(et)
      assert(row.getAs[Long]("n_users") == n)
      assert(row.getAs[Long]("gini_ppm") == g, s"gini $et")
      assert(g >= 0L && g < 1000000L)
    }
    // identity check on the formula itself: a perfectly uniform
    // distribution has G = 0 exactly
    val uni = (1 to 10).map(i => (i.toLong, 100L))
    val us = uni.map(x => BigInt(x._2)).sum
    val uw = uni.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x._2 }.sum
    assert((uw * 2 - us * 11) * 1000000 / (us * 10) == 0)
  }

  test("sim_ann_ivf_tbl: the materialized index reproduces the in-plan IVF " +
      "bit-for-bit, twice (memo hit)") {
    import graft.operators.Similarity
    val inPlan = Similarity.annIvf(spark, sf).collect().map(_.toSeq).toSeq
    val fromTbl = Similarity.annIvfFromTable(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(fromTbl == inPlan && inPlan.nonEmpty)
    // second call reads the memoized index — same rows, no rebuild
    val again = Similarity.annIvfFromTable(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(again == inPlan)
  }

  test("dedup_split_leakage: the matrix recomputes from the green LSH-pair " +
      "and split gates; totals conserve; leak flag marks exactly the " +
      "off-diagonal") {
    import graft.operators.{Dedup, Sampling}
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val split = Sampling.sampleSplit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toMap
    val expected = pairs.map { case (a, b) =>
      val (s1, s2) = (split(a), split(b))
      (if (s1 <= s2) s1 else s2, if (s1 <= s2) s2 else s1)
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val out = Dedup.splitLeakage(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { r =>
      val k = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(r.getAs[Long]("n_pairs") == expected(k), s"pairs $k")
      assert(r.getAs[Boolean]("is_leak") == (k._1 != k._2))
    }
    // conservation: the matrix covers every verified near-dup pair
    assert(out.map(_.getAs[Long]("n_pairs")).sum == pairs.length)
  }

  test("stream_boot: the elided-flush update-mode drain is row-identical " +
      "to the append+watermark form (parity by merge-commutative algebra)") {
    import graft.streaming.StreamGate
    def run(elide: Boolean): Seq[String] =
      StreamGate.bootWindows(spark, sf, elide = Some(elide))
        .collect().map(_.toString).toSeq.sorted
    val e = run(elide = true)
    val a = run(elide = false)
    assert(e.nonEmpty && e == a, "stream_boot elide parity")
  }
}
