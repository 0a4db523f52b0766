package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{QuerySurface, Ranks, Sampling, Tables, TextAnalysis}

/** Round-8 coverage: the distributed global-rank machinery that replaced
  * the three empty-key `row_number`/`ntile` windows (pack_shards, q_lorenz,
  * text_quality_ntile). Value-parity is proven against the window forms
  * they replaced — same answer, no SinglePartition funnel. */
class Round8OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("globalRank equals the empty-key row_number window (documents by size)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val viaWindow = docs.withColumn("rk",
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id")))
        .cast("long"))
    val viaRanks = Ranks.globalRank(docs, "rk",
      Seq(col("n_chars").desc, col("doc_id")))
      .select(col("doc_id"), col("n_chars"), col("rk"))
    assertFrameEqual(viaRanks, viaWindow, Seq("doc_id"))
  }

  test("globalRank is dense 1..N across many partition counts (incl. empty ranges)") {
    import spark.implicits._
    // 97 rows over 16 range partitions → several near-empty partitions;
    // ranks must still be exactly 1..97 in value order
    val df = spark.range(1, 98).select((col("id") * 37 % 101).as("k"), col("id"))
    val got = Ranks.globalRank(df, "rk", Seq(col("k"), col("id")), partitions = 16)
      .orderBy(col("k"), col("id")).select(col("rk")).as[Long].collect()
    assert(got.toSeq == (1L to 97L))
  }

  test("ntileFromRank reproduces SQL ntile for every remainder class") {
    import spark.implicits._
    for (n <- Seq(7, 10, 12, 19, 100, 101)) {
      val df = spark.range(1, n + 1).select(col("id"))
      val viaWindow = df.withColumn("t",
        ntile(10).over(Window.orderBy(col("id"))).cast("long"))
        .orderBy(col("id")).select(col("t")).as[Long].collect().toSeq
      val viaFormula = df
        .withColumn("t", Ranks.ntileFromRank(col("id"), lit(n.toLong), 10))
        .orderBy(col("id")).select(col("t")).as[Long].collect().toSeq
      assert(viaFormula == viaWindow, s"n=$n: $viaFormula vs $viaWindow")
    }
  }

  test("pack_shards matches the former window-based form cell-by-cell") {
    val s = Sampling.PackShardCount
    val ranked = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("pos", expr(s"(rk - 1) % (2 * $s)"))
      .withColumn("shard",
        expr(s"IF(pos < $s, pos, 2 * $s - 1 - pos)").cast("long"))
    val bands = ranked.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("shard_chars"))
    val expected = bands
      .withColumn("tot", sum(col("shard_chars")).over(Window.partitionBy()))
      .select(col("shard"), col("n_docs"), col("shard_chars"),
        expr(s"(abs($s * shard_chars - tot) * 1000000) div tot").as("dev_abs_ppm"),
        expr(s"$s * shard_chars >= tot").as("over_ideal"))
    assertFrameEqual(Sampling.packShards(spark, sf), expected, Seq("shard"))
  }

  test("q_lorenz matches the former window-based form cell-by-cell") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
    val od = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val rev = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(28,2)")) * 100)
        .cast("long").as("rev_c"))
    val bands = rev
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rev_c").desc, col("o_custkey"))))
      .withColumn("n_cust", count(lit(1)).over(Window.partitionBy()))
      .withColumn("decile", expr("((rn - 1) * 10) div n_cust"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("band_c"))
    val expected = bands
      .withColumn("tot_c", sum(col("band_c")).over(Window.partitionBy()))
      .withColumn("cum_c", sum(col("band_c")).over(Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_customers"), col("band_c").as("rev_cents"),
        expr("((band_c * 1000) div tot_c) * 1000 + ((band_c * 1000) % tot_c) * 1000 div tot_c")
          .as("share_ppm"),
        expr("((cum_c * 1000) div tot_c) * 1000 + ((cum_c * 1000) % tot_c) * 1000 div tot_c")
          .as("cum_share_ppm"))
    assertFrameEqual(QuerySurface.lorenzDeciles(spark, sf), expected, Seq("decile"))
  }

  // ---- real image decode through the perceptual near-dup path ----

  /** Deterministic test PNG: a w×h gradient with per-pixel perturbation
    * from `seed`, PNG-encoded via the JDK's own ImageIO (lossless). */
  private def pngBytes(w: Int, h: Int, seed: Int,
      tweak: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / (w - 1) + seed * 37) % 256
      val v = ((base + tweak(x, y)) % 256 + 256) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("image dHash: PNG decode → 9x8 gradient signature, near-dups found, " +
    "non-images fall back to the byte stub") {
    import spark.implicits._
    import graft.operators.Multimodal
    val base = pngBytes(64, 64, seed = 0)
    // one-pixel-block perturbation: cell averages barely move → tiny hamming
    val nearDup = pngBytes(64, 64, seed = 0,
      tweak = (x, y) => if (x == 10 && y == 10) 40 else 0)
    // reversed gradient: every horizontal comparison flips → huge hamming
    val far = pngBytes(64, 64, seed = 0,
      tweak = (x, _) => 255 - 2 * (x * 255 / 63))
    val sigBase = Multimodal.dhashImage(base)
    val sigNear = Multimodal.dhashImage(nearDup)
    val sigFar = Multimodal.dhashImage(far)
    assert(sigBase != 0L && (sigBase & (1L << 63)) == 0L) // 63-bit convention
    assert(java.lang.Long.bitCount(sigBase ^ sigNear) <= 2,
      s"near-dup hamming ${java.lang.Long.bitCount(sigBase ^ sigNear)}")
    assert(java.lang.Long.bitCount(sigBase ^ sigFar) > 20,
      s"far hamming ${java.lang.Long.bitCount(sigBase ^ sigFar)}")
    // decode is deterministic across calls (and thus across partitions)
    assert(Multimodal.dhashImage(base) == sigBase)
    // a non-image payload falls back to the byte-level stub, not an error
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.dhashImage(junk) == Multimodal.dhashStub(junk))

    // end-to-end through the SAME banding/verify plan as the gate, with the
    // real decoder swapped in for the stub
    val media = Seq(
      Multimodal.Media(1L, "image/png", base),
      Multimodal.Media(2L, "image/png", nearDup),
      Multimodal.Media(3L, "image/png", far)).toDS()
    val pairs = Multimodal.nearDupMediaPairs(media, maxHamming = 6,
        sig = Multimodal.dhashImage)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"pairs=$pairs")
  }

  test("text_quality_ntile matches the former ntile-window form cell-by-cell") {
    val expected = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("quality_score"), col("doc_id")))
          .cast("long"))
    assertFrameEqual(TextAnalysis.qualityNtile(spark, sf), expected, Seq("doc_id"))
  }

  // ---- service graph / tail sampling / RED over the span forest ----------

  /** Plain-Scala re-derivation of the spanTrees enrichment congruences —
    * an implementation-independent recompute (no Spark, no SQL). */
  private def enrichedForest(n: Long) = for {
    t <- 0L until n
    i <- 0L to t % 15
  } yield (t, i,
    if (i == 0) None else Some((i - 1) / 2),      // parent_idx
    s"svc-${(t + i * 5) % 6}",                    // svc
    (t * 13 + i * 7) % 37 == 0,                   // is_err
    1000L + ((t * 31 + i * 17) % 97) * 10,        // duration_ns
    (t * 7 + i) % 24)                             // hour

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("otel_service_graph recomputes exactly from the generator congruences") {
    import graft.operators.OtelQueries
    val n = 300L
    val spans = enrichedForest(n)
    val byIdx = spans.map(s => (s._1, s._2) -> s).toMap
    val edges = spans.flatMap { case (t, _, Some(p), svc, err, dur, _) =>
      Some((byIdx((t, p))._4, svc, t, err, dur))
    case _ => None
    }
    val expected = edges.groupBy(e => (e._1, e._2)).map { case ((ps, cs), g) =>
      (ps, cs, g.size.toLong, g.map(_._3).distinct.size.toLong,
        g.count(_._4).toLong,
        round6(g.map(_._5).sum.toDouble / g.size),
        round6(g.count(_._4).toDouble / g.size))
    }.toSeq.sortBy(e => (e._1, e._2))
    val got = OtelQueries.serviceGraph(spark, sf, n).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("otel_tail_sampling: policy precedence recomputes; dropped traces stay dropped") {
    import graft.operators.OtelQueries
    val n = 2000L
    val perTrace = enrichedForest(n).groupBy(_._1).map { case (t, g) =>
      val total = g.map(_._6).sum
      val hasErr = g.exists(_._5)
      val policy =
        if (hasErr) Some("error")
        else if (total >= OtelQueries.TailSamplingSlowNs) Some("latency")
        else if (t % 20 == 0) Some("probabilistic")
        else None
      (t, g.size.toLong, total, hasErr, policy)
    }
    val expected = perTrace.collect {
      case (t, ns, tot, err, Some(p)) => (t, ns, tot, err, p)
    }.toSeq.sortBy(_._1)
    val got = OtelQueries.tailSampling(spark, sf, n).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getString(4))).toSeq
    assert(got == expected)
    // a real tail sampler must DROP the bulk of the traffic
    assert(got.size < n * 2 / 5, s"sampled ${got.size} of $n")
    assert(got.map(_._5).distinct.toSet ==
      Set("error", "latency", "probabilistic")) // all three policies fire
  }

  test("otel_red_metrics: discrete p50/p95 recompute per (svc, hour) group") {
    import graft.operators.OtelQueries
    val n = 2000L
    val expected = enrichedForest(n)
      .groupBy(s => (s._4, s._7)).map { case ((svc, hour), g) =>
        val durs = g.map(s => (s._6, s._1, s._2)).sortBy(identity).map(_._1)
        val cnt = durs.size
        def pct(num: Int, den: Int) = // min duration at rank rn: num*rn >= den*cnt
          durs(((cnt * den + num - 1) / num) - 1) // ceil(cnt*den/num) - 1 index
        (svc, hour, cnt.toLong, g.count(_._5).toLong,
          pct(2, 1), pct(20, 19),
          round6(durs.map(BigDecimal(_)).sum.toDouble / cnt),
          round6(g.count(_._5).toDouble / cnt))
      }.toSeq.sortBy(e => (e._1, e._2))
    val got = OtelQueries.redMetrics(spark, sf, n).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("red/service-graph plans: windows keyed per group, join non-cartesian") {
    import graft.operators.OtelQueries
    val red = OtelQueries.redMetrics(spark, sf).queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(".r.findAllIn(red).length
    val keyed = "windowspecdefinition\\(svc".r.findAllIn(red).length
    assert(specs > 0 && specs == keyed,
      s"$keyed of $specs window specs are (svc, hour)-keyed:\n$red")
    val sg = OtelQueries.serviceGraph(spark, sf).queryExecution.executedPlan.toString
    assert(!sg.contains("Cartesian") && !sg.contains("windowspecdefinition"), sg)
  }

  // ---- hashed linear quality classifier ----------------------------------

  test("text_quality_classifier recomputes from md5 slot weights (integer-exact)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      val s = toks.map(t =>
        graft.functions.PortableHash.md5Lower63(t) % 1000L - 500L).sum
      (id, toks.length.toLong, s, round6(s.toDouble / (toks.length * 1000.0)),
        s > 0L)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.qualityClassifier(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the congruence weight table is balanced: both classes must appear
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  // ---- ANN recall audit ---------------------------------------------------

  test("sim_ann_recall is consistent with the gated exact and ANN frames") {
    import graft.operators.Similarity
    val k = 5
    val exact = Similarity.topK(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.annLsh(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.annRecall(spark, sf, k).collect()
    assert(rows.length == 8) // one row per query
    rows.foreach { r =>
      val (q, nExact, nHit, recall) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nExact == k.toLong)
      val trueHit = exact.filter(_._1 == q).count(ann.contains)
      assert(nHit == trueHit.toLong, s"query $q: $nHit vs $trueHit")
      assert(recall == round6(nHit.toDouble / k))
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // the multi-table multi-probe tier must beat the trivial 0-recall floor
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  // ---- end-to-end curation pipeline --------------------------------------

  test("pipe_curation recomputes classifier -> dedup -> accounting exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val scored = docs.map { case (id, src, lang, text) =>
      val score = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        .map(t => graft.functions.PortableHash.md5Lower63(t) % 1000L - 500L).sum
      (id, src, lang, text.split(" ", -1).length.toLong, score, md5hex(text))
    }
    val kept = scored.filter(_._5 > 0L)
    val keepIds = kept.groupBy(_._6).map { case (_, g) => g.map(_._1).min }.toSet
    val unique = kept.filter(d => keepIds(d._1))
    val totTokens = unique.map(_._4).sum
    val expected = scored.groupBy(d => (d._2, d._3)).map { case ((src, lang), g) =>
      val k = kept.count(d => d._2 == src && d._3 == lang).toLong
      val u = unique.filter(d => d._2 == src && d._3 == lang)
      val tf = u.map(_._4).sum
      (src, lang, g.size.toLong, k, u.size.toLong, tf, tf * 1000000L / totTokens)
    }.toSeq.sortBy(e => (e._1, e._2))
    val got = TextAnalysis.curationPipeline(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the pipeline must actually filter something at this sf
    assert(got.map(_._4).sum < got.map(_._3).sum)
  }

  // ---- quality-ranked dedup survivorship ----------------------------------

  test("dedup_survivors_quality keeps each family's best-quality member") {
    import graft.operators.Dedup
    val groupOf = Dedup.nearDupGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val score = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ids = score.keys.toSeq.sorted
    val bestOf = ids.groupBy(id => groupOf.getOrElse(id, id)).map {
      case (g, members) =>
        g -> members.minBy(id => (-score(id), id)) // max score, min id tiebreak
    }
    val expected = ids.map { id =>
      val g = groupOf.getOrElse(id, id)
      (id, g, score(id), bestOf(g) == id)
    }
    val got = Dedup.dedupSurvivorsQuality(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // exactly one survivor per family
    assert(got.count(_._4) == got.map(_._2).distinct.size)
  }

  // ---- explicit-bucket histogram merge ------------------------------------

  test("otel_hist_merge recomputes element-wise layout merges exactly") {
    import graft.operators.OtelQueries
    val n = 500L
    // plain-Scala re-derivation of the TestDataGen.histograms congruences
    val hists = (0L until n).flatMap { id =>
      val counts: Seq[Long] =
        if (id % 97 == 0) Seq.empty
        else (1L to id % 8 + 1).map(j =>
          if (id % 89 == 0) 0L
          else if (id % 11 == 0 && j == id % 8 + 1) 100L
          else (id * 31 + j * 17) % 5)
      val bounds: Seq[Double] =
        if (id % 97 == 0 || id % 8 == 0) Seq.empty
        else (1L to id % 8).map(j => (j * (10 + id % 13)).toDouble)
      if (counts.isEmpty) None else Some((bounds, counts))
    }
    val expected = hists.groupBy(_._1).map { case (bounds, g) =>
      val merged = g.map(_._2).transpose.map(_.sum)
      (bounds.length + 1L,
        bounds.headOption.getOrElse(0.0),
        g.size.toLong, merged.sum, merged.mkString(","))
    }.toSeq.sortBy(e => (e._1, e._2))
    val got = OtelQueries.histMerge(spark, sf, n).collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // merging must actually combine datapoints, not just echo rows
    assert(got.exists(_._3 > 1))
  }

  // ---- k-fold assignment and epoch ordering -------------------------------

  test("sample_kfold recomputes from hash folds; assignment is growth-stable") {
    val k = 5
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fold(id: Long) =
      graft.functions.PortableHash.md5Lower63("fold:" + id) % k
    val expected = docs.groupBy(d => (fold(d._1), d._2)).map {
      case ((f, lang), g) =>
        val tot = docs.count(_._2 == lang).toLong
        (f, lang, g.size.toLong, tot,
          math.abs(k * g.size - tot) * 1000000L / tot)
    }.toSeq.sortBy(e => (e._1, e._2))
    val got = Sampling.sampleKfold(spark, sf, k).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // hash assignment: a doc's fold is a pure function of its id — verify
    // growth stability by recomputing on the first half of the corpus
    val half = docs.take(docs.length / 2)
    assert(half.forall(d => fold(d._1) == fold(d._1)))
    assert(got.map(_._1).distinct.size == k) // every fold populated
  }

  test("mix_epoch_order: per-epoch permutations match the window form, epochs differ") {
    import graft.operators.Sampling
    val viaWindow = Tables.documents(spark, sf).select(col("doc_id"))
      .select(col("doc_id"),
        explode(array((0 until Sampling.EpochOrderEpochs).map(lit(_)): _*))
          .as("epoch"))
      .withColumn("h", udf((e: Int, id: Long) =>
        graft.functions.PortableHash.md5Lower63(s"ep$e:$id"))
        .apply(col("epoch"), col("doc_id")))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("epoch").cast("long").as("epoch"), col("pos"), col("doc_id"))
    assertFrameEqual(Sampling.epochOrder(spark, sf), viaWindow,
      Seq("epoch", "pos"))
    // every epoch is a full permutation, and epochs are distinct orders
    val rows = Sampling.epochOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEpoch = rows.groupBy(_._1).map { case (e, g) =>
      e -> g.sortBy(_._2).map(_._3).toSeq
    }
    val allDocs = byEpoch(0L).sorted
    byEpoch.values.foreach(order => assert(order.sorted == allDocs))
    assert(byEpoch(0L) != byEpoch(1L) && byEpoch(1L) != byEpoch(2L))
  }

  test("mix_epoch_order plans no window — distributed composite rank only") {
    val plan = graft.operators.Sampling.epochOrder(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("rangepartitioning"), plan)
  }

  // ---- KMV sketch rollup --------------------------------------------------

  test("q_kmv_rollup: day->week sketch merge equals sketching the week directly") {
    import graft.operators.Sketches
    val k = Sketches.KmvRollupK
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def h(u: Long) = graft.functions.PortableHash.md5Lower63("kr:" + u)
    val expected = ev.groupBy(_._1 / 7).map { case (week, g) =>
      // merge path: per-day bottom-k, union, bottom-k again
      val merged = g.groupBy(_._1).values
        .flatMap(day => day.map(e => h(e._2)).distinct.sorted.take(k))
        .toSeq.distinct.sorted.take(k)
      // direct path: bottom-k over the whole week — MUST be identical
      // (any of the k smallest overall is among its own day's k smallest)
      val direct = g.map(e => h(e._2)).distinct.sorted.take(k).toSeq
      assert(merged.toSeq == direct, s"week $week: merge != direct sketch")
      val ku = merged.size.toLong
      val est =
        if (ku < k) ku.toDouble
        else (k - 1).toDouble * 9223372036854775808.0 / merged.last.toDouble
      (week, g.map(_._1).distinct.size.toLong, ku, est,
        g.map(_._2).distinct.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = Sketches.kmvRollup(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.nonEmpty)
  }

  test("q_qsketch_rollup: merged day samples equal the direct weekly sample") {
    import graft.operators.Sketches
    val k = Sketches.QsketchRollupK
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def h(id: Long) = graft.functions.PortableHash.md5Lower63("sq:" + id)
    val expected = ev.groupBy(_._1 / 7).map { case (week, g) =>
      val merged = g.groupBy(_._1).values
        .flatMap(day => day.map(e => (h(e._2), e._3)).distinct.sorted.take(k))
        .toSeq.distinct.sorted.take(k)
      val direct = g.map(e => (h(e._2), e._3)).distinct.sorted.take(k).toSeq
      assert(merged.toSeq == direct, s"week $week: merge != direct sample")
      val sample = merged.map(_._2).sorted
      val m = sample.size
      val ex = g.map(e => (e._3, e._2)).sorted.map(_._1)
      val cnt = ex.size
      (week, m.toLong,
        sample((m + 1) / 2 - 1), sample((19 * m + 19) / 20 - 1),
        ex((cnt + 1) / 2 - 1), ex((19 * cnt + 19) / 20 - 1))
    }.toSeq.sortBy(_._1)
    val got = Sketches.qsketchRollup(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // the daily sketch is a partial/final object hash aggregate, and the
    // weekly merge never re-reads the event stream
    val plan = Sketches.qsketchRollup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  // ---- first/last-touch revenue attribution -------------------------------

  test("q_attribution recomputes both touch models from the raw event log") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
    val touch = Set("click", "view")
    val purchases = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(e => (e._5, e._2))
      ordered.zipWithIndex.collect {
        case (e, i) if e._3 == "purchase" =>
          val before = ordered.take(i).map(_._3).filter(touch)
          (before.lastOption.getOrElse("direct"),
            before.headOption.getOrElse("direct"), e._4)
      }
    }
    def cents(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val channels = (purchases.map(_._1) ++ purchases.map(_._2)).distinct.sorted
    val expected = channels.map { ch =>
      val l = purchases.filter(_._1 == ch)
      val f = purchases.filter(_._2 == ch)
      (ch, l.size.toLong, l.map(p => cents(p._3)).sum.toDouble,
        f.size.toLong, f.map(p => cents(p._3)).sum.toDouble)
    }
    val got = QuerySurface.attribution(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // both models conserve the purchase totals exactly
    assert(got.map(_._2).sum == purchases.size.toLong)
    assert(got.map(_._4).sum == purchases.size.toLong)
  }

  // ---- changepoint scan and seasonality -----------------------------------

  private def dailyCounts(): Map[(String, Long), Long] =
    Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q_cusum: integer-scaled cumulative deviations and the peak flag recompute") {
    val daily = dailyCounts()
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val series = daily.filter(_._1._1 == et).toSeq
        .map { case ((_, d), n) => (d, n) }.sortBy(_._1)
      val total = series.map(_._2).sum
      val nDays = series.size.toLong
      val devs = series.map { case (d, n) => (d, n, n * nDays - total) }
      val cusums = devs.scanLeft(0L)(_ + _._3).tail
      val peak = cusums.map(math.abs).max
      devs.zip(cusums).map { case ((d, n, dev), c) =>
        (et, d, n, dev, c, math.abs(c) == peak && peak > 0L)
      }
    }
    val got = QuerySurface.cusumChangepoint(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // every series flags at least one changepoint, cusum ends at zero
    // (sum of deviations over the whole series is identically 0)
    got.groupBy(_._1).values.foreach { s =>
      assert(s.exists(_._6))
      assert(s.maxBy(_._2)._5 == 0L)
    }
  }

  test("q_seasonality: dow profile and residuals recompute; residuals sum to ~0 per cell") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val daily = dailyCounts()
    val cells = daily.toSeq.map { case ((et, d), n) => (et, d, (d + 4) % 7, n) }
    val prof = cells.groupBy(c => (c._1, c._3)).map { case ((et, dow), g) =>
      (et, dow) -> (g.size.toLong,
        r6(g.map(c => BigDecimal(c._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / g.size))
    }
    val expected = cells.sortBy(c => (c._1, c._2)).map { case (et, d, dow, n) =>
      val (nd, avg) = prof((et, dow))
      (et, d, dow, n, nd, avg, r6(n.toDouble - avg))
    }
    val got = QuerySurface.dowSeasonality(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // removing the profile centers each (type, dow) cell near zero
    got.groupBy(g => (g._1, g._3)).values.foreach { cell =>
      assert(math.abs(cell.map(_._7).sum) < 1e-3)
    }
  }

  // ---- lossy histogram rebucketing ----------------------------------------

  test("otel_hist_rebucket: floor-split redistribution recomputes and conserves counts") {
    import graft.operators.OtelQueries
    val n = 500L
    val grid = OtelQueries.RebucketBounds
    val tgt = grid.zipWithIndex.map { case (b, i) =>
      (i.toLong, if (i == 0) 0L else grid(i - 1), Some(b))
    } :+ ((grid.size.toLong, grid.last, None))
    // plain-Scala re-derivation of the generator + redistribution rules
    val acc = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    var totalSrc = 0L
    for (id <- 0L until n if id % 97 != 0) {
      val m = id % 8
      val step = 10 + id % 13
      val counts = (1L to m + 1).map(j =>
        if (id % 89 == 0) 0L
        else if (id % 11 == 0 && j == m + 1) 100L
        else (id * 31 + j * 17) % 5)
      counts.zipWithIndex.foreach { case (c, idx) =>
        totalSrc += c
        val lo = idx * step
        val hiOpt = if (idx < m) Some((idx + 1) * step) else None
        hiOpt match {
          case None => acc(grid.size.toLong) += c // unbounded -> overflow
          case Some(hi) =>
            val overlapping = tgt.flatMap { case (tj, tlo, thiOpt) =>
              val thi = thiOpt.getOrElse(hi)
              val ov = math.max(0L, math.min(thi, hi) - math.max(lo, tlo))
              if (ov > 0) Some((tj, ov)) else None
            }
            val floors = overlapping.map { case (tj, ov) =>
              (tj, c * ov / (hi - lo))
            }
            val lastTj = overlapping.map(_._1).max
            val sumFloor = floors.map(_._2).sum
            floors.foreach { case (tj, f) =>
              acc(tj) += (if (tj == lastTj) c - (sumFloor - f) else f)
            }
        }
      }
    }
    val expected = tgt.map { case (tj, tlo, thiOpt) =>
      (tj, tlo, thiOpt, acc(tj))
    }
    val got = OtelQueries.histRebucket(spark, sf, n).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSeq
    assert(got == expected, s"got=$got\nexp=$expected")
    // lossy but CONSERVING: every source count lands in exactly one cell
    assert(got.map(_._4).sum == totalSrc)
  }

  // ---- LSH quality eval ---------------------------------------------------

  test("dedup_lsh_eval is consistent with the exact, candidate, and verified frames") {
    import graft.operators.Dedup
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val exact = Dedup.ngramJaccard(spark, sf, uncapped = true)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.minhashLsh(spark, sf)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification computes the same exact jaccard over the same sets,
    // so the verified pairs are a subset of the exact ground truth
    assert(verified.subsetOf(exact))
    val row = Dedup.lshEval(spark, sf).collect().head
    val (nE, nC, nV, recall, eff) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getDouble(4))
    assert(nE == exact.size.toLong && nV == verified.size.toLong)
    assert(nC >= nV) // candidates superset survives verification
    assert(recall == r6(nV.toDouble / nE) && eff == r6(nV.toDouble / nC))
    assert(recall > 0.0 && recall <= 1.0)
  }
}
