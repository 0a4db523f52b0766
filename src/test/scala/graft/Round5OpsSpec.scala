package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Graph, Multimodal, Mutations, QuerySurface, Sketches, Tables, TextAnalysis}

/** Round-5 operator semantics: salted aggregation identity, profiling mode
  * rule, PII scrub, CDC apply, and the z-order layout (key correctness +
  * measured file skipping on both dimensions). */
class Round5OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("saltedAgg: two-level salted aggregate equals the direct groupBy") {
    val salted = Sketches.saltedAgg(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(28,4)")), 2).cast("double").as("sum_value"))
      .orderBy(col("user_id"))
    assertFrameEqual(salted, direct, Seq("user_id"))
  }

  test("groupProfile: mode is the max-count user with lowest-id tie-break") {
    val prof = Sketches.groupProfile(spark, sf).collect()
    val byTypeUser = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getString(0))
    prof.foreach { r =>
      val t = r.getAs[String]("event_type")
      val counts = byTypeUser(t).map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("n"))
      val want = counts.minBy { case (u, n) => (-n, u) }
      assert((r.getAs[Long]("top_user"), r.getAs[Long]("top_user_n")) == want,
        s"mode mismatch for $t")
      assert(r.getAs[Long]("n") == counts.map(_._2).sum)
    }
  }

  test("piiScrub: counts found PII, redacts it all, and is idempotent") {
    val out = TextAnalysis.piiScrub(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // injection plants exactly one of each per doc
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") == 1L)
      assert(r.getAs[Long]("n_ipv4") == 1L)
      assert(r.getAs[Long]("n_phone") == 1L)
      val s = r.getAs[String]("scrubbed")
      assert(s.contains("<EMAIL>") && s.contains("<IP>") && s.contains("<PHONE>"))
    }
    // a second scrub over the scrubbed text finds nothing and changes nothing
    val (e2, i2, p2, s2) = TextAnalysis.piiScrubCols(col("scrubbed"))
    val second = out.select(col("scrubbed"), e2.as("e"), i2.as("i"), p2.as("p"),
      s2.as("again")).collect()
    second.foreach { r =>
      assert(r.getAs[Long]("e") == 0L && r.getAs[Long]("i") == 0L &&
        r.getAs[Long]("p") == 0L)
      assert(r.getAs[String]("again") == r.getAs[String]("scrubbed"))
    }
  }

  test("cdcApply: deletes erased, updates applied, inserts present, rest untouched") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val snap = Mutations.cdcApply(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("o_totalprice"), r.getAs[String]("op"))).toMap

    base.foreach { case (k, p) =>
      (k % 10) match {
        case 0 => assert(snap(k) == (p + 1000.0, "U"), s"update missing for $k")
        case 1 => assert(!snap.contains(k), s"delete not applied for $k")
        case 2 =>
          assert(snap(k) == (p, "B"), s"insert source row must survive for $k")
          assert(snap(k + 100000000L) == (p * 2.0, "I"), s"insert missing for $k")
        case _ => assert(snap(k) == (p, "B"), s"untouched row changed for $k")
      }
    }
    val expectedRows = base.size - base.count(_._1 % 10 == 1) +
      base.count(_._1 % 10 == 2)
    assert(snap.size == expectedRows)
  }

  test("zOrderKey: interleaves bits exactly") {
    val df = spark.range(1)
      .select(
        Bucketing.zOrderKey(lit(0xFFFFL), lit(0L)).as("a"),
        Bucketing.zOrderKey(lit(0L), lit(0xFFFFL)).as("b"),
        Bucketing.zOrderKey(lit(1L), lit(1L)).as("c"),
        Bucketing.zOrderKey(lit(0xFFFFL), lit(0xFFFFL)).as("d"),
        Bucketing.zOrderKey(lit(5L), lit(3L)).as("e"))
      .collect().head
    assert(df.getLong(0) == 0xAAAAAAAAL) // a-bits at odd positions
    assert(df.getLong(1) == 0x55555555L) // b-bits at even positions
    assert(df.getLong(2) == 3L)
    assert(df.getLong(3) == 0xFFFFFFFFL)
    // a=101b → positions 1,5 → 0b100010 = 34; b=011b → positions 0,2 → 5
    assert(df.getLong(4) == (34L | 5L))
  }

  test("pageRank: matches an exact driver-side fixed-point reference") {
    val got = Graph.pageRank(spark, sf, iterations = 3, topK = 1000).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_fp")).toMap

    // reference implementation: same integer fixed-point rules, plain maps
    val e = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e ++ e.map { case (s, d) => (d, s) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val scale = 1000000000000L
    var r = deg.keys.map(_ -> scale).toMap
    (1 to 3).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => contrib(d) += r(s) / deg(s) }
      r = r.keys.map(k => k -> (15L * scale / 100L + contrib(k) * 85L / 100L)).toMap
    }
    assert(got.size == r.size)
    r.foreach { case (k, v) =>
      assert(got(k) == v, s"rank mismatch at node $k: spark=${got(k)} ref=$v")
    }
  }

  test("skyline: salted two-phase frontier equals brute-force dominance") {
    val pts = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(floor(sum(col("value").cast("decimal(28,4)")) * 100).cast("long").as("b"),
        count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.filter { case (_, b, c) =>
      !pts.exists { case (_, b2, c2) =>
        (b2 > b && c2 <= c) || (b2 >= b && c2 < c)
      }
    }.map(_._1).toSet
    val got = QuerySurface.skyline(spark, sf).collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(got == want, s"frontier mismatch: got $got want $want")
    // decomposition identity: frontier is salt-count independent
    val perUser = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(floor(sum(col("value").cast("decimal(28,4)")) * 100).cast("long").as("total_cents"),
        count(lit(1)).as("n_events"))
    val oneSalt = QuerySurface.skyline2D(perUser, "user_id", "total_cents", "n_events",
      salts = 1).collect().map(_.getAs[Long]("user_id")).toSet
    assert(oneSalt == want)
  }

  test("kmvOverlap: estimator contract — bounds per pair, unbiased in aggregate") {
    val rows = Sketches.kmvOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, est) = (r.getAs[Double]("est_jaccard"), r.getAs[Double]("est_overlap"))
      assert(j >= 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(est >= 0.0)
    }
    // per-pair intersections here are small (jaccard·k ≈ 5 union-sketch
    // samples → large per-pair variance, inherent to KMV at k=256), but the
    // estimator is unbiased: over all 190 pairs the errors must cancel
    val sumEst = rows.map(_.getAs[Double]("est_overlap")).sum
    val sumExact = rows.map(_.getAs[Long]("n_exact_overlap")).sum.toDouble
    assert(sumExact > 0)
    val relErr = math.abs(sumEst - sumExact) / sumExact
    assert(relErr < 0.35,
      s"aggregate overlap estimate off by ${relErr * 100}%: est=$sumEst exact=$sumExact")
  }

  test("lmScore: matches an exact driver-side fixed-point recompute") {
    val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bigrams = texts.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      w.indices.dropRight(1).map(i => (id, w(i), w(i + 1)))
    }
    val cBi = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.length.toLong).toMap
    val cPre = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = bigrams.groupBy(_._1).view.mapValues { bs =>
      val ps = bs.map(b => cBi((b._2, b._3)) * 1000000L / cPre(b._2))
      (bs.length.toLong, ps.sum / bs.length, ps.min)
    }.toMap
    val got = TextAnalysis.lmScore(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, avg, mn) = want(id)
      assert(r.getAs[Long]("n_bigrams") == n, s"n_bigrams mismatch doc $id")
      assert(r.getAs[Long]("avg_p_fp") == avg, s"avg mismatch doc $id")
      assert(r.getAs[Long]("min_p_fp") == mn, s"min mismatch doc $id")
    }
  }

  test("funnel: stage counts match brute force and are monotone") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def stageMin(tp: String, after: Map[Long, Long]): Map[Long, Long] =
      byUser.flatMap { case (u, rows) =>
        val gate = after.get(u)
        if (after.nonEmpty && gate.isEmpty) None
        else {
          val ts = rows.filter(r => r._2 == tp && gate.forall(r._3 >= _)).map(_._3)
          if (ts.isEmpty) None else Some(u -> ts.min)
        }
      }
    val s1 = stageMin("signup", Map.empty)
    val s2 = stageMin("click", s1)
    val s3 = stageMin("purchase", s2)
    val r = QuerySurface.funnel(spark, sf).collect().head
    assert(r.getAs[Long]("n_signup") == s1.size)
    assert(r.getAs[Long]("n_click_after") == s2.size)
    assert(r.getAs[Long]("n_purchase_after") == s3.size)
    assert(s1.size >= s2.size && s2.size >= s3.size)
  }

  test("retention: cohort matrix matches brute force") {
    val weekUs = 7L * 86400L * 1000000L
    val act = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / weekUs)).distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = act.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .view.mapValues(_.length.toLong).toMap
    val got = QuerySurface.retention(spark, sf).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == want)
    // offset-0 cell counts the whole cohort by construction
    got.keys.map(_._1).foreach { cw =>
      assert(got((cw, 0L)) == cohort.count(_._2 == cw))
    }
  }

  test("nearDupMedia: every planted variant is recalled against its original") {
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 52)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    val pairs = Multimodal.nearDupMedia(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Long]("hamming")))
    planted.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000000L)
      assert(hit.isDefined, s"variant of $id not recalled")
      assert(hit.get._3 <= 2, s"variant pair of $id at hamming ${hit.get._3}")
    }
  }

  test("joinCardProbe: prediction equals the real join's row count") {
    val r = Sketches.joinCardProbe(spark, sf).collect().head
    val real = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(r.getAs[Long]("predicted_join_rows") == real)
    assert(r.getAs[Long]("max_key_fanout") >= 1L)
    assert(r.getAs[Long]("n_join_keys") >= 1L)
  }

  test("equiDepth: boundaries are the exact order statistics") {
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val got = Sketches.equiDepth(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      val i = r.getAs[Long]("bucket_idx")
      val idx = ((i * vs.length + 7) / 8).toInt // ceil(i*n/8), 1-based
      assert(r.getAs[Double]("boundary") == vs(idx - 1),
        s"boundary $i of ${r.getAs[String]("event_type")} mismatch")
    }
    // 7 boundaries per group, non-decreasing
    got.groupBy(_.getAs[String]("event_type")).values.foreach { rows =>
      assert(rows.length == 7)
      val bs = rows.sortBy(_.getAs[Long]("bucket_idx")).map(_.getAs[Double]("boundary"))
      assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("zOrderKeysRanked: range-ids spread the full budget and are deterministic") {
    val rows = Bucketing.zOrderKeysRanked(spark, sf, limit = Int.MaxValue).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("bu") >= 0 && r.getAs[Long]("bu") <= 255)
      assert(r.getAs[Long]("bv") >= 0 && r.getAs[Long]("bv") <= 255)
    }
    // rank normalization spreads ids across the budget even though the raw
    // user_id range is tiny (0..14 at sf0.001) — min-max would too, but
    // ranks also survive outlier-skewed columns; here assert the spread
    val bus = rows.map(_.getAs[Long]("bu")).distinct
    assert(bus.min < 64 && bus.max > 192, s"bu not spread: ${bus.sorted.toList}")
    // pure function of the row set: a second run is identical
    val again = Bucketing.zOrderKeysRanked(spark, sf, limit = Int.MaxValue).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("outlierFences: quartiles and counts match brute force") {
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val got = Sketches.outlierFences(spark, sf).collect()
    assert(got.length == byType.size)
    got.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      val n = vs.length
      val q1 = vs((n + 3) / 4 - 1)
      val q3 = vs((3 * n + 3) / 4 - 1)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("q1") == q1 && r.getAs[Double]("q3") == q3)
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(r.getAs[Long]("n_low") == vs.count(_ < lo))
      assert(r.getAs[Long]("n_high") == vs.count(_ > hi))
    }
  }

  test("scd2: intervals tile each user's timeline without gaps or overlaps") {
    val rows = QuerySurface.scd2(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("valid_from_us"),
        Option(r.get(r.fieldIndex("valid_to_us")).asInstanceOf[java.lang.Long])))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { iv =>
      val sorted = iv.sortBy(_._3)
      // each interval's end is the next interval's start; one open tail
      sorted.sliding(2).foreach {
        case Array((_, t1, _, to1), (_, t2, from2, _)) =>
          assert(to1.contains(from2), "gap or overlap in validity chain")
          assert(t1 != t2, "consecutive identical states must collapse")
        case _ =>
      }
      assert(sorted.last._4.isEmpty, "last state must be open-ended")
      assert(sorted.init.forall(_._4.isDefined))
    }
  }

  test("triangles: census matches a driver-side brute force") {
    val cs = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupPair = cs.groupBy(_._1).values.flatMap { sup =>
      val ss = sup.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val edges = bySupPair.toSeq
      .sortBy { case ((s1, s2), n) => (-n, s1, s2) }
      .take(5000).map(_._1).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(v => v -> edges.count(e => e._1 == v || e._2 == v)).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val edgeSeq = edges.toSeq
    val triangles = (for {
      (a, b) <- edgeSeq; (b2, c) <- edgeSeq
      if b2 == b && edges.contains((a, c))
    } yield (a, b, c)).size
    val r = graft.operators.Graph.triangles(spark, sf).collect().head
    assert(r.getAs[Long]("n_nodes") == nodes.size)
    assert(r.getAs[Long]("n_edges") == edges.size)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == triangles)

    // sf0.001 has fewer than 5000 edges, so exercise the top-k CUT with a
    // binding limit: the boundary must follow the (weight, src, dst) order
    val k = 10
    val topEdges = bySupPair.toSeq
      .sortBy { case ((s1, s2), n) => (-n, s1, s2) }
      .take(k).map(_._1).toSet
    val topSeq = topEdges.toSeq
    val topTriangles = (for {
      (a, b) <- topSeq; (b2, c) <- topSeq
      if b2 == b && topEdges.contains((a, c))
    } yield (a, b, c)).size
    val rk = graft.operators.Graph.triangles(spark, sf, topEdges = k)
      .collect().head
    assert(rk.getAs[Long]("n_edges") == topEdges.size)
    assert(rk.getAs[Long]("n_triangles") == topTriangles,
      s"binding-cut census mismatch at k=$k")
  }

  test("stream upsert: snapshot is batch-count independent") {
    import org.apache.spark.sql.streaming.Trigger
    // split events into 4 files so maxFilesPerTrigger=1 forces 4 batches
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-upsert-multi").toString + "/events"
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    ev.repartition(4).write.parquet(srcDir)
    val snapDir = java.nio.file.Files
      .createTempDirectory("graft-upsert-multi").toString + "/snap"
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch(graft.streaming.StreamGate.mergeBatchInto(snapDir) _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(snapDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("event_id"), r.getAs[Long]("ts_us"))).toMap
    // latest event per user by (ts, id), computed directly
    val want = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.maxBy(e => (e._3, e._2))).toMap
    assert(got.size == want.size)
    want.foreach { case (u, (_, id, ts)) =>
      assert(got(u) == (id, ts), s"user $u snapshot mismatch after 4 batches")
    }
  }

  test("z-ordered layout: file-level min/max skip on BOTH dimensions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString + "/events_z"
    Bucketing.writeEventsZOrdered(spark, sf, dir, files = 8)

    val files = spark.read.parquet(dir).inputFiles.sorted
    assert(files.length >= 6, s"expected ~8 files, got ${files.length}")
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id")),
          min(col("value")), max(col("value"))).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    val ev = Tables.events(spark, sf)
      .agg(min(col("user_id")), max(col("user_id")),
        min(col("value")), max(col("value"))).collect().head
    val (uMin, uMax) = (ev.getLong(0), ev.getLong(1))
    val (vMin, vMax) = (ev.getDouble(2), ev.getDouble(3))

    // predicates covering the TOP quarter of each axis: a z-ordered layout
    // must leave some files' min/max ranges entirely outside (the top end
    // discriminates because z-curve file boundaries are high-bit-major)
    val uCut = uMax - (uMax - uMin) / 4
    val vCut = vMax - (vMax - vMin) / 4
    val uOverlap = stats.count { case (_, hi, _, _) => hi >= uCut }
    val vOverlap = stats.count { case (_, _, _, hi) => hi >= vCut }
    assert(uOverlap < files.length,
      s"user-axis predicate should skip files: $uOverlap of ${files.length} overlap\n${stats.mkString("\n")}")
    assert(vOverlap < files.length,
      s"value-axis predicate should skip files: $vOverlap of ${files.length} overlap\n${stats.mkString("\n")}")
    // and the layout is lossless
    assert(spark.read.parquet(dir).count() == Tables.events(spark, sf).count())
  }
}
