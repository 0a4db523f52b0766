package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.{Dedup, Graph, Multimodal, OtelQueries, Tables, TextAnalysis}
import graft.streaming.StreamGate

/** Round-9 coverage: the derive-once bipartite edge table behind the
  * table-fed walk gates (q_pagerank_tbl / q_ppr_tbl) — value parity with
  * the self-contained forms, memo identity, and symmetry of the stored
  * edge list. */
class Round9OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pageRankFromTable is cell-identical to the self-contained pageRank") {
    assertFrameEqual(
      Graph.pageRankFromTable(spark, sf),
      Graph.pageRank(spark, sf),
      Seq("rank_fp", "id"))
  }

  test("personalizedPageRankFromTable matches personalizedPageRank cell-by-cell") {
    assertFrameEqual(
      Graph.personalizedPageRankFromTable(spark, sf),
      Graph.personalizedPageRank(spark, sf),
      Seq("rank_fp", "id"))
  }

  test("bipartiteTable memoizes one directory per corpus and stores the " +
      "exact symmetrized multigraph") {
    val d1 = Graph.bipartiteTable(spark, sf)
    val d2 = Graph.bipartiteTable(spark, sf)
    assert(d1 == d2, "memo must return the same directory per (JVM, corpus)")
    val stored = spark.read.parquet(d1)
    val derived = Graph.bipartiteEdges(spark, sf)
    // multigraph: compare as (src, dst) multiplicity maps, not sets
    assertFrameEqual(
      stored.groupBy("src", "dst").agg(count(lit(1)).as("m")),
      derived.groupBy("src", "dst").agg(count(lit(1)).as("m")),
      Seq("src", "dst"))
    // symmetry: every (a, b) multiplicity equals its (b, a) mirror
    val asym = stored.groupBy("src", "dst").agg(count(lit(1)).as("m"))
      .as("f")
      .join(
        stored.groupBy(col("dst").as("s2"), col("src").as("d2"))
          .agg(count(lit(1)).as("m2")).as("r"),
        col("f.src") === col("s2") && col("f.dst") === col("d2"),
        "full")
      .filter(col("m").isNull || col("m2").isNull || col("m") =!= col("m2"))
      .count()
    assert(asym == 0L, "stored edge list must be exactly symmetric")
  }

  test("md5Lower63Col property: 300 seeded-random unicode strings match " +
      "the Scala digest bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // Whole code points, not chars: indexing a String char-wise can split the
    // emoji's surrogate pair and produce invalid UTF-16 that UTF-8 can't round-trip.
    val alphabet = Seq("a", "b", "z", "0", "9", " ", ".", ":", "/", "-", "_",
      "é", "中", "文", "😀", "\n", "\t")
    val samples = (1 to 300).map { _ =>
      val len = rnd.nextInt(120)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val got = samples.toDF("s")
      .withColumn("h", PortableHash.md5Lower63Col(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == PortableHash.md5Lower63(s), s"md5Lower63Col(${s.take(30)})")
    }
  }

  test("md5Lower63Col (builtin composition) equals the Scala md5Lower63 " +
      "on varied strings including multi-byte UTF-8") {
    import spark.implicits._
    val samples = Seq("", "abc", "wsample:42", "bal:7", "ep2:1234",
      "the quick brown fox", "héllo 中文", "lshs:999999",
      "a" * 300, "\ttabs and\nnewlines", "0", "-17")
    val df = samples.toDF("s")
      .withColumn("colHash", PortableHash.md5Lower63Col(col("s")))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(df(s) == PortableHash.md5Lower63(s), s"md5Lower63Col($s)")
    }
  }

  test("lshEvalSampled: probe covers the whole tiny corpus and agrees with " +
      "the uncapped eval's counting rules") {
    // with a probe larger than the corpus the fixed-K sample degenerates
    // to the full corpus, so the sampled eval must agree with the
    // uncapped instrument's exact/verified counts exactly.
    val nDocs = operators.Tables.documents(spark, sf).count()
    val probeK = (nDocs + 1).toInt
    val sampled = Dedup.lshEvalSampled(spark, sf, sampleK = probeK).collect()(0)
    val full = Dedup.lshEval(spark, sf).collect()(0)
    assert(sampled.getAs[Long]("n_docs") == nDocs)
    assert(sampled.getAs[Long]("n_exact") == full.getAs[Long]("n_exact"))
    assert(sampled.getAs[Long]("n_candidates") == full.getAs[Long]("n_candidates"))
    assert(sampled.getAs[Long]("n_verified") == full.getAs[Long]("n_verified"))
    // structural sanity that holds at every scale
    assert(sampled.getAs[Long]("n_verified") <= sampled.getAs[Long]("n_exact"))
    assert(sampled.getAs[Long]("n_verified") <= sampled.getAs[Long]("n_candidates"))
  }

  test("histRebucket raises loudly on fractional or non-positive first " +
      "bounds instead of silently dropping counts") {
    import spark.implicits._
    def frame(bounds: Seq[Double]) =
      Seq((1L, bounds, Seq(3L, 4L)))
        .toDF("hist_id", "ExplicitBounds", "BucketCounts")
    Seq(Seq(2.5, 5.0), Seq(0.0, 10.0), Seq(-10.0, 0.0)).foreach { bad =>
      val e = intercept[Exception] {
        OtelQueries.histRebucketOf(frame(bad)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("positive integer")),
        s"bounds $bad: ${msgs(e)}")
    }
    // valid integer layout and layout-less rows still conserve counts
    val ok = Seq(
      (1L, Seq(10.0, 20.0), Seq(3L, 4L, 5L)),
      (2L, Seq.empty[Double], Seq(7L)))
      .toDF("hist_id", "ExplicitBounds", "BucketCounts")
    val out = OtelQueries.histRebucketOf(ok).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 3L + 4L + 5L + 7L)
  }

  test("stream_red/stream_hist: the elided-flush update-mode drain is " +
      "row-identical to the append+watermark form") {
    def run(elide: Boolean): (Seq[String], Seq[String]) = (
      StreamGate.redWindows(spark, sf, elide = Some(elide))
        .collect().map(_.toString).toSeq.sorted,
      StreamGate.histWindows(spark, sf, elide = Some(elide))
        .collect().map(_.toString).toSeq.sorted)
    val (redE, histE) = run(elide = true)
    val (redA, histA) = run(elide = false)
    assert(redE.nonEmpty && redE == redA, "stream_red parity")
    assert(histE.nonEmpty && histE == histA, "stream_hist parity")
  }

  test("mm_png_near_dup runs the REAL decode (no stub fallback) and finds " +
      "every variant pair at hamming <= 2") {
    // the PNG path must actually decode: the image dHash of a generated
    // payload differs from the byte-stub hash of the same bytes
    val payload = Multimodal.pngBytes(7L, variant = false)
    assert(Multimodal.dhashImage(payload) != Multimodal.dhashStub(payload))
    // a corrupted payload falls back to the stub (mixed-corpus behavior)
    val broken = payload.take(20)
    assert(Multimodal.dhashImage(broken) == Multimodal.dhashStub(broken))
    val pairs = Multimodal.pngNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Long]("hamming")))
    val variantPairs = pairs.filter { case (a, b, _) => b - a == 1000000L }
    assert(variantPairs.length == (Multimodal.PngCorpusN / 5).toInt,
      s"expected every 5th base image's variant pair, got ${variantPairs.length}")
    assert(variantPairs.forall(_._3 <= 2L),
      "variant edits must stay within 2 flipped gradient bits")
  }

  test("native MinhashSigExpr equals the plain-array kernel and survives " +
      "codegen (signature of every corpus doc)") {
    import graft.operators.Dedup
    val viaExpr = Dedup.docShingleHashes(spark, sf)
      .select(col("doc_id"),
        graft.functions.MinhashExpressions.minhashSig(col("shh")).as("sig"),
        col("shh"))
      .collect()
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { r =>
      val hs = r.getAs[scala.collection.Seq[Long]]("shh").toArray
      val want = graft.functions.MinhashSig.computeArray(hs).toSeq
      assert(r.getAs[scala.collection.Seq[Long]]("sig").toSeq == want,
        s"doc ${r.getLong(0)}")
    }
  }

  test("stream_burn: streamed hour cells + batch block projection match a " +
      "full batch recompute under the closed-hours rule") {
    val HourUs = 3600000000L
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) AS us", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1) >= 250.0))
    val wmMs = rows.map(_._1).max / 1000L - StreamGate.WindowDelayMs
    val byHour = rows.groupBy(_._1 / HourUs * HourUs).view
      .mapValues(xs => (xs.length.toLong, xs.count(_._2).toLong)).toMap
    val closed = byHour.filter { case (h, _) => (h + HourUs) / 1000L <= wmMs }
    val byBlock = closed.groupBy(_._1 / (6 * HourUs) * (6 * HourUs)).view
      .mapValues { hs =>
        val n = hs.values.map(_._1).sum; val e = hs.values.map(_._2).sum
        e * 1000000L / n
      }.toMap
    val out = StreamGate.burnWindows(spark, sf).collect()
    assert(out.length == closed.size && out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Long]("hour_us")
      val (n, e) = closed(h)
      assert(r.getAs[Long]("n_1h") == n && r.getAs[Long]("err_1h") == e)
      assert(r.getAs[Long]("err_ppm_1h") == e * 1000000L / n)
      assert(r.getAs[Long]("err_ppm_6h") ==
        byBlock(h / (6 * HourUs) * (6 * HourUs)))
    }
  }

  test("Ranks.prefixSum equals the empty-key running-sum window across " +
      "partition counts (incl. near-empty ranges)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = (1 to 97).map(i => ((i * 37) % 101, (i % 7).toLong))
    val df = rows.toDF("k", "v")
    val viaWindow = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    for (parts <- Seq(1, 4, 16, 64)) {
      val got = operators.Ranks.prefixSum(df, "v", "cum", Seq(col("k")), parts)
        .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
      assert(got == viaWindow, s"parts=$parts")
    }
  }

  test("text_vocab_growth plans no empty-key window (distributed prefix sum)") {
    val plan = TextAnalysis.vocabGrowth(spark, sf)
      .queryExecution.executedPlan.toString
    // the prefix-sum's running window is keyed by the range-partition
    // ordinal — an unpartitioned windowspecdefinition would print with an
    // empty partition clause "windowspecdefinition(bucket..."; assert the
    // partitioned form instead
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("windowspecdefinition(vocab"), plan)
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, "prefix sum should still use a partitioned window")
    assert(plan.split("\n").filter(_.contains("Window "))
      .forall(_.contains("__p_part")), plan)
  }

  test("otel_burn_rate recomputes from raw events (integer ppm, block join)") {
    val HourUs = 3600000000L
    val raw = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) AS us", "value").collect()
      .map(r => (r.getLong(0) / HourUs * HourUs, r.getDouble(1) >= 250.0))
    val byHour = raw.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.count(_._2).toLong)
    }.toMap
    val byBlock = raw.groupBy(t => t._1 / (6 * HourUs) * (6 * HourUs)).view
      .mapValues(xs => xs.count(_._2).toLong * 1000000L / xs.length).toMap
    val out = OtelQueries.burnRate(spark, sf).collect()
    assert(out.length == byHour.size)
    out.foreach { r =>
      val h = r.getAs[Long]("hour_us")
      val (n, e) = byHour(h)
      assert(r.getAs[Long]("n_1h") == n && r.getAs[Long]("err_1h") == e)
      val ppm1 = e * 1000000L / n
      val ppm6 = byBlock(h / (6 * HourUs) * (6 * HourUs))
      assert(r.getAs[Long]("err_ppm_1h") == ppm1)
      assert(r.getAs[Long]("err_ppm_6h") == ppm6)
      assert(r.getAs[Boolean]("alert") == (ppm1 > 20000L && ppm6 > 20000L))
    }
  }

  test("text_chunk_delta: full plain-Scala recompute of the status census") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def chunks(id: Long, text: String): Map[Long, Long] = {
      val w = text.split(" ", -1)
      (0 until w.length by operators.TextAnalysis.ChunkStride).map { start =>
        (start / operators.TextAnalysis.ChunkStride).toLong ->
          PortableHash.md5Lower63(
            w.slice(start, start + operators.TextAnalysis.ChunkTokens)
              .mkString(" "))
      }.toMap
    }
    val oldC = docs.map { case (id, t) => id -> chunks(id, t) }.toMap
    val newC = docs.filter(_._1 % 7 != 0).map { case (id, t) =>
      id -> chunks(id, if (id % 5 == 0) t + " zzedit" else t)
    }.toMap
    val statuses = scala.collection.mutable.Map[String, (Long, Set[Long])]()
      .withDefaultValue((0L, Set.empty))
    for (d <- oldC.keySet ++ newC.keySet;
         idx <- oldC.getOrElse(d, Map.empty).keySet ++
           newC.getOrElse(d, Map.empty).keySet) {
      val (o, n2) = (oldC.getOrElse(d, Map.empty).get(idx),
        newC.getOrElse(d, Map.empty).get(idx))
      val st = (o, n2) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) if a != b => "changed"
        case _ => "unchanged"
      }
      val (c, ds) = statuses(st)
      statuses(st) = (c + 1, ds + d)
    }
    val got = operators.TextAnalysis.chunkDelta(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == statuses.map { case (k, (c, ds)) =>
      k -> (c, ds.size.toLong) }.toMap)
  }

  test("sim_centroid_drift: exact-decimal recompute of one label's drift") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("v").toArray))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def exactAvg(xs: Seq[Double]): Double = {
      val s = xs.map(x => new JBD(java.lang.Double.toString(x))
        .setScale(6, RoundingMode.HALF_UP)).reduce(_ add _)
      r6(s.doubleValue() / xs.length)
    }
    val out = operators.Similarity.centroidDrift(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val label = rows.head._2
    val mine = rows.filter(_._2 == label)
    val (old, neu) = mine.partition(_._1 % 2 == 0)
    val dims = mine.head._3.length
    val s2 = (0 until dims).map { i =>
      val d = new JBD(java.lang.Double.toString(
        exactAvg(neu.map(_._3(i)).toSeq) - exactAvg(old.map(_._3(i)).toSeq)))
        .setScale(9, RoundingMode.HALF_UP)
      d.multiply(d)
    }.reduce(_ add _)
    val want = r6(math.sqrt(s2.doubleValue()))
    val (nOld, nNew, drift) = out(label)
    assert(nOld == old.length && nNew == neu.length)
    assert(drift == want, s"label $label: $drift vs $want")
  }

  test("text_chunking: full plain-Scala recompute (stride grid, tail " +
      "chunks kept, md5 chunk identity)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      (0 until w.length by TextAnalysis.ChunkStride).map { start =>
        val chunk = w.slice(start, start + TextAnalysis.ChunkTokens)
        (id, (start / TextAnalysis.ChunkStride).toLong, start.toLong,
          chunk.length.toLong, PortableHash.md5Lower63(chunk.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.chunking(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.length == expected.length,
      s"${got.length} chunks vs ${expected.length}")
    assert(got == expected.toSeq)
  }
}
