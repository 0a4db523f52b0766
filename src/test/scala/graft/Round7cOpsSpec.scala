package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.{Bucketing, Dedup, Graph, Mutations, QuerySurface, Sampling, Similarity, Tables, TextAnalysis}

/** Round-7 third-batch operators: k-core peel, rolling z-score anomalies,
  * event-path mining, duplicated-span coverage, per-group reservoir sample.
  * Same contract as [[Round7bOpsSpec]]: every test recomputes the expected
  * result from the raw tables with independent Scala code and compares
  * exactly. */
class Round7cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("kcore: peel cascades on a chain-plus-triangle graph and reaches fixpoint") {
    import spark.implicits._
    // chain 1-2-3-4-5 feeding triangle {5,6,7}: a k=2 peel removes the
    // chain one node PER ROUND (each removal exposes the next), then stops
    // at the triangle — the cascade is what distinguishes k-core from a
    // one-shot degree filter
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (5L, 7L), (6L, 7L)).toDF("src", "dst")
    val got = Graph.peelProfile(spark, edges, k = 2, rounds = 8)
      .collect().map(r => (r.getAs[Int]("round"),
        r.getAs[Long]("nodes_remaining"), r.getAs[Long]("edges_remaining")))
      .sortBy(_._1)
    val expected = Seq((0, 7L, 7L), (1, 6L, 6L), (2, 5L, 5L), (3, 4L, 4L),
      (4, 3L, 3L), (5, 3L, 3L), (6, 3L, 3L), (7, 3L, 3L), (8, 3L, 3L))
    assert(got.toSeq == expected)
  }

  test("kcore: the gate's pinned round count reaches the fixpoint on gate data") {
    val profile = Graph.kcore(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"),
        r.getAs[Long]("nodes_remaining"), r.getAs[Long]("edges_remaining")))
      .sortBy(_._1)
    // last two rounds equal ⇒ the peel converged inside the unrolled count,
    // so the fixed-round oracle contract hides no divergence
    assert(profile(Graph.KcoreRounds)._2 == profile(Graph.KcoreRounds - 1)._2)
    assert(profile(Graph.KcoreRounds)._3 == profile(Graph.KcoreRounds - 1)._3)
  }

  test("anomaly: flagged rows match a from-scratch fixed-point z-test") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("us"),
        r.getAs[Long]("user_id"), r.getAs[Double]("value")))
    val expected = ev.groupBy(_._3).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      sorted.indices.flatMap { i =>
        val win = sorted.slice(math.max(0, i - QuerySurface.AnomalyWindow), i)
        val n = BigInt(win.length)
        if (win.length < QuerySurface.AnomalyMinPrev) None
        else {
          val v = BigInt(math.floor(sorted(i)._4 * 1000000).toLong)
          val s = win.map(r => BigInt(math.floor(r._4 * 1000000).toLong)).sum
          val q = win.map { r =>
            val f = BigInt(math.floor(r._4 * 1000000).toLong); f * f
          }.sum
          val dev = n * v - s
          if (dev * dev > BigInt(QuerySurface.AnomalyZ) * QuerySurface.AnomalyZ *
              (n * q - s * s))
            Some(sorted(i)._1)
          else None
        }
      }
    }.toSet
    val got = QuerySurface.anomalyZscore(spark, sf).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the corpus produces flags at this sf
  }

  test("event paths: top trigrams match a from-scratch sliding-window count") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type")))
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._3, r._2)).map(_._4).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).map { case (p, occ) => (p, occ.length.toLong) }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(QuerySurface.PathTopK)
    val got = QuerySurface.eventPaths(spark, sf).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    assert(got == expected)
  }

  test("span coverage: interval-union token counts match a brute-force recompute") {
    val P = 8
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").split(" ")))
    val grams = docs.flatMap { case (id, t) =>
      (0 to t.length - P).map(i =>
        (id, i, PortableHash.md5Lower63(t.slice(i, i + P).mkString(" "))))
    }
    val dupHashes = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = docs.map { case (id, t) =>
      val pos = grams.filter(g => g._1 == id && dupHashes(g._3)).map(_._2).sorted
      val covered = pos.zipAll(pos.drop(1).map(Some(_)), -1, None).map {
        case (p, Some(nxt)) => math.min(P, nxt - p)
        case (_, None) => P
      }.sum.toLong
      val n = t.length.toLong
      val ratioFp = if (pos.isEmpty) 0L else covered * 1000000L / n
      (id, n, pos.length.toLong, if (pos.isEmpty) 0L else covered, ratioFp)
    }.sortBy(_._1).toSeq
    val got = Dedup.spanCoverage(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dup_positions"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("dup_ratio_fp"))).toSeq
    assert(got == expected)
    // overlapping-span arithmetic is actually exercised: some doc must
    // carry adjacent duplicated positions (contribution < P)
    assert(expected.exists(e => e._3 >= 2 && e._4 < e._3 * P))
  }

  test("reservoir sample: two-level salted top-k equals the single-window rank") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map { case (id, _) => (id, PortableHash.md5Lower63("rsv:" + id)) }
        .sortBy { case (id, h) => (h, id) }
        .take(Sampling.ReservoirK)
        .zipWithIndex
        .map { case ((id, h), i) => (src, i + 1L, id, h) }
    }.sortBy(r => (r._1, r._2))
    val got = Sampling.sampleReservoir(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rn"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).toSeq
    assert(got == expected)
  }

  test("PQ ANN: well-formed per-query rankings, recall floor vs exact L2, determinism") {
    val rows = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adist"),
        r.getAs[Double]("dist")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.values.foreach { qr =>
      val sorted = qr.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 5L))
      // exact re-rank distances are non-decreasing in rank; all finite ≥ 0
      assert(sorted.map(_._5).sliding(2).forall(p => p.head <= p.last))
      assert(sorted.forall(r => r._5 >= 0.0 && !r._5.isNaN))
      assert(sorted.forall(_._3 >= 0L))
    }
    // recall floor vs brute-force exact L2 top-5 (same tie rule)
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Double]]("v").toArray))
    val queries = e.filter(_._1 < 8)
    val exact = queries.flatMap { case (qid, qv) =>
      e.filter(_._1 != qid)
        .map { case (nid, nv) =>
          var aa = 0.0; var ab = 0.0; var bb = 0.0
          var i = 0
          while (i < qv.length) {
            aa += qv(i) * qv(i); ab += qv(i) * nv(i); bb += nv(i) * nv(i); i += 1
          }
          (nid, aa - 2 * ab + bb)
        }
        .sortBy { case (nid, d) => (d, nid) }.take(5)
        .map { case (nid, _) => (qid, nid) }
    }.toSet
    val got = rows.map(r => (r._1, r._3)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 vs exact L2 = $recall")
    // deterministic end to end (codebook fit, codes, ADC, re-rank)
    val again = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adist"),
        r.getAs[Double]("dist")))
    assert(rows.toSeq == again.toSeq)
  }

  test("delta agg: incremental base+delta merge equals a from-scratch full recompute") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "CAST(floor(l_quantity * 100) AS BIGINT) AS qc")
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("qc")))
    val expected = li.groupBy(_._1).map { case (k, rows) =>
      (k, rows.length.toLong, rows.map(_._2).sum, rows.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = Mutations.deltaAgg(spark, sf).collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("n_items"),
        r.getAs[Long]("sum_qty_cents"), r.getAs[Long]("max_qty_cents"))).toSeq
    assert(got == expected)
  }

  test("hilbert index: inverse round-trip and the no-long-jumps adjacency property") {
    // independent INVERSE implementation (d → (x, y), the standard
    // quadrant-unwinding form — note its rotation uses the CURRENT level
    // size, unlike the forward map's full-grid reflection)
    def d2xy(d: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      var t = d
      var s = 1L
      while (s < 65536L) {
        val rx = 1L & (t / 2)
        val ry = 1L & (t ^ rx)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s <<= 1
      }
      (x, y)
    }
    // round-trip over a deterministic spread of the 2^32 key space
    val ds = (0L until 4096L).map(i => i * 1048573L % 4294967296L)
    ds.foreach { d =>
      val (x, y) = d2xy(d)
      assert(Bucketing.hilbertIndex(x, y) == d, s"round-trip failed at d=$d")
    }
    // the Hilbert continuity guarantee: consecutive keys are grid-adjacent
    // (Manhattan distance exactly 1) — the property the z-curve lacks
    (0L until 2048L).foreach { d =>
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L, s"jump at d=$d")
    }
  }

  test("sssp: relaxed distances match a from-scratch Bellman-Ford over a recomputed backbone") {
    // independent pipeline recompute: distinct purchases → per-customer cap
    // (sort-based) → pair counts → top-5000 backbone → weights → 4 rounds
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val od = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cs = li.flatMap { case (ok, s) => od.get(ok).map(c => (c, s)) }.distinct
    val capped = cs.groupBy(_._1).values.flatMap(g =>
      g.map(_._2).sorted.take(100).map(s => (g.head._1, s))).toSeq
    val weights = capped.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).map { case ((a, b), occ) => (a, b, occ.size.toLong) }
      .toSeq.sortBy { case (a, b, n) => (-n, a, b) }.take(5000)
      .map { case (a, b, n) => (a, b, 1000000L / n) }
    val und = weights.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val src = weights.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to Graph.SsspRounds) {
      val relaxed = und.flatMap { case (u, v, w) => dist.get(u).map(d => (v, d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ds) => (v, ds.map(_._2).min) }
    }
    val expected = dist.toSeq.sortBy(_._1)
    val got = Graph.sssp(spark, sf).collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("d"))).toSeq
    assert(got == expected)
    // weighted relaxation is genuinely exercised: some multi-hop distance
    // is CHEAPER than a direct heavy edge would be, i.e. not all hops equal
    assert(got.map(_._2).distinct.length > Graph.SsspRounds + 1)
  }

  test("ER clusters: component labels match a from-scratch union-find over the fuzzy pairs") {
    val pairs = QuerySurface.fuzzyJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = members.groupBy(find)
    val expected = byRoot.toSeq.flatMap { case (root, ms) =>
      ms.map(m => (m, root, ms.length.toLong, m == root))
    }.sortBy(_._1)
    val got = QuerySurface.erClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical"))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 >= 3)) // a transitive (multi-pair) cluster exists
  }

  test("tfidf pairs: sparse cosine matches a from-scratch exact-integer recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ").filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    val dfs = docs.flatMap { case (id, t) => t.distinct.map((_, id)) }
      .groupBy(_._1).map { case (t, o) => (t, o.length.toLong) }
      .filter { case (_, df) => df >= 2 && df <= TextAnalysis.TfidfDfCap }
    val w = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).collect { case (t, occ) if dfs.contains(t) =>
        ((id, t), occ.length.toLong * (nDocs * 1000L / dfs(t)))
      }
    }.toMap
    val nsq = w.groupBy(_._1._1).map { case (id, ws) =>
      (id, ws.values.map(x => BigInt(x) * x).sum)
    }
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val byTok = w.toSeq.map { case ((id, t), wf) => (t, id, wf) }.groupBy(_._1)
    val expected = byTok.values.flatMap { g =>
      for (a <- g; b <- g; if a._2 < b._2) yield ((a._2, b._2), BigInt(a._3) * b._3)
    }.groupBy(_._1).toSeq.map { case ((d1, d2), prods) =>
      val dot = prods.map(_._2).sum
      val cos = r6(dot.toDouble / (math.sqrt(nsq(d1).toDouble) * math.sqrt(nsq(d2).toDouble)))
      (d1, d2, prods.size.toLong, cos)
    }.filter(_._4 >= TextAnalysis.TfidfThreshold).sortBy(p => (p._1, p._2))
    val got = TextAnalysis.tfidfPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("n_shared_terms"), r.getAs[Double]("cos"))).toSeq
    assert(got == expected)
  }

  test("basket pairs: support/confidence/lift match a from-scratch recompute") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val sup = li.groupBy(_._2).map { case (p, o) => (p, o.length.toLong) }
    val pairCounts = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted.take(QuerySurface.BasketCap)
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case ((a, b), occ) => (a, b, occ.size.toLong) }
    val expected = pairCounts.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }.take(QuerySurface.BasketTopK)
      .map { case (a, b, n) =>
        (a, b, n, sup(a), sup(b), n * 1000000L / sup(a),
          n * nOrders / sup(a) * 1000000L / sup(b))
      }
    val got = QuerySurface.basketPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("sup_ab"), r.getAs[Long]("sup_a"), r.getAs[Long]("sup_b"),
        r.getAs[Long]("conf_fp"), r.getAs[Long]("lift_fp"))).toSeq
    assert(got == expected)
  }

  test("keywords: per-doc tf-idf top-k matches a from-scratch recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ").filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    val dfs = docs.flatMap { case (id, toks) => toks.distinct.map((_, id)) }
      .groupBy(_._1).map { case (t, occ) => (t, occ.length.toLong) }
    val expected = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, occ) =>
        (id, t, occ.length.toLong, dfs(t),
          occ.length.toLong * (nDocs * 1000000L / dfs(t)))
      }.toSeq.sortBy { case (_, t, _, _, s) => (-s, t) }
        .take(TextAnalysis.KeywordsPerDoc)
        .zipWithIndex
        .map { case ((_, t, tf, df, s), i) => (id, i + 1L, t, tf, df, s) }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = TextAnalysis.keywords(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("tok"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Long]("score_fp"))).toSeq
    assert(got == expected)
  }
}
