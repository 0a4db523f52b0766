package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Mutations, QuerySurface, Similarity, Tables, TextAnalysis}

/** Round-7 second-batch operators: recency-decay aggregation, fuzzy join,
  * BM25 retrieval, BFS hops, semantic dedup, MMR selection. Each test
  * recomputes the expected result from the RAW tables with independent
  * Scala code (sort-based, not the operators' join/agg pipelines) and
  * compares exactly — the same contract as the DuckDB gate, in-process. */
class Round7bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("decay agg: per-user shift-decayed sums match a from-scratch recomputation") {
    val got = QuerySurface.decayAgg(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("decayed_fp_sum"))).toMap

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
    val maxUs = ev.map(_.getAs[Long]("us")).max
    val expected = ev.groupBy(_.getAs[Long]("user_id")).map { case (u, rows) =>
      u -> (rows.length.toLong, rows.map { r =>
        val age = math.min((maxUs - r.getAs[Long]("us")) / 3600000000L, 40L)
        math.floor(r.getAs[Double]("value") * 1000000).toLong / (1L << age)
      }.sum)
    }
    assert(got == expected)
    // the newest event decays by 2^0: its user's score strictly exceeds 0
    assert(got.values.forall(_._2 >= 0L))
  }

  test("fuzzy join: blocked Levenshtein pairs match a brute-force DP sweep") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_name")))
    // sf0.001 blocks are far below FuzzyBlockCap, so brute force is exact
    val expected = (for {
      (ak, an) <- parts
      (bk, bn) <- parts
      if ak < bk && an.split(" ")(0) == bn.split(" ")(0)
      d = lev(an, bn)
      if d >= 1 && d <= 3
    } yield (ak, bk, an, bn, d.toLong)).toSet

    val got = QuerySurface.fuzzyJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key"),
        r.getAs[String]("a_name"), r.getAs[String]("b_name"),
        r.getAs[Long]("dist"))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(got.nonEmpty, "corpus should contain near-miss name pairs")
  }

  test("bm25: fixed-point scores match a from-scratch recomputation, top-k order exact") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val n = docs.length.toLong
    val dl = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val tt = dl.values.sum
    val avgdlFp = tt * 1000000L / n
    val terms = TextAnalysis.Bm25QueryTerms
    val tf = docs.map { case (id, t) =>
      id -> terms.map(q => q -> t.split(" ", -1).count(_ == q).toLong)
        .filter(_._2 > 0).toMap
    }.toMap
    val dfm = terms.map(q => q -> tf.values.count(_.contains(q)).toLong).toMap
    val expected = tf.toSeq.flatMap { case (id, m) =>
      if (m.isEmpty) None
      else {
        val scoreFp = m.map { case (q, f) =>
          val idfFp = ((2 * (n - dfm(q)) + 1) * 1000000L) / (2 * dfm(q) + 1)
          val satFp = (f * 2200000L * 1000000L) /
            (f * 1000000L + 300000L + (900000L * dl(id) * 1000000L) / avgdlFp)
          idfFp * satFp / 1000000L
        }.sum
        Some((id, m.size.toLong, scoreFp))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)

    val got = TextAnalysis.bm25(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("score_fp"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "query terms should hit the corpus")
  }

  test("bfs: hop labels equal a sequential BFS over the collected backbone") {
    val out = Graph.bfsHops(spark, sf).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("hop")).toMap

    // independent BFS over the same backbone, rebuilt via the operator's
    // own edge builder (the backbone contract is spec'd in GraphSpec)
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val od = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    val edges = Graph.coPurchaseEdges(cs, 5000, 100).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val source = edges.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(source -> 0L)
    for (h <- 1L to 4L) {
      val frontier = dist.filter(_._2 == h - 1).keySet
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
    }
    assert(out == dist)
    assert(out(source) == 0L && out.size > 1)
  }

  test("semantic dedup: keep flag equals the lower-id-cluster-mate rule") {
    val res = Similarity.semanticDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Boolean]("keep")))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def round6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (acc, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { acc += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      round6(acc / (math.sqrt(na) * math.sqrt(nb)))
    }
    val byCluster = res.groupBy(_._2)
    res.foreach { case (id, cl, keep) =>
      val lowerMates = byCluster(cl).filter(_._1 < id)
      val hasDup = lowerMates.exists(m => cos(vecs(m._1), vecs(id)) >= 0.4)
      assert(keep == !hasDup, s"vec $id cluster $cl: keep=$keep, hasDup=$hasDup")
    }
    // the lowest id of every cluster is always a survivor
    byCluster.values.foreach { members =>
      assert(members.minBy(_._1)._3, "cluster representative must be kept")
    }
    assert(res.exists(!_._3), "corpus should contain semantic near-dups")
  }

  test("mmr: pool, greedy picks, and scores match an independent reimplementation") {
    def round6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val norms = vecs.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      var (acc, i) = (0.0, 0)
      while (i < va.length) { acc += va(i) * vb(i); i += 1 }
      round6(acc / (norms(a) * norms(b)))
    }
    val rel = vecs.keys.filter(id => id != 0L && norms(id) > 0)
      .map(id => id -> round6({
        val (va, vb) = (vecs(id), vecs(0L))
        var (acc, i) = (0.0, 0)
        while (i < va.length) { acc += va(i) * vb(i); i += 1 }
        acc / (norms(id) * norms(0L))
      })).toMap
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(50)
    var selected = Vector.empty[Long]
    var expected = Vector.empty[(Long, Long, Double)]
    while (selected.size < 10) {
      val remaining = pool.filterNot(p => selected.contains(p._1))
      val (pick, score) =
        if (selected.isEmpty) (remaining.head._1, remaining.head._2)
        else remaining.map { case (id, r) =>
          val maxSim = selected.map(s => cos(id, s)).max
          // (1.0 - 0.7) != 0.3 in binary — must match the operator's algebra
          (id, round6(0.7 * r - (1.0 - 0.7) * maxSim))
        }.minBy { case (id, sc) => (-sc, id) }
      expected :+= ((selected.size + 1L, pick, score))
      selected :+= pick
    }
    val got = Similarity.mmr(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("mmr"))).toVector
    assert(got == expected)
    assert(got.map(_._2).distinct.size == 10, "picks must be distinct")
  }

  test("collocations: lift ranking matches a from-scratch bigram recomputation") {
    val texts = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val tokLists = texts.map(_.split(" ", -1).toSeq)
    val nToks = tokLists.map(_.length.toLong).sum
    val uc = tokLists.flatten.groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val bc = tokLists.filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
      .groupBy(identity).map { case (b, o) => b -> o.length.toLong }
      .filter(_._2 >= 5L)
    val expected = bc.toSeq.map { case ((w1, w2), cxy) =>
      (w1, w2, cxy, ((cxy * 1000000L) / uc(w1)) * nToks / uc(w2))
    }.sortBy { case (w1, w2, _, l) => (-l, w1, w2) }.take(30)

    val got = TextAnalysis.collocations(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_xy"), r.getAs[Long]("lift_fp"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "corpus should contain supported bigrams")
    // lift > 1 means the pair co-occurs above independence — the top of the
    // ranking must be genuine collocations, not noise
    assert(got.head._4 > 1000000L, s"top lift should exceed 1.0: ${got.head}")
  }

  test("table diff: added/removed/changed statuses match a from-scratch reconciliation") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        math.floor(r.getAs[Double]("value") * 100).toLong))
    val old = ev.filter(_._1 % 100 < 98).map(e => e._1 -> (e._2, e._3)).toMap
    val nw = ev.filter(_._1 % 100 >= 2)
      .map(e => e._1 -> (e._2, if (e._1 % 10 == 0) e._3 * 2 else e._3)).toMap
    val expected = (old.keySet ++ nw.keySet).toSeq.sorted.flatMap { id =>
      (old.get(id), nw.get(id)) match {
        case (None, Some(n)) => Some((id, "added", null, null, n._1, n._2))
        case (Some(o), None) => Some((id, "removed", o._1, o._2, null, null))
        case (Some(o), Some(n)) if o != n =>
          Some((id, "changed", o._1, o._2, n._1, n._2))
        case _ => None
      }
    }
    val got = Mutations.tableDiff(spark, sf).collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[String]("status"),
        r.getAs[String]("old_type"),
        if (r.isNullAt(r.fieldIndex("old_cents"))) null else r.getAs[Long]("old_cents"),
        r.getAs[String]("new_type"),
        if (r.isNullAt(r.fieldIndex("new_cents"))) null else r.getAs[Long]("new_cents"))
    }.toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    assert(got == expected.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)))
    assert(Set("added", "removed", "changed").subsetOf(got.map(_._2).toSet),
      "the synthetic snapshots must exercise all three statuses")
  }

  test("knn graph: edges match a recomputation over the operator's own LSH buckets") {
    def round6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val vecs = base.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val norms = vecs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
      .filter(_._2 > 0)
    // signatures via the PUBLIC lshSignature with the operator's table
    // seeds (tableSeed(t) = 7 + 31t); the signature function itself is
    // covered by the LSH pair/ANN specs
    val sigs = (0 until 2).flatMap { t =>
      base.withColumn("v",
          org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")))
        .withColumn("sig", Similarity.lshSignature(col("v"), 6, 64, 7 + 31 * t))
        .select(col("vec_id"), col("sig")).collect()
        .map(r => (t, r.getAs[Long]("sig"), r.getAs[Long]("vec_id")))
    }.filter(s => norms.contains(s._3))
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      var (acc, i) = (0.0, 0)
      while (i < va.length) { acc += va(i) * vb(i); i += 1 }
      round6(acc / (norms(a) * norms(b)))
    }
    val cand = sigs.groupBy(s => (s._1, s._2)).values.flatMap { bucket =>
      for (a <- bucket; b <- bucket; if a._3 != b._3) yield (a._3, b._3)
    }.toSet
    val expected = cand.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      es.toSeq.map { case (_, dst) => (dst, cos(src, dst)) }
        .distinct
        .sortBy { case (dst, c) => (-c, dst) }
        .take(5).zipWithIndex
        .map { case ((dst, c), i) => (src, i + 1L, dst, c) }
    }.sortBy(e => (e._1, e._2))

    val got = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
