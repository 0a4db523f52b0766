package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.{Graph, QuerySurface, Sampling, Similarity, Tables}

/** Round-7 fourth-batch operators: OLS trend fitting, two-cohort A/B z²,
  * data-quality expectations, TVD distribution drift. Same contract as the
  * sibling specs: from-scratch recomputes from the raw tables. */
class Round7dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def eventRows() = Tables.events(spark, sf)
    .select(col("event_type"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("value")).collect()
    .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("us"),
      r.getAs[Long]("user_id"), r.getAs[Double]("value")))

  test("trend: integer OLS moments and fixed-point slope match a recompute") {
    val ev = eventRows()
    val expected = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      val hourly = rows.groupBy(_._2 / 3600000000L).toSeq
        .map { case (h, rs) => (h, rs.length.toLong) }
      val h0 = hourly.map(_._1).min
      val pts = hourly.map { case (h, y) => (h - h0, y) }
      val n = pts.length.toLong
      val st = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sty = pts.map(p => p._1 * p._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val num = n * sty - st * sy
      val den = n * stt - st * st
      (t, n, sy, num, den, num * 1000000L / den)
    }.filter(_._2 >= 2).sortBy(_._1)
    val got = QuerySurface.trendFit(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_buckets"),
        r.getAs[Long]("total_events"), r.getAs[Long]("num"),
        r.getAs[Long]("den"), r.getAs[Long]("slope_fp"))).toSeq
    assert(got == expected)
  }

  test("ab test: z-squared from exact moments matches a same-order recompute") {
    val ev = eventRows()
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val expected = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      def mom(sel: Seq[(String, Long, Long, Double)]) = {
        val fp = sel.map(r => BigInt(math.floor(r._4 * 1000000).toLong))
        (sel.length.toLong, fp.sum, fp.map(v => v * v).sum)
      }
      val (na, sa, qa) = mom(rows.filter(_._3 % 2 == 0).toSeq)
      val (nb, sb, qb) = mom(rows.filter(_._3 % 2 != 0).toSeq)
      val diff = sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble
      val va = (na.toDouble * qa.toDouble - sa.toDouble * sa.toDouble) /
        (na.toDouble * na.toDouble * na.toDouble)
      val vb = (nb.toDouble * qb.toDouble - sb.toDouble * sb.toDouble) /
        (nb.toDouble * nb.toDouble * nb.toDouble)
      val zsq = r6((diff * diff) / (va + vb))
      (t, na, nb, zsq, zsq > QuerySurface.AbZsq)
    }.sortBy(_._1)
    val got = QuerySurface.abTest(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("na"),
        r.getAs[Long]("nb"), r.getAs[Double]("z_sq"),
        r.getAs[Boolean]("significant"))).toSeq
    assert(got == expected)
  }

  test("dq checks: violation counts match direct recomputes; suite is green on clean data") {
    val got = QuerySurface.dqChecks(spark, sf).collect()
      .map(r => (r.getAs[String]("rule"), r.getAs[Long]("violations"))).toMap
    assert(got.size == 7)
    // the driver corpus is referentially intact and in-range: all zeros
    assert(got.values.forall(_ == 0L), got.toString)
    // independently recompute the two join rules
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey")).collect()
      .map(_.getLong(0)).toSet
    val ods = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custs = Tables.customer(spark, sf).select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    assert((li -- ods.map(_._1).toSet).isEmpty)
    assert(ods.map(_._2).forall(custs.contains))
  }

  test("k-anonymity: risky quasi-identifier groups match a direct recompute") {
    val cs = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) / QuerySurface.KAnonBalBucket).toLong))
    val expected = cs.groupBy(identity).map { case (qi, rows) => (qi, rows.length.toLong) }
      .filter(_._2 < QuerySurface.KAnonK)
      .toSeq.map { case ((n, m, b), sz) => (n, m, b, sz) }
      .sortBy(t => (t._1, t._2, t._3))
    val got = QuerySurface.kAnonymity(spark, sf).collect()
      .map(r => (r.getAs[Long]("nationkey"), r.getAs[String]("mktsegment"),
        r.getAs[Long]("bal_bucket"), r.getAs[Long]("group_size"))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty) // the sparse QI space genuinely flags groups
  }

  test("chunk overlap: windows, strides, tail rule, and hashes match a recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val (len, stride) = (Sampling.ChunkLen, Sampling.ChunkStride)
    val expected = docs.flatMap { case (id, t) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var i = 0; var cid = 0L
      while (i < t.length) {
        val w = math.min(len, t.length - i)
        out += ((id, cid, i.toLong, w.toLong,
          PortableHash.md5Lower63(t.slice(i, i + w).mkString(" "))))
        cid += 1
        if (i + len >= t.length) i = t.length else i += stride
      }
      out
    }.sortBy(c => (c._1, c._2)).toSeq
    val got = Sampling.chunkOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("chunk_hash"))).toSeq
    assert(got == expected)
    // coverage + overlap: every token of every doc falls in some chunk, and
    // consecutive chunks overlap by len - stride
    docs.foreach { case (id, t) =>
      val cs = expected.filter(_._1 == id)
      assert(cs.map(c => c._3 + c._4).max == t.length)
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._3 + stride && a._3 + a._4 > b._3)
        case _ =>
      }
    }
  }

  test("assortativity: star graph is -1, regular graph is NULL, moments exact") {
    import spark.implicits._
    // a star is maximally disassortative: every edge joins the hub (deg n)
    // to a leaf (deg 1) → r = −1 exactly
    val star = (2L to 9L).map(l => (1L, l)).toDF("src", "dst")
    val rs = Graph.assortativityOf(star).collect().head
    assert(rs.getAs[Double]("assortativity") == -1.0)
    assert(rs.getAs[Long]("n") == 16L) // symmetrized
    // a cycle is 2-regular: zero degree variance → NULL, not a crash
    val cycle = (1L to 5L).map(i => (i, i % 5 + 1)).toDF("src", "dst")
    assert(Graph.assortativityOf(cycle).collect().head.isNullAt(6))
    // moments cross-check on a small irregular graph vs BigInt brute force
    val g = Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L)).toDF("src", "dst")
    val row = Graph.assortativityOf(g).collect().head
    val und = Seq((1L,2L),(2L,3L),(2L,4L),(4L,5L)).flatMap(e => Seq(e, e.swap))
    val deg = und.groupBy(_._1).map { case (u, es) => (u, es.length.toLong) }
    val pts = und.map { case (u, v) => (deg(u), deg(v)) }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    assert((row.getAs[Long]("n"), row.getAs[Long]("sx"), row.getAs[Long]("sy"),
      row.getAs[Long]("sxy"), row.getAs[Long]("sxx"), row.getAs[Long]("syy")) ==
      ((n, sx, sy, sxy, sxx, syy)))
    val r = (n.toDouble * sxy - sx.toDouble * sy) /
      (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
        math.sqrt(n.toDouble * syy - sy.toDouble * sy))
    assert(math.abs(row.getAs[Double]("assortativity") - r) < 1e-6)
  }

  test("rrf fusion: fused ranking matches a from-scratch two-ranker recompute") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Double]]("v").toArray))
      .filter { case (_, v) =>
        val d = v.map(x => x * x).sum; d > 0 && !d.isNaN
      }
    val pool = Similarity.RrfPool
    val expected = vecs.filter(_._1 < 8).flatMap { case (qid, qv) =>
      val qq = qv.map(x => x * x).sum
      val cands = vecs.filter(_._1 != qid).map { case (nid, nv) =>
        var ab = 0.0; var bb = 0.0; var i = 0
        while (i < qv.length) { ab += qv(i) * nv(i); bb += nv(i) * nv(i); i += 1 }
        val cos = r6(ab / (math.sqrt(qq) * math.sqrt(bb)))
        val dist = r6(qq - 2.0 * ab + bb)
        (nid, cos, dist)
      }
      val rc = cands.sortBy { case (nid, cos, _) => (-cos, nid) }.zipWithIndex
        .map { case ((nid, _, _), i) => (nid, i + 1L) }.toMap
      val rl = cands.sortBy { case (nid, _, d) => (d, nid) }.zipWithIndex
        .map { case ((nid, _, _), i) => (nid, i + 1L) }.toMap
      cands.map(_._1)
        .filter(nid => rc(nid) <= pool || rl(nid) <= pool)
        .map { nid =>
          val f = (if (rc(nid) <= pool) 1000000L / (Similarity.RrfC + rc(nid)) else 0L) +
            (if (rl(nid) <= pool) 1000000L / (Similarity.RrfC + rl(nid)) else 0L)
          (nid, f)
        }
        .sortBy { case (nid, f) => (-f, nid) }.take(5).zipWithIndex
        .map { case ((nid, f), i) => (qid, i + 1L, nid, f) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Similarity.rrfFusion(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rrf_fp"))).toSeq
    assert(got == expected)
    // on this corpus the two rankers largely agree (near-normalized
    // vectors); the fusion arithmetic itself is what the equality above
    // verifies — here just confirm both rankers CONTRIBUTED (some fused
    // score is the two-ranker sum, > the single-ranker maximum 1/(C+1))
    assert(got.exists(_._4 > 1000000L / (Similarity.RrfC + 1L)))
  }

  test("tvd drift: fixed-point total variation distance matches a recompute") {
    val ev = eventRows()
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max
    val expected = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      def props(sel: Seq[(String, Long, Long, Double)]) = {
        val n = sel.length.toLong
        sel.groupBy(r => math.floor(r._4 / QuerySurface.DriftBucket).toLong)
          .map { case (b, rs) => (b, rs.length.toLong * 1000000L / n) }
      }
      val p1 = props(rows.filter(r => r._2 * 2 <= lo + hi).toSeq)
      val p2 = props(rows.filter(r => r._2 * 2 > lo + hi).toSeq)
      val buckets = (p1.keySet ++ p2.keySet).toSeq
      val tvd = buckets.map(b =>
        math.abs(p1.getOrElse(b, 0L) - p2.getOrElse(b, 0L))).sum / 2L
      (t, tvd, buckets.length.toLong)
    }.sortBy(_._1)
    val got = QuerySurface.tvdDrift(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("tvd_fp"),
        r.getAs[Long]("n_buckets"))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0L)) // halves genuinely differ somewhere
  }
}
