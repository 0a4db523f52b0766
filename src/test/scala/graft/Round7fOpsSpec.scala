package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Graph, QuerySurface, Tables}

/** Round-7 sixth-batch operators: bounded-round label propagation, zone-map
  * pruning audit, weighted quantiles, Lorenz concentration deciles. Same
  * contract as the sibling specs: from-scratch recomputes. */
class Round7fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("label prop: k rounds give min-label-within-k-hops on a path + disjoint clique") {
    import spark.implicits._
    // path 10-11-...-17 (8 nodes) plus disjoint triangle 30-31-32
    val pathEdges = (10L until 17L).map(i => (i, i + 1))
    val edges = (pathEdges ++ Seq((30L, 31L), (31L, 32L), (30L, 32L)))
      .toDF("src", "dst")
    // closed form: label(v) after k rounds = min id within k hops
    def minWithin(k: Int, v: Long): Long =
      if (v >= 30L) 30L else math.max(10L, v - k)
    val k = 3
    val expected = ((10L to 17L).map(v => minWithin(k, v)) ++
        Seq(30L, 30L, 30L))
      .groupBy(identity).map { case (l, vs) => (l, vs.size.toLong) }
      .toSeq.sortBy { case (l, n) => (-n, l) }
    val got = Graph.labelPropOf(edges, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // 3 rounds on an 8-node path must NOT fully converge (nodes 14+ keep
    // labels > 10) — the bounded-round semantics differ from full CC
    assert(got.exists { case (l, _) => l != 10L && l != 30L })
  }

  test("zone map: per-zone min/max pruning matches a collected recompute") {
    val rows = Tables.normalizeTs(
        Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_shipdate")),
        "l_shipdate")
      .select(col("l_orderkey"), unix_micros(col("l_shipdate")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = rows.map(_._2).min
    val span = rows.map(_._2).max - lo + 1
    val (d1, d2) = (lo + span / 4, lo + span / 2)
    def summarize(zoneOf: ((Long, Long)) => Long, layout: String) = {
      val zones = rows.groupBy(zoneOf).map { case (_, zr) =>
        val us = zr.map(_._2)
        (us.min, us.max, zr.length.toLong,
          us.count(u => u >= d1 && u < d2).toLong)
      }
      val pruned = zones.count { case (zmin, zmax, _, _) => zmax < d1 || zmin >= d2 }
      (layout, zones.size.toLong, pruned.toLong,
        zones.map(_._3).sum,
        zones.filterNot { case (zmin, zmax, _, _) => zmax < d1 || zmin >= d2 }
          .map(_._3).sum,
        zones.map(_._4).sum)
    }
    val expected = Seq(
      summarize(t => t._1 / Bucketing.ZoneMapOrderkeyWidth, "natural"),
      summarize(t => (t._2 - lo) * Bucketing.ZoneMapTimeZones / span, "shipdate"))
    val got = Bucketing.zoneMapAudit(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expected)
    // the audit's point: the time-sorted layout prunes, natural does not
    val nat = got.find(_._1 == "natural").get
    val srt = got.find(_._1 == "shipdate").get
    assert(srt._3 > nat._3 && srt._5 < nat._5)
  }

  test("weighted quantile: decimal-cumsum threshold rule matches a recompute") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4)))
    val expected = rows.groupBy(_._1).toSeq.map { case (flag, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2, r._3))
      val wgts = ordered.map(r => BigDecimal(r._5).setScale(6))
      val wtot = wgts.sum
      val cum = wgts.scanLeft(BigDecimal(0))(_ + _).drop(1)
      def pick(num: Int, den: Int) = ordered(
        cum.indexWhere(c => c * num >= wtot * den))._4
      val wTotal = rs.map(r => BigDecimal(r._5).setScale(4)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (flag, wTotal, pick(2, 1), pick(20, 19))
    }.sortBy(_._1)
    val got = QuerySurface.weightedQuantile(spark, sf).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("lorenz: longhand decile cut and ppm shares match an integer recompute") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val ok = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rev = li.groupBy(t => ok(t._1)).map { case (cust, rs) =>
      val cents = (rs.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum * 100).toLongExact
      (cust, cents)
    }.toSeq
    val n = rev.size
    val ranked = rev.sortBy { case (c, v) => (-v, c) }.zipWithIndex
    val bands = ranked.groupBy { case (_, i) => (i.toLong * 10) / n }
      .map { case (d, rs) => (d, rs.size.toLong, rs.map(_._1._2).sum) }
      .toSeq.sortBy(_._1)
    val tot = BigInt(bands.map(_._3).sum)
    var cumC = BigInt(0)
    val expected = bands.map { case (d, nc, bc) =>
      cumC += bc
      (d, nc, bc, (BigInt(bc) * 1000000L / tot).toLong,
        (cumC * 1000000L / tot).toLong)
    }
    val got = QuerySurface.lorenzDeciles(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(got.last._5 == 1000000L) // Lorenz curve ends at exactly 1
    // deciles are monotone non-increasing in share (ranked by revenue)
    assert(got.map(_._4) == got.map(_._4).sortBy(-_))
  }
}
