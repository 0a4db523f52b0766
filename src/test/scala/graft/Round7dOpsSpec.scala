package graft

import org.apache.spark.sql.functions._

import graft.operators.{QuerySurface, Tables}

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
