package graft

import org.apache.spark.sql.functions._

import graft.operators.{OtelQueries, QuerySurface, Tables}

/** Round-7 eighth-batch operators: time-constrained funnel, error-rate SLO.
  * From-scratch recomputes, as in the sibling specs. */
class Round7hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("windowed funnel: greedy first-qualifying steps match a recompute; tighter than unbounded") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = QuerySurface.FunnelWindowUs
    val byUser = ev.groupBy(_._1)
    def stageTimes(prev: Map[Long, Long], tpe: String, windowed: Boolean): Map[Long, Long] =
      byUser.flatMap { case (u, rows) =>
        prev.get(u).flatMap { t0 =>
          val qual = rows.filter(r => r._2 == tpe && r._3 >= t0 &&
            (!windowed || r._3 <= t0 + w)).map(_._3)
          if (qual.isEmpty) None else Some(u -> qual.min)
        }
      }.toMap
    val s1 = byUser.flatMap { case (u, rows) =>
      val q = rows.filter(_._2 == "signup").map(_._3)
      if (q.isEmpty) None else Some(u -> q.min)
    }.toMap
    val s2 = stageTimes(s1, "click", windowed = true)
    val s3 = stageTimes(s2, "purchase", windowed = true)
    val row = QuerySurface.funnelWindowed(spark, sf).collect().head
    assert(row.getLong(0) == s1.size.toLong)
    assert(row.getLong(1) == s2.size.toLong)
    assert(row.getLong(2) == s3.size.toLong)
    if (s1.nonEmpty)
      assert(row.getDouble(3) == s2.size.toDouble / s1.size.toDouble)
    // the window genuinely constrains vs the unbounded funnel
    val s2u = stageTimes(s1, "click", windowed = false)
    val s3u = stageTimes(s2u, "purchase", windowed = false)
    assert(s2.size <= s2u.size && s3.size <= s3u.size)
    val unbounded = QuerySurface.funnel(spark, sf).collect().head
    assert(row.getLong(1) <= unbounded.getLong(1))
  }

  test("error slo: integer-exact breach rule matches a collected recompute") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val logs = spark.read
      .parquet(sys.env.getOrElse("GRAFT_GOLDEN_DIR",
        "/root/reference/testdata/parquet") + "/logs.parquet")
      .select(col("ServiceName"), col("SeverityText")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = logs.groupBy(_._1).toSeq.map { case (svc, rows) =>
      val n = rows.length.toLong
      val e = rows.count(r => r._2 == "ERROR" || r._2 == "FATAL").toLong
      (svc, n, e, r6(e.toDouble / n.toDouble), e * 100 > n)
    }.sortBy(_._1)
    val got = OtelQueries.goldenErrorRateSlo(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
  }
}
