package graft

import graft.operators.{OtelQueries, QuerySurface, Sampling, Tables}

/** Round-9 third-extension gates: Simpson/HHI mix concentration, Fano
  * burstiness, and per-op exemplar selection — plain-Scala recomputes
  * sharing no Spark/SQL machinery with the operator under test. */
class Round9dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("mix_simpson: plain-Scala concentration recompute; effective count " +
      "bounded by the source count") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val counts = xs.groupBy(_._2).map(_._2.length.toLong)
      val nDocs = counts.sum
      val sumSq = counts.map(c => c * c).sum
      lang -> ((counts.size.toLong, nDocs, sumSq,
        sumSq * 1000000L / (nDocs * nDocs),
        round6(nDocs.toDouble * nDocs.toDouble / sumSq.toDouble)))
    }
    val out = Sampling.mixSimpson(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nSrc, nDocs, sumSq, ppm, eff) = expected(row.getAs[String]("lang"))
      assert(row.getAs[Long]("n_sources") == nSrc)
      assert(row.getAs[Long]("n_docs") == nDocs)
      assert(row.getAs[Long]("sum_sq") == sumSq)
      assert(row.getAs[Long]("simpson_ppm") == ppm)
      assert(row.getAs[Double]("effective_sources") == eff)
      // 1 <= effective sources <= actual sources (equality iff uniform)
      assert(eff >= 1.0 - 1e-9 && eff <= nSrc + 1e-9)
    }
  }

  test("q_fano: plain-Scala variance-to-mean recompute over hourly counts") {
    val counts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, h), g) => (et, h, g.length.toLong) }
    val expected = counts.groupBy(_._1).map { case (et, xs) =>
      val nh = xs.size.toLong
      val sx = xs.map(_._3).sum
      val sxx = xs.map(x => x._3 * x._3).sum
      val fano = round6((nh * sxx - sx * sx).toDouble / (nh * sx).toDouble)
      et -> ((nh, sx, sxx, fano, nh * sxx - sx * sx > 2 * nh * sx))
    }
    val out = QuerySurface.fano(spark, sf).collect()
    assert(out.length == expected.size && out.nonEmpty)
    out.foreach { row =>
      val (nh, sx, sxx, fano, bursty) = expected(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("nh") == nh && row.getAs[Long]("sx") == sx)
      assert(row.getAs[Long]("sxx") == sxx)
      assert(row.getAs[Double]("fano") == fano, s"fano ${row.getString(0)}")
      assert(row.getAs[Boolean]("is_bursty") == bursty)
      assert(fano >= 0.0) // population variance is non-negative
    }
  }

  test("otel_exemplars: plain-Scala per-op top-3 argmax with deterministic " +
      "tie-break") {
    val n = 2000L
    val spans = for {
      t <- 0L until n
      i <- 0L to (t % 15)
    } yield (s"op-${(t + i) % 7}", t, i, 1000L + ((t * 31 + i * 17) % 97) * 10)
    val expected = spans.groupBy(_._1).flatMap { case (name, ss) =>
      ss.sortBy { case (_, t, i, d) => (-d, t, i) }.take(3).zipWithIndex
        .map { case ((_, t, i, d), idx) =>
          (name, idx + 1L) -> ((t, i, d))
        }
    }
    val out = OtelQueries.exemplars(spark, sf).collect()
    assert(out.length == expected.size && out.length == 21)
    out.foreach { row =>
      val k = (row.getAs[String]("span_name"), row.getAs[Long]("rk"))
      val (t, i, d) = expected(k)
      assert(row.getAs[Long]("trace_id") == t, s"trace $k")
      assert(row.getAs[Long]("span_idx") == i)
      assert(row.getAs[Long]("duration_ns") == d)
    }
    // exemplar durations are non-increasing within each op
    out.groupBy(_.getAs[String]("span_name")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("duration_ns"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
