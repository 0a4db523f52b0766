package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Sampling, Tables}

/** Round-7 seventh-batch operators: personalized PageRank and α-temperature
  * source mixing. From-scratch recomputes, as in the sibling specs. */
class Round7gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("ppr: seeded fixed-point iteration matches an integer recompute") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val om = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val fwd = li.map { case (ok, s) => (om(ok) * 2, s * 2 + 1) }
    val edges = (fwd ++ fwd.map(_.swap)).toSeq
    val deg = edges.groupBy(_._1).map { case (v, es) => (v, es.size.toLong) }
    val nodes = deg.keySet
    val scale = 1000000000000L
    val seeds = Graph.PprSeedSuppliers.map(k => 2 * k + 1).toSet
    var r = nodes.map(v => (v, if (seeds(v)) scale else 0L)).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        (dst, es.map { case (src, _) => r(src) / deg(src) }.sum)
      }
      r = nodes.map { v =>
        val c = contrib.getOrElse(v, 0L)
        (v, (if (seeds(v)) 15L * scale / 100L else 0L) +
          (c / 100) * 85 + ((c % 100) * 85) / 100)
      }.toMap
    }
    val expected = r.toSeq.sortBy { case (v, rk) => (-rk, v) }.take(50)
      .map { case (v, rk) =>
        (v, if (v % 2 == 0) "customer" else "supplier", v / 2, rk, seeds(v))
      }
    val got = Graph.personalizedPageRank(spark, sf).collect().map(x =>
      (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4))).toSeq
    assert(got == expected)
    // seeds must appear in the top-50 (mass teleports to them every round)
    assert(got.count(_._5) == seeds.size)
    assert(got.map(_._4).max > 0L)
  }

  test("mix temperature: sqrt weights flatten the raw proportions, exact totals") {
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val srcs = Tables.documents(spark, sf).select(col("source")).collect()
      .map(_.getString(0))
    val counts = srcs.groupBy(identity).map { case (s, v) => (s, v.length.toLong) }
    val w6 = counts.map { case (s, n) =>
      (s, BigDecimal(r6(math.sqrt(n.toDouble))).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val wtot = w6.values.sum
    val ntot = counts.values.sum
    val expected = counts.toSeq.sortBy(_._1).map { case (s, n) =>
      (s, n, w6(s).toDouble, r6(w6(s).toDouble / wtot.toDouble),
        r6(n.toDouble / ntot.toDouble))
    }
    val got = Sampling.mixTemperature(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // temperature must flatten: the largest source's share shrinks, the
    // smallest grows (strictly, unless counts are uniform)
    val largest = got.maxBy(_._2)
    val smallest = got.minBy(_._2)
    if (largest._2 != smallest._2) {
      assert(largest._4 < largest._5)
      assert(smallest._4 > smallest._5)
    }
  }
}
