package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala property checks for the round-9 statistics kernels — the
  * mathematical identities the gates' formulas rely on, fuzzed over seeded
  * pseudo-random inputs (no Spark session: these pin the ALGEBRA; the
  * engine plumbing is pinned by Round9eOpsSpec's recomputes and the DuckDB
  * hashes). */
class Round9ePropertySpec extends AnyFunSuite {

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  test("gini: the rank form 2*sum(r*x) - (n+1)*sum(x) equals the pairwise " +
      "sum of |xi - xj| exactly, for 200 random multisets (with ties)") {
    for (seed <- 1 to 200) {
      val n = 2 + (seed % 17)
      val xs = rng(seed.toLong).map(v => math.floorMod(v, 1000L))
        .take(n).toVector.sorted
      val s = xs.map(BigInt(_)).sum
      val w = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val rankForm = w * 2 - s * (n + 1)
      val pairForm = (for {
        i <- xs.indices; j <- xs.indices if i < j
      } yield BigInt((xs(j) - xs(i)).abs)).sum
      assert(rankForm == pairForm, s"seed=$seed xs=$xs")
      // and the coefficient is within [0, 1): pairwise |d| <= n * sum
      if (s > 0) {
        val ppm = rankForm * 1000000 / (s * n)
        assert(ppm >= 0 && ppm < 1000000, s"seed=$seed ppm=$ppm")
      }
    }
  }

  test("spearman: rho of a series against itself is exactly 1e6 when " +
      "values are unique; reversing the series gives exactly -1e6") {
    for (seed <- 1 to 100) {
      val n = 3 + (seed % 20)
      val xs = rng(seed.toLong * 7 + 1).map(v => math.floorMod(v, 1000000L))
        .take(n).toVector.distinct
      val m = xs.size.toLong
      if (m > 1) {
        // identical rankings → d = 0 everywhere
        assert(1000000L - 6L * 0L / (m * (m * m - 1L)) == 1000000L)
        // exact reversal: sum d^2 = n(n^2-1)/3 → rho = 1e6 - 2e6 = -1e6
        val d2 = (1L to m).map { r => val d = r - (m - r + 1L); d * d }.sum
        assert(d2 == m * (m * m - 1L) / 3L, s"n=$m")
        assert(1000000L - 6L * d2 * 1000000L / (m * (m * m - 1L)) == -1000000L)
      }
    }
  }

  test("kendall: negating one series swaps concordant and discordant " +
      "counts exactly; tau flips sign when there are no ties") {
    for (seed <- 1 to 100) {
      val n = 3 + (seed % 15)
      val pairs = rng(seed.toLong * 13 + 5)
        .grouped(2).map(g => (math.floorMod(g.head, 500L),
          math.floorMod(g(1), 500L))).take(n).toVector
      def counts(v: Vector[(Long, Long)]): (Long, Long) = {
        var c = 0L; var d = 0L
        for (i <- v.indices; j <- v.indices if i < j) {
          val dc = v(j)._1 - v(i)._1; val ds = v(j)._2 - v(i)._2
          if ((dc > 0 && ds > 0) || (dc < 0 && ds < 0)) c += 1
          else if ((dc > 0 && ds < 0) || (dc < 0 && ds > 0)) d += 1
        }
        (c, d)
      }
      val (c1, d1) = counts(pairs)
      val (c2, d2) = counts(pairs.map { case (a, b) => (a, -b) })
      assert(c1 == d2 && d1 == c2, s"seed=$seed")
    }
  }

  test("poisson thresholds: weights are in [0, 9], monotone in the hash, " +
      "and the zero-weight region matches e^-1 to 4 decimals") {
    val ts = Seq(3393088950634442637L, 6786177901268885274L,
      8482722376586106593L, 9048237201691847032L, 9189615907968282142L,
      9217891649223569164L, 9222604272766117001L, 9223277504700766692L,
      9223361658692597904L)
    assert(ts == ts.sorted && ts.forall(t => t > 0 && t <= Long.MaxValue))
    def w(h: Long): Int = ts.count(h >= _)
    assert(w(0L) == 0 && w(Long.MaxValue) == 9)
    // monotone: weight never decreases as the hash grows
    val probes = (0 until 1000).map(i => (Long.MaxValue / 1000) * i)
    probes.sliding(2).foreach { case Seq(a, b) => assert(w(a) <= w(b)) }
    // P(w = 0) = T0 / 2^63 must equal e^-1 to 4 decimals
    val p0 = ts.head.toDouble / math.pow(2, 63)
    assert(math.abs(p0 - math.exp(-1.0)) < 5e-5, s"p0=$p0")
  }
}
