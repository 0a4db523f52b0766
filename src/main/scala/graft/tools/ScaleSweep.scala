package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 scaling probe: runs every `SparkEntry.queries` entry at two sf
  * directories in one JVM and prints per-query walls + the ratio — the
  * cheapest way to catch hidden super-linearity (anything growing much
  * faster than the data is a scale bug, VM noise notwithstanding).
  * A per-query timeout cancels the Spark job group and records -1, so one
  * quadratic query cannot wedge the sweep.
  *
  * Round-12 (verdict task 5): walls under [[FastWallSecs]] get TWO extra
  * interleaved repetitions and report the MEDIAN — round 11's
  * `dedup_ngram_jaccard` "regression" was a 5.1×→18.7× ratio swing caused
  * entirely by a 1.16 s single-run sf0.1 denominator; sub-2 s walls on this
  * VM carry ±50% single-run noise, so a ratio over one such sample
  * masquerades as super-linearity. The reps are interleaved across the
  * fast-gate list (not back-to-back) for the same reason Bench interleaves
  * its passes: ambient stalls arrive in multi-second windows and
  * back-to-back samples share one. Slow walls (≥2 s) stay single-run — their
  * relative noise is small and re-running the sf1 heavy tail would triple
  * the sweep's wall for nothing. Output per gate: medians, the rep count
  * per side, and the raw samples so a reader can recompute.
  *
  * Usage: ScaleSweep <sfDirA> <sfDirB> [timeoutSecs] [onlyCsv]
  */
object ScaleSweep {

  /** Walls under this many seconds are re-measured (reps=3, median). */
  val FastWallSecs = 2.0

  /** Pass-1 ratios above this re-measure both sides (reps=3, median) —
    * a super-linearity alarm must not rest on one ambient-stalled run. */
  val SuperLinearAlarm = 4.0

  /** Reps-tier trip ratio, deliberately BELOW [[SuperLinearAlarm]]: a gate
    * straddling the 4.0× alarm line (round 12: `sample_dsir` read 4.6× in
    * one validation sweep and ~3.9× in the next, flipping the alarm SET
    * between runs) must land in the both-sides-reps tier on either side of
    * the line, so consecutive sweeps agree on the set they stabilized. New
    * gates with a pass-1 ratio above this are re-measured by default. */
  val AlarmRepRatio = 3.5

  /** sf1 walls at or above this re-measure both sides regardless of ratio.
    * Two failure modes the alarm tier alone misses (both observed in
    * consecutive round-12 runs): a noisy sf0.1 DENOMINATOR can push a
    * heavy gate's pass-1 ratio under the alarm so its 20–70 s numerator
    * stays single-sample, and memoized-backbone gates price the per-JVM
    * memo BUILD into whichever run touches it first (q_assortativity's
    * sf1 wall read 0.55 s or 15.6 s depending on whether pass 1 had
    * already built the backbone). The heavy set is ~a dozen gates, so the
    * extra reps cost minutes, not a second sweep. */
  val HeavyWallSecs = 10.0

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSweep <sfDirA> <sfDirB> [timeoutSecs] [onlyCsv]")
    val (dirA, dirB) = (args(0), args(1))
    val timeoutS = if (args.length >= 3) args(2).toInt else 300
    val only: Option[Set[String]] =
      if (args.length >= 4) Some(args(3).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timedRun(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val group = s"scale-$name-$dir"
      @volatile var elapsed = -1.0
      val t = new Thread(() => {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(name)(spark, dir).count()
          elapsed = (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[$name @ $dir] ${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
      })
      t.setDaemon(true)
      t.start()
      t.join(timeoutS * 1000L)
      if (t.isAlive) {
        spark.sparkContext.cancelJobGroup(group)
        t.join(30000L)
        System.err.println(s"[$name @ $dir] TIMED OUT after $timeoutS s — job group cancelled")
      }
      elapsed
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // pass 1: every gate once per side (a, b per gate — the historical order,
    // so pass-1 walls stay comparable to earlier rounds' single-run sweeps)
    val a1 = scala.collection.mutable.Map[String, Double]()
    val b1 = scala.collection.mutable.Map[String, Double]()
    names.foreach { name =>
      a1(name) = timedRun(name, dirA)
      b1(name) = timedRun(name, dirB)
    }

    // passes 2-3, interleaved over the sub-threshold gates of each side
    val fastA = names.filter(n => a1(n) > 0 && a1(n) < FastWallSecs)
    val fastB = names.filter(n => b1(n) > 0 && b1(n) < FastWallSecs)
    val extraA = (1 to 2).map { _ =>
      fastA.map(n => n -> timedRun(n, dirA)).toMap
    }
    val extraB = (1 to 2).map { _ =>
      fastB.map(n => n -> timedRun(n, dirB)).toMap
    }

    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ > 0).sorted
      if (ok.isEmpty) -1.0 else ok(ok.length / 2)
    }

    // Round-12 second stabilization tier: a gate whose pass-1 ratio trips
    // the super-linearity alarm gets 2 extra interleaved reps on BOTH
    // sides, regardless of wall. The fast-gate tier above fixed noisy
    // DENOMINATORS; this fixes noisy heavy NUMERATORS — consecutive full
    // sweeps on an unchanged tree disagreed 62.8× vs 9.4× on
    // dedup_ngram_jaccard because one multi-second ambient stall window
    // landed inside its single 70 s sf1 run, and a false super-linearity
    // alarm is exactly the reading the sweep exists to prevent. Cost is
    // bounded: only alarm-tripping gates re-run (the documented quadratic
    // instruments plus any real regression, a handful per sweep).
    val alarm = names.filter { n =>
      val (a, b) = (median(a1(n) +: extraA.flatMap(_.get(n))),
        median(b1(n) +: extraB.flatMap(_.get(n))))
      a > 0 && b > 0 &&
        (b >= HeavyWallSecs || b / a > AlarmRepRatio) &&
        (a >= FastWallSecs || b >= FastWallSecs) // sub-2s-both already rep'd
    }
    // Interleave per (rep, gate) with A and B ADJACENT: the tier exists to
    // defend a ratio against an ambient stall window, so the two sides of
    // each sample pair must share the window. The first cut ran alarmA's two
    // full passes before alarmB's — time-separated blocks, which is exactly
    // the asymmetric-stall exposure the tier was added to fix.
    val alarmRuns = (1 to 2).map { _ =>
      alarm.map { n =>
        val a = timedRun(n, dirA)
        val b = timedRun(n, dirB)
        n -> (a, b)
      }.toMap
    }
    val alarmA = alarmRuns.map(_.map { case (n, (a, _)) => n -> a })
    val alarmB = alarmRuns.map(_.map { case (n, (_, b)) => n -> b })

    names.foreach { name =>
      val as = a1(name) +: (extraA.flatMap(_.get(name)) ++ alarmA.flatMap(_.get(name)))
      val bs = b1(name) +: (extraB.flatMap(_.get(name)) ++ alarmB.flatMap(_.get(name)))
      val (a, b) = (median(as), median(bs))
      val ratio = if (a > 0 && b > 0) f"${b / a}%.1f" else "NA"
      def raw(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
      println(f"""{"q":"$name","a_s":$a%.2f,"b_s":$b%.2f,"ratio":$ratio,"a_reps":${as.count(_ > 0)},"b_reps":${bs.count(_ > 0)},"a_raw":${raw(as)},"b_raw":${raw(bs)}}""")
    }
    // registry lock (verdict r13 task 2): an unfiltered sweep MUST cover
    // exactly SparkEntry.queries — round 13 committed a 254-gate sweep
    // against a 255-gate registry because the last gate landed after the
    // run, and nothing said so. The summary line makes the population
    // auditable from the artifact alone; the require makes silent drift
    // impossible (a filtered run prints the summary but skips the check).
    if (only.isEmpty) {
      require(names.toSet == graft.SparkEntry.queries.keySet,
        "sweep gate set drifted from SparkEntry.queries")
    }
    println(s"""{"metric":"scalesweep_summary","n_gates":${names.size},"registry_n":${graft.SparkEntry.queries.size},"filtered":${only.nonEmpty}}""")
    spark.stop()
  }
}
