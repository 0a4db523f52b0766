package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 UDF-inventory audit (verdict task 4): measures every remaining
  * brace-syntax `udf {` site in the operators as a SET — the per-site wall
  * of the PRODUCTION closure over the sf1 corpus, next to the wall of its
  * input prep alone, so the UDF's own cost (udf − base) can be put against
  * its gate's sf1 wall (SCALESWEEP) in SCALE.md's audit table.
  *
  * Methodology (the VecKernelProbe discipline): each measured pass computes
  * input prep + UDF + a cheap aggregate that cannot elide the work; the
  * matching `base_*` pass computes input prep + the same-shaped aggregate
  * without the UDF. Three interleaved passes per entry (ambient stalls
  * arrive in windows — back-to-back reps share one), median reported.
  * Spec-only UDFs (Dedup.minhashSignature, TextAnalysis.fingerprintKR's
  * two) are not measured: they are on no gate path, cost share 0 by
  * construction.
  *
  * Usage: UdfAuditProbe [sfDir] (default target/sf1)
  */
object UdfAuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.operators.Tables.spreadIfNarrow(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")), col("doc_id"))
      .persist()
    docs.count()
    val ev = spark.read.parquet(s"$sfDir/events.parquet").persist()
    ev.count()

    val toks = split(col("text"), " ")
    val toksLower = split(lower(col("text")), " ")

    // mkUb boundaries: a fixed sorted 256-entry grid (the production arrays
    // are qsketch quantiles — same size, same binary search)
    val ub = graft.operators.Bucketing.mkUb(
      Array.tabulate(256)(i => i * 4.0))
    // bloom sized like q_bloom_join's build side relative to the probe side
    val bloom = ev.limit(20000).stat.bloomFilter("user_id", 20000L, 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf { (k: Long) => bloomB.value.mightContainLong(k) }

    import graft.operators.{Dedup, Sampling, TextAnalysis, Bucketing}
    val entries: Seq[(String, () => Unit)] = Seq(
      "base_tok" -> (() => { docs.select(sum(size(toks))).head() }),
      "base_text" -> (() => { docs.select(sum(length(col("text")))).head() }),
      "base_tok_lower" -> (() => { docs.select(sum(size(toksLower))).head() }),
      "shingleUdf" -> (() =>
        { docs.select(sum(size(Dedup.shingleUdf(toks)))).head() }),
      "simhashUdf" -> (() =>
        // pmod keeps the 63-bit hash sum inside ANSI bigint bounds
        { docs.select(sum(pmod(Dedup.simhashUdf(toks), lit(1000000007L)))).head() }),
      "gramPosHashUdf" -> (() =>
        { docs.select(sum(size(Dedup.gramPosHashUdf(toks)))).head() }),
      "ngramHash8Udf" -> (() =>
        { docs.select(sum(size(Sampling.ngramHash8Udf(toks)))).head() }),
      "chunkUdf" -> (() =>
        { docs.select(sum(size(Sampling.chunkUdfFor(
            Sampling.ChunkLen, Sampling.ChunkStride)(toks)))).head() }),
      "repetitionStatsUdf" -> (() =>
        { docs.select(sum(TextAnalysis.repetitionStatsUdf(toks)
            .getField("_3"))).head() }),
      "winnowUdf" -> (() =>
        { docs.select(sum(TextAnalysis.winnowUdf(col("text"))
            .getField("_2"))).head() }),
      "vocabGram3Udf" -> (() =>
        { docs.select(sum(size(TextAnalysis.vocabGram3Udf(toksLower)))).head() }),
      "classifierScoreUdf" -> (() =>
        { docs.select(sum(TextAnalysis.classifierScoreUdf(toksLower))).head() }),
      "base_events_long" -> (() =>
        { ev.select(sum(col("user_id"))).head() }),
      "base_events_double" -> (() =>
        { ev.select(sum(col("value"))).head() }),
      "mkUb" -> (() => { ev.select(sum(ub(col("value")))).head() }),
      "hilbertUdf" -> (() =>
        { ev.select(sum(Bucketing.hilbertUdf(
            pmod(col("user_id"), lit(65536L)),
            pmod(col("event_id"), lit(65536L))))).head() }),
      "bloomMightContain" -> (() =>
        { ev.select(sum(mightContain(col("user_id")).cast("long"))).head() })
    )

    val walls = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to 3).foreach { pass =>
      entries.foreach { case (name, body) =>
        System.gc()
        val t0 = System.nanoTime()
        body()
        val w = (System.nanoTime() - t0) / 1e9
        walls(name) = walls(name) :+ w
        System.err.println(f"pass $pass $name: $w%.2f s")
      }
    }
    entries.foreach { case (name, _) =>
      val ws = walls(name).sorted
      val raw = walls(name).map(w => f"$w%.2f").mkString("[", ",", "]")
      println(f"""{"udf":"$name","median_s":${ws(ws.length / 2)}%.2f,"raw":$raw}""")
    }
    spark.stop()
  }
}
