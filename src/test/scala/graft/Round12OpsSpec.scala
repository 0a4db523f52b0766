package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-12 operators: the MAINTAINED dedup band index
  * ([[Dedup.bandIndexTable]] / [[Dedup.bandIndexUpsert]] /
  * [[Dedup.dedupIncrementalFromIndex]]) — the [[graft.operators.Similarity]]
  * IVF-codes maintenance pattern applied to the LSH corpus side. */
class Round12OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  /** (cell dir → set of (file name, length)) under a band-index root. */
  private def cellFiles(d: String): Map[String, Set[(String, Long)]] = {
    val base = new org.apache.hadoop.fs.Path(d)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.Map[String, Set[(String, Long)]]()
      .withDefaultValue(Set.empty)
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val cell = st.getPath.getParent.getParent.getName + "/" +
          st.getPath.getParent.getName // band=B/bkt=K
        out(cell) = out(cell) + ((st.getPath.getName, st.getLen))
      }
    }
    out.toMap
  }

  test("the maintained-index probe is row-identical to the self-contained " +
      "incremental dedup (index build + late-tranche upsert ≡ one-shot " +
      "corpus banding)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).sortBy(x => (x._1, x._2))
    val self = rows(Dedup.dedupIncremental(spark, sf))
    val tbl = rows(Dedup.dedupIncrementalFromIndex(spark, sf))
    assert(self.nonEmpty, "the sf0.001 batch must hit some corpus near-dups")
    assert(tbl.toSeq == self.toSeq)
  }

  test("upserting a small batch of NEW docs rewrites ONLY the touched " +
      "(band, bkt) cells; untouched cells keep their exact files") {
    val d = Files.createTempDirectory("graft-bandidx").toString
    Dedup.writeBandIndex(spark, d, docs().filter(col("doc_id") < 400))
    val before = cellFiles(s"$d/rows")
    assert(before.size > 30, s"expected a spread over many cells: ${before.size}")
    val nBefore = spark.read.parquet(s"$d/rows").count()

    // two brand-new ids borrowing real text (so they shingle non-trivially)
    val batch = docs().filter(col("doc_id").isin(401L, 402L))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val touched = Dedup.bandIndexUpsert(spark, d, batch)
    val touchedDirs = touched.map { case (b, k) => s"band=$b/bkt=$k" }.toSet
    assert(touchedDirs.size < before.size,
      s"a 2-doc batch must not touch every cell: ${touchedDirs.size} of ${before.size}")

    val after = cellFiles(s"$d/rows")
    before.foreach { case (cell, files) =>
      if (!touchedDirs.contains(cell))
        assert(after(cell) == files, s"untouched cell $cell was rewritten")
    }
    assert(spark.read.parquet(s"$d/rows").count() == nBefore + 2 * 16,
      "each new doc adds one row per band")
  }

  test("a re-arriving doc_id with CHANGED text has all its old band rows " +
      "replaced — including rows in cells the new text does not touch") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bandidx2").toString
    Dedup.writeBandIndex(spark, d, docs().filter(col("doc_id") < 400))
    val idx0 = spark.read.parquet(s"$d/rows")
      .select(col("doc_id"), col("band"), col("bandSig"))
    val ids = idx0.select(col("doc_id")).distinct().as[Long].collect().sorted
    assert(ids.length >= 2)
    val (idA, idB) = (ids(0), ids(1))
    val sigB = idx0.filter(col("doc_id") === idB)
      .select(col("band"), col("bandSig")).as[(Int, String)].collect().toSet

    // re-arrive idA carrying idB's text: its band rows must become sigB's
    val newA = docs().filter(col("doc_id") === idB)
      .select(lit(idA).as("doc_id"), col("text"))
    Dedup.bandIndexUpsert(spark, d, newA)

    val rowsA = spark.read.parquet(s"$d/rows").filter(col("doc_id") === idA)
      .select(col("band"), col("bandSig")).as[(Int, String)].collect()
    assert(rowsA.length == 16, s"exactly one row per band, got ${rowsA.length}")
    assert(rowsA.toSet == sigB,
      "the replaced doc's band rows must equal the new text's signatures")
  }

  test("sample_dsir selects only pool documents, ranks by the smoothed " +
      "target/pool bucket ratio (independent recompute), and broadcasts " +
      "the bucket model") {
    import graft.operators.Sampling
    val out = Sampling.sampleDsir(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= Sampling.DsirTopK)
    // target-domain documents are the reference sample, never selected
    assert(rows.forall(r =>
      !Sampling.DsirTargetSources.contains(r.getAs[String]("source"))))
    // scores are the committed total order
    val scores = rows.map(r => (r.getAs[Long]("score_fp"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy(t => (-t._1, t._2))))

    // independent recompute of the top document's score: brute-force the
    // bucket counts with plain DataFrame ops (no shared helper)
    val topDoc = rows.head.getAs[Long]("doc_id")
    val bg = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("source"),
        (graft.functions.PortableHash.md5Lower63Col(col("bg"))
          % Sampling.DsirBuckets).as("b"))
      .collect()
    val isTgt = (s: String) => Sampling.DsirTargetSources.contains(s)
    val cT = bg.filter(r => isTgt(r.getString(1))).groupBy(_.getLong(2))
      .view.mapValues(_.length.toLong).toMap
    val cS = bg.filter(r => !isTgt(r.getString(1))).groupBy(_.getLong(2))
      .view.mapValues(_.length.toLong).toMap
    val mine = bg.filter(r => r.getLong(0) == topDoc && !isTgt(r.getString(1)))
    val rsum = mine.map { r =>
      val b = r.getLong(2)
      ((cT.getOrElse(b, 0L) + 1L) * 1000000L) / (cS(b) + 1L)
    }.sum
    val expected = rsum / mine.length
    assert(rows.head.getAs[Long]("score_fp") == expected,
      s"top doc score recompute: got ${rows.head.getAs[Long]("score_fp")}, want $expected")
    assert(rows.head.getAs[Long]("n_bigrams") == mine.length)

    // the B-bounded model joins as a broadcast — the corpus-sized bigram
    // stream must never shuffle for the model lookup
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast model join in:\n$plan")
  }

  test("cluster_prune_prototypes prunes exactly ceil(n/4) per cluster, " +
      "cut_cos is the lowest pruned cosine, and the rank path carries no " +
      "cluster-keyed window") {
    import graft.operators.Clustering
    val out = Clustering.prunePrototypes(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("n_pruned") == (n + 3) / 4)
      // the pruning boundary: most-prototypical >= threshold >= kept mean
      assert(r.getAs[Double]("proto_cos") >= r.getAs[Double]("cut_cos"))
      if (!r.isNullAt(r.fieldIndex("kept_mean_cos")))
        assert(r.getAs[Double]("cut_cos") >= r.getAs[Double]("kept_mean_cos"))
    }
    // total members = embedding count (every vector is assigned somewhere)
    val total = rows.map(_.getAs[Long]("n_members")).sum
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total == nVec, s"member total $total != vector count $nVec")
    // distributed rank: no windowspecdefinition keyed by the 8-value
    // cluster column anywhere in the plan (globalRank's contract)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      s"expected a window-free rank path in:\n$plan")
  }

  test("stream_dedup_lsh (streaming probe of the maintained band index) is " +
      "row-identical to the batch incremental dedup") {
    val streamed = graft.streaming.StreamGate.dedupLshIndex(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = Dedup.dedupIncremental(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty, "the batch tranche must produce matches")
    assert(streamed == batch,
      "streaming index probe must equal the self-contained batch form")
  }
}
