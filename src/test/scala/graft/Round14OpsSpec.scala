package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-14 additions: the MULTI-TRIGGER streaming ANN maintenance gate
  * (verdict r13 task 3 — the dedup/similarity symmetry closed). The
  * oracle's cell-by-cell compare already checks the final frame against
  * the base-fit/full-encode DuckDB twin; what it cannot see is the
  * EQUIVALENCE CLAIM the gate's scaladoc makes — that three interleaved
  * probe-then-upsert triggers land the exact index state of the one-shot
  * batch upsert. That parity is pinned here.
  */
class Round14OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("stream_ann_ivfpq ≡ the one-shot batch upsert recompute " +
      "(fixed codebooks make the 3-batch split associative)") {
    val streamed = graft.streaming.StreamGate.annIvfPqIncrementalStream(spark, sf)
    val batch = Similarity.annIvfPqUpsert(spark, sf)
    assertFrameEqual(streamed, batch, Seq("query_id", "rank"))
  }

  test("stream_ann_ivfpq is deterministic across runs") {
    val a = graft.streaming.StreamGate.annIvfPqIncrementalStream(spark, sf)
    val b = graft.streaming.StreamGate.annIvfPqIncrementalStream(spark, sf)
    assertFrameEqual(a, b, Seq("query_id", "rank"))
  }

  test("stream_dedup_lsh_pruned is deterministic across runs (and its " +
      "internal scan-audit requires hold)") {
    val a = graft.streaming.StreamGate.dedupLshPrunedStream(spark, sf)
    val b = graft.streaming.StreamGate.dedupLshPrunedStream(spark, sf)
    assertFrameEqual(a, b, Seq("doc_id"))
  }

  test("knnDescentConvergence: changed-edge counts decrease across rounds " +
      "and edge totals equal the kept graph size") {
    val rows = Similarity.knnDescentConvergence(spark, sf)
      .orderBy(col("round")).collect()
    assert(rows.length == 2)
    val changed = rows.map(_.getLong(1))
    assert(changed(1) < changed(0),
      s"descent must settle: changed ${changed.mkString(",")}")
    // every round keeps exactly k edges per live node — totals constant
    assert(rows.map(_.getLong(2)).distinct.length == 1)
    // and the instrument audits the SAME run the main gate returns: the
    // final graph size matches the reported edge total
    assert(Similarity.knnDescent(spark, sf).count() == rows.head.getLong(2))
  }

  test("bandIndexUpsert scan audit: a 5-doc batch's existing-rows scan " +
      "reads a strict subset of the 128-cell grid, bounded by touched") {
    import graft.operators.Dedup
    // clone the memoized corpus index — the upsert mutates its copy
    val work = java.nio.file.Files.createTempDirectory("graft-audittest")
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val srcP = new org.apache.hadoop.fs.Path(Dedup.bandIndexTable(spark, sf))
      val fs = srcP.getFileSystem(conf)
      val indexDir = s"$work/index"
      org.apache.hadoop.fs.FileUtil.copy(fs, srcP,
        fs, new org.apache.hadoop.fs.Path(indexDir), false, conf)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") % Dedup.IncrementalBatchMod === 3L)
        .orderBy(col("doc_id")).limit(5)
        .select(col("doc_id"), col("text"))
      var audit: Option[(Int, Int)] = None
      val touched = Dedup.bandIndexUpsert(spark, indexDir, docs,
        scanAudit = Some((r, t) => audit = Some((r, t))))
      val (read, total) = audit.get
      info(s"scan read $read of $total partitions, ${touched.size} touched")
      assert(read > 0 && read <= touched.size,
        s"read $read must be bounded by ${touched.size} touched cells")
      assert(read < total,
        s"pruned regime: read $read must be a strict subset of $total")
      // sanity: the grid really is the documented 16x8 layout here
      assert(total == 16 * Dedup.BandIndexBuckets,
        s"expected the full 128-cell grid, saw $total")
    } finally graft.io.Storage.deleteRecursively(work.toFile)
  }
}
