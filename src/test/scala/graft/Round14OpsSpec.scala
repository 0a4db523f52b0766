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
}
