package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-11 operators: incremental (batch-vs-corpus) dedup. */
class Round11OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("dedup_incremental's matched pairs are EXACTLY the minhashLsh pairs " +
      "that cross the batch boundary (shared tier by construction), and " +
      "each new doc reports its max-jaccard min-id match") {
    val mod = Dedup.IncrementalBatchMod
    def inBatch(id: Long) = id % mod == 3L
    // full-tier pairs, restricted to those with exactly one batch endpoint
    val full = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    val crossing = full.filter { case (a, b, _) => inBatch(a) ^ inBatch(b) }
      .map { case (a, b, j) =>
        if (inBatch(a)) (a, b, j) else (b, a, j) // (new, corpus, jaccard)
      }
    val expected = crossing.groupBy(_._1).map { case (nid, ms) =>
      val best = ms.minBy { case (_, cid, j) => (-j, cid) }
      nid -> (best._2, best._3, ms.length.toLong)
    }
    val got = Dedup.dedupIncremental(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("jaccard"), r.getLong(3)))
      .toMap
    assert(got.nonEmpty, "the sf0.001 corpus must yield crossing pairs")
    assert(got == expected,
      s"incremental matches must equal the boundary-crossing full-tier pairs")
  }

  // (no plan-shape pin: the operator returns a materialized frame, so its
  // executed plan is the checkpoint scan; the one-sided candidate shape is
  // proven semantically above — the match set equals exactly the boundary-
  // crossing subset of the full tier, which an unfiltered self-join could
  // not produce without also surfacing within-corpus pairs)
}
