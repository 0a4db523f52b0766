package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.{Sampling, Similarity, Tables}

/** Round-7 ninth-batch operators: dedup-threshold sensitivity curve and
  * class-balanced sampling. From-scratch recomputes. */
class Round7iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("threshold curve: pair/doc counts per cutoff match a brute-force recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter { case (_, v) =>
        val d = v.map(x => x * x).sum; d > 0 && !d.isNaN
      }
    val pairs = for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      (ia, va) = vecs(i); (ib, vb) = vecs(j)
      dot = va.zip(vb).map { case (a, b) => a * b }.sum
      cos = r6(dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum)))
      if cos >= 0.4
    } yield (math.min(ia, ib), math.max(ia, ib), cos)
    val expected = Similarity.CurveThresholds.map { t =>
      val f = pairs.filter(_._3 >= t)
      (t, f.size.toLong,
        f.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }
    val got = Similarity.thresholdCurve(spark, sf).collect().map(r =>
      (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // monotone: higher threshold never yields more pairs
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("balanced sample: every class cut to the min class size by hash rank") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byLabel = rows.groupBy(_._2)
    val cap = byLabel.values.map(_.length).min
    val expected = byLabel.toSeq.flatMap { case (lbl, vs) =>
      vs.map(v => (v._1, lbl, PortableHash.md5Lower63("bal:" + v._1)))
        .sortBy(t => (t._3, t._1)).take(cap)
        .map(t => (t._1, lbl))
    }.sortBy(t => (t._2, t._1))
    val got = Sampling.sampleBalanced(spark, sf).collect().map(r =>
      (r.getLong(0), r.getInt(1))).toSeq
    assert(got == expected)
    // every class present with exactly `cap` members
    val sizes = got.groupBy(_._2).values.map(_.size).toSet
    assert(sizes == Set(cap))
    assert(got.map(_._2).distinct.size == byLabel.size)
  }
}
