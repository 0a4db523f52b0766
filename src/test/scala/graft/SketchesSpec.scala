package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Semantic properties of the round-4 sketch/statistics operators and the
  * passage/index/streaming additions — the bits the DuckDB hash gate can't
  * express: estimator error bounds, flag-set completeness, and equivalence
  * to independently-computed exact answers. */
class SketchesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("KMV approx distinct: exact for under-k groups, bounded error else") {
    val rows = Sketches.approxDistinctKmv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_distinct")
      if (n < 16) assert(est == n.toDouble, s"under-k group must be exact: $r")
      // k=16 → relative stderr ≈ 1/sqrt(k-2) ≈ 0.27; allow 3σ
      else assert(math.abs(est - n) / n < 0.82, s"estimate off: $r")
    }
  }

  test("every SparkEntry query has an oracle twin (and no orphan oracles)") {
    // a queries entry without oracleSql silently downgrades the driver's
    // check to rows-only; an oracleSql without a query is dead SQL — both
    // are authoring bugs this pins at suite speed
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"queries-only: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"oracles-only: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("qsketch percentile: full sample is capped at k and error-bounded; " +
      "under-k groups are exact") {
    val rows = Sketches.approxPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val m = r.getAs[Long]("m_sample")
      assert(m == math.min(n, 256L), s"sample size must be min(n, k): $r")
      if (n <= 256)
        assert(r.getAs[Double]("rel_err_p50") == 0.0 &&
          r.getAs[Double]("rel_err_p95") == 0.0,
          s"under-k group: sample IS the group, estimates must be exact: $r")
      else {
        // rank error ~ sqrt(1/2k) ≈ 4.4% at k=256; prices are roughly
        // uniform so value error tracks rank error — allow a wide 3σ band
        assert(r.getAs[Double]("rel_err_p50") < 0.25, s"p50 off: $r")
        assert(r.getAs[Double]("rel_err_p95") < 0.25, s"p95 off: $r")
      }
    }
  }

  test("estimate-only KMV agrees with the error-probe form's estimates") {
    val probe = Sketches.approxDistinctKmv(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    val est = Sketches.approxDistinctKmvEstimate(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    // same sketch, same estimator — the only difference is under-k
    // fallback source (k_n vs n_exact), identical when the sketch holds
    // the full set (distinct hashes == distinct keys, collision-free at
    // this scale)
    assert(est == probe, s"estimate-only form diverged: $est vs $probe")
  }

  test("heavy hitters: flagged set is exactly the >1.2x-mean keys") {
    val flagged = Sketches.heavyHitters(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    val counts = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val u = counts.size
    val expect = counts.filter { case (_, c) => 5 * c * u > 6 * total }
    assert(flagged == expect,
      s"flag set mismatch: got ${flagged.keySet} want ${expect.keySet}")
  }

  test("disc percentiles match direct sorted-array indexing per group") {
    val rows = Sketches.medianDisc(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSet == li.keySet)
    rows.foreach { r =>
      val vals = li(r.getString(0)).map(_.getDouble(1)).sorted
      val n = vals.length
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("p50_disc") == vals((n + 1) / 2 - 1))
      assert(r.getAs[Double]("p95_disc") == vals((19 * n + 19) / 20 - 1))
    }
  }

  test("bloom join result is identical to the plain semi-join") {
    val viaBloom = Sketches.bloomJoin(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        Tables.exactSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("l_returnflag"))
    assertFrameEqual(viaBloom, plain, Seq("l_returnflag"))
  }

  test("passage dedup agrees with direct passage-string grouping") {
    val viaHash = Dedup.passageDedup(spark, sf).collect()
    // independent recomputation: group by the passage STRING, no hashing
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("t")) - 8),
        i => array_join(slice(col("t"), i + 1, lit(8)), " "))).as("p"))
    val direct = toks.groupBy(col("p"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2).collect()
    assert(viaHash.length == direct.length,
      s"${viaHash.length} hash groups vs ${direct.length} string groups")
    assert(viaHash.map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).sorted.toSeq ==
      direct.map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).sorted.toSeq)
    viaHash.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("min_doc") < r.getAs[Long]("max_doc"))
    }
  }

  test("inverted index: postings sorted, capped, df consistent") {
    val rows = TextAnalysis.invertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val df = r.getAs[Long]("n_docs")
      val postings = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(postings.length == math.min(df, 20L).toInt)
      assert(postings.sameElements(postings.sorted), s"unsorted: $r")
      assert(df <= nDocs)
    }
    // spot-check one term's df against a direct count
    val term = rows.head.getAs[String]("term")
    val direct = Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), term)).count()
    assert(rows.head.getAs[Long]("n_docs") == direct)
  }

  test("cube grouping sets reconcile: each lattice level sums to the total") {
    val rows = QuerySurface.cubeCounts(spark, sf).collect()
    val total = rows.filter(r =>
      r.getString(0) == "ALL" && r.getLong(1) == -1L)
    assert(total.length == 1)
    val n = total.head.getAs[Long]("n")
    // level (type, ALL-days), level (ALL, day), and leaf level each sum to n
    val byType = rows.filter(r => r.getString(0) != "ALL" && r.getLong(1) == -1L)
    val byDay = rows.filter(r => r.getString(0) == "ALL" && r.getLong(1) != -1L)
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getLong(1) != -1L)
    assert(byType.map(_.getAs[Long]("n")).sum == n)
    assert(byDay.map(_.getAs[Long]("n")).sum == n)
    assert(leaves.map(_.getAs[Long]("n")).sum == n)
  }

  test("random projection: deterministic and JL-contractive on average") {
    val a = Similarity.randomProjection(spark, sf).collect()
    val b = Similarity.randomProjection(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "not deterministic")
    assert(a.nonEmpty && a.head.length == 9) // vec_id + 8 coords
    // projected coordinates must not all collapse to zero, and must vary
    val p1 = a.map(_.getAs[Double]("p1"))
    assert(p1.distinct.length > a.length / 2, "projection collapsed")
  }

  test("streaming dedup emits exactly the batch-distinct key set") {
    val streamed = graft.streaming.StreamGate.dedupKeys(spark, sf)
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))
    assertFrameEqual(streamed, batch, Seq("user_id", "event_type"))
  }
}
