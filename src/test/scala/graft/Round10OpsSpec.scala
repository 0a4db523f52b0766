package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}

/** Round-10 operator specs: the cross-modal consensus near-dup gate. */
class Round10OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("mm_crossmodal_consensus: tiers recompute from the two verified " +
      "pair tiers; every pair is in at least one tier; variants dominate " +
      "the consensus tier") {
    import spark.implicits._
    val out = Multimodal.crossModalConsensus(spark, sf).collect()
    assert(out.nonEmpty)

    // recompute the expected label for every row from the gate's OWN
    // verified inputs (image pairs + caption LSH pairs + the congruence
    // caption assignment), independently of the gate's join shape
    val imgPairs = Multimodal.pngNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lshDocs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = graft.operators.Tables.documents(spark, sf).count()
    val off = 1000000L
    val itemIds = (0L until 400L) ++ (0L until 400L).filter(_ % 5 == 0).map(_ + off)
    def capDoc(id: Long): Long = {
      val eff = id % off
      if (id >= off && eff % 7 == 0) (eff + 1) % nDocs else eff % nDocs
    }
    def capMatch(a: Long, b: Long): Boolean = {
      val (ca, cb) = (capDoc(a), capDoc(b))
      ca == cb || lshDocs.contains((math.min(ca, cb), math.max(ca, cb)))
    }
    val tiers = out.map { r =>
      val (id1, id2) = (r.getLong(0), r.getLong(1))
      val isImg = imgPairs.contains((id1, id2))
      val isCap = capMatch(id1, id2)
      assert(r.getAs[Boolean]("cap_match") == isCap, s"cap_match ($id1,$id2)")
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) ==
        imgPairs.get((id1, id2)), s"hamming ($id1,$id2)")
      val expected =
        if (isImg && isCap) "near_dup"
        else if (isImg) "review_image"
        else "review_caption"
      assert(isImg || isCap, s"pair ($id1,$id2) in neither tier")
      assert(r.getAs[String]("tier") == expected, s"tier ($id1,$id2)")
      expected
    }
    // completeness: every image pair and every caption-matching item pair
    // appears exactly once
    val outPairs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(outPairs.distinct.length == outPairs.length)
    assert(imgPairs.keySet.subsetOf(outPairs.toSet))
    val expectedCapPairs = (for {
      a <- itemIds; b <- itemIds if a < b && capMatch(a, b)
    } yield (a, b)).toSet
    assert(outPairs.toSet.filter(p => capMatch(p._1, p._2)) == expectedCapPairs)
    // all three tiers are populated at sf0.01 (the drifted-caption variants
    // create review_image; their landing docs create review_caption)
    assert(Set("near_dup", "review_image", "review_caption").subsetOf(tiers.toSet))
  }

  /** Collected (vec_id, label, vector) triples for plain-Scala recomputes. */
  private def collectedVecs(): Array[(Long, Long, Array[Double])] =
    graft.operators.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(label as long) as label",
        "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))

  test("sim_hard_negatives: triplets recompute from raw embeddings — " +
      "highest-cosine same/different-label neighbors, margin exact") {
    val out = Similarity.hardNegatives(spark, sf).collect()
    assert(out.length == 8)
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val vecs = collectedVecs()
    val byId = vecs.map(v => v._1 -> v).toMap
    out.foreach { r =>
      val a = r.getLong(0)
      val (_, al, av) = byId(a)
      val an = math.sqrt(av.map(x => x * x).sum)
      def cos(bv: Array[Double], bn: Double): Double = {
        var acc = 0.0; var i = 0
        while (i < av.length) { acc += av(i) * bv(i); i += 1 }
        round6(acc / (an * bn))
      }
      val scored = vecs.filter(_._1 != a).map { case (id, l, v) =>
        (id, l, cos(v, math.sqrt(v.map(x => x * x).sum)))
      }
      def top(pred: ((Long, Long, Double)) => Boolean): (Long, Double) = {
        val best = scored.filter(pred).maxBy { case (id, _, c) => (c, -id) }
        (best._1, best._3)
      }
      val (pid, pcos) = top(t => t._2 == al)
      val (nid, ncos) = top(t => t._2 != al)
      assert(r.getLong(1) == pid && r.getDouble(2) == pcos, s"pos of $a")
      assert(r.getLong(3) == nid && r.getDouble(4) == ncos, s"neg of $a")
      assert(r.getDouble(5) == pcos - ncos, s"margin of $a")
    }
  }

  test("sim_ann_ivfpq: residual-PQ recall@5 vs exact L2 matches or beats " +
      "raw-vector PQ; both plans ScalaUDF-free") {
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val vecs = collectedVecs()
      .filter { case (_, _, v) =>
        val sq = v.map(x => x * x).sum; sq > 0 && !sq.isNaN }
    def sqDist6(a: Array[Double], b: Array[Double]): Double = {
      var aa = 0.0; var ab = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1 }
      round6(aa - 2.0 * ab + bb)
    }
    val exactTop: Map[Long, Set[Long]] = (0L until 8L).map { q =>
      val qv = vecs.find(_._1 == q).get._3
      q -> vecs.filter(_._1 != q)
        .map { case (id, _, v) => (sqDist6(qv, v), id) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    // integer hit count out of 40 (8 queries x 5) — no float averaging
    def hits(df: org.apache.spark.sql.DataFrame): Int = {
      val got = df.collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet)
      (0L until 8L).map(q => (got.getOrElse(q, Set.empty) & exactTop(q)).size).sum
    }
    val ivfpq = Similarity.annIvfPq(spark, sf)
    val pq = Similarity.annPq(spark, sf)
    // full probe (nProbe = all cells) removes the IVF pruning so the
    // comparison isolates QUANTIZATION quality: residuals concentrate near
    // the origin, so the same 16-bit code budget must not regress vs raw
    val ivfpqFull = Similarity.annIvfPq(spark, sf,
      nProbe = Similarity.IvfPqCoarseK)
    val (hIvfPq, hIvfPqFull, hPq) = (hits(ivfpq), hits(ivfpqFull), hits(pq))
    info(s"hits/40: ivfpq(nProbe=2)=$hIvfPq ivfpq(full)=$hIvfPqFull pq=$hPq")
    assert(hIvfPqFull >= hPq, s"full-probe ivfpq $hIvfPqFull < pq $hPq")
    // default nProbe=2 of 4 trades recall for a pruned scan — floor it
    assert(hIvfPq >= 20, s"ivfpq recall floor: $hIvfPq/40")
    Seq("sim_ann_ivfpq" -> ivfpq,
        "sim_hard_negatives" -> Similarity.hardNegatives(spark, sf))
      .foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("ScalaUDF"), s"$name plans a ScalaUDF")
      }
  }

  test("sim_ann_ivfpq_tbl: the written-index form is cell-identical to " +
      "the in-plan form (coarse/books/codes round-trip parquet exactly)") {
    val inPlan = Similarity.annIvfPq(spark, sf).collect().map(_.toString).toSeq
    val fromTbl = Similarity.annIvfPqFromTable(spark, sf)
      .collect().map(_.toString).toSeq
    assert(inPlan.nonEmpty && inPlan == fromTbl)
  }
}
