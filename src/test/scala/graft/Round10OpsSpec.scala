package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

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
}
