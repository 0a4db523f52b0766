package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Engine-side sf1 verification for the CC-chain gates (round-11 verdict
  * task 3). `dedup_groups`/`dedup_survivors` are DuckDB-unverifiable at
  * sf1 — the oracle's recursive-CC CTE spills >80 GB while the engine
  * finishes in seconds (SCALE.md round-10 epilogue) — so this check
  * replaces the oracle with an INDEPENDENT recomputation plus the
  * component-labeling invariants, over the real sf1 pair tier:
  *
  *  1. exact match vs an independent driver union-find (its own
  *     implementation, not [[Dedup.componentLabels]]) — labels AND sizes;
  *  2. the distributed star-contraction path (`smallCutoff = 0` forces it)
  *     produces identical labels — the 100 TB code path verified against
  *     the driver path on real data;
  *  3. endpoint agreement as a distributed join (every verified pair's two
  *     docs share a label) and label-minimality (every label = min doc_id
  *     of its group, and is itself a member);
  *  4. idempotence: adding the derived membership edges (doc → label) to
  *     the pair list changes nothing;
  *  5. survivors: exactly min-per-group keeps, singletons keep themselves,
  *     every document appears exactly once.
  *
  * Usage: CcSf1Check [sfDir]  (default /root/repo/target/sf1); exits 1 on
  * any violation. Log goes to target/ per the round-11 done-criterion.
  */
object CcSf1Check {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = 0
    def check(name: String)(ok: => Boolean): Unit = {
      val r = try ok catch { case t: Throwable =>
        println(s"ERROR $name: $t"); false }
      println(s"${if (r) "PASS" else "FAIL"}  $name")
      if (!r) failed += 1
    }

    val pairsDf = Dedup.minhashLsh(spark, sfDir)
      .select(col("id1"), col("id2"))
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"pair tier: ${pairs.length} verified near-dup pairs at $sfDir")

    val groupsDf = Dedup.nearDupGroups(spark, sfDir)
    val got = groupsDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"labeled docs: ${got.length}")

    // 1. independent recomputation: BFS over adjacency (NOT union-find —
    // a different algorithm than the engine's two paths)
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val expected = scala.collection.mutable.Map[Long, Long]()
    adj.keys.toSeq.sorted.foreach { start =>
      if (!expected.contains(start)) {
        val comp = scala.collection.mutable.ArrayBuffer[Long]()
        val q = scala.collection.mutable.Queue(start)
        val seen = scala.collection.mutable.Set(start)
        while (q.nonEmpty) {
          val x = q.dequeue(); comp += x
          adj(x).foreach(y => if (seen.add(y)) q.enqueue(y))
        }
        val label = comp.min
        comp.foreach(x => expected(x) = label)
      }
    }
    val expSizes = expected.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    check("labels match an independent BFS recomputation (exact, incl. sizes)") {
      got.length == expected.size && got.forall { case (d, l, s) =>
        expected.get(d).contains(l) && expSizes(l) == s
      }
    }

    // 2. the distributed star-contraction path on the same pairs
    check("star-contraction path (smallCutoff=0) emits identical labels") {
      val dist = Dedup.componentLabels(pairsDf, smallCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      dist.length == expected.size &&
        dist.forall { case (d, l) => expected.get(d).contains(l) }
    }

    // 3. invariants as distributed joins (the form that scales)
    val lab = groupsDf.select(col("doc_id"), col("group_id"))
    check("every pair's endpoints share a label (join pass over the pair tier)") {
      pairsDf
        .join(lab.withColumnRenamed("doc_id", "id1")
          .withColumnRenamed("group_id", "g1"), "id1")
        .join(lab.withColumnRenamed("doc_id", "id2")
          .withColumnRenamed("group_id", "g2"), "id2")
        .filter(col("g1") =!= col("g2")).count() == 0
    }
    check("every label is the min doc_id of its group AND a member of it") {
      lab.groupBy(col("group_id"))
        .agg(min(col("doc_id")).as("mn"),
          max(when(col("doc_id") === col("group_id"), 1L).otherwise(0L)).as("self"))
        .filter(col("mn") =!= col("group_id") || col("self") === 0L)
        .count() == 0
    }

    // 4. idempotence: membership edges change nothing
    check("re-running CC with the derived (doc,label) edges added changes nothing") {
      val again = Dedup.componentLabels(
        pairsDf.unionByName(lab.toDF("id1", "id2")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      again.length == expected.size &&
        again.forall { case (d, l) => expected.get(d).contains(l) }
    }

    // 5. survivors over the full corpus
    val surv = Dedup.dedupSurvivors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nDocs = graft.operators.Tables.documents(spark, sfDir).count()
    check("survivors: every document exactly once; keep == (min of its " +
        "group | singleton); drop count == labeled minus groups") {
      surv.length == nDocs &&
        surv.map(_._1).distinct.length == nDocs &&
        surv.forall { case (d, g, keep) =>
          expected.get(d) match {
            case Some(l) => g == l && keep == (d == l)
            case None => g == d && keep
          }
        } &&
        surv.count(!_._3) == expected.size - expSizes.size
    }

    // 6. quality-pick survivors (dedup_survivors_quality — the third
    // CC-chain gate whose DuckDB twin embeds the recursive-CC CTE and is
    // therefore sf1-infeasible): keep ⇔ argmax(quality_score, min doc_id
    // tiebreak) within the independent component (singletons keep)
    val sq = Dedup.dedupSurvivorsQuality(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    check("quality survivors: keep == argmax(quality, min-id tiebreak) per " +
        "independent component; labels agree; every document exactly once") {
      val qual = sq.map(t => t._1 -> t._3).toMap
      val byComp = sq.groupBy { case (d, _, _, _) => expected.getOrElse(d, d) }
      sq.length == nDocs && sq.map(_._1).distinct.length == nDocs &&
        sq.forall { case (d, g, _, _) => g == expected.getOrElse(d, d) } &&
        byComp.forall { case (_, members) =>
          val best = members.map(_._1).minBy(d => (-qual(d), d))
          members.forall { case (d, _, _, keep) => keep == (d == best) }
        }
    }

    println(if (failed == 0) s"ALL CHECKS PASS ($sfDir)"
      else s"$failed CHECK(S) FAILED ($sfDir)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
