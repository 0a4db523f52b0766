package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.annIvfPqUpsert]] / [[Similarity.ivfPqUpsertCodes]] — index
  * maintenance for the IVF-PQ table: late arrivals encoded with the
  * EXISTING codebooks, touched coarse cells rewritten partition-pruned. */
class IvfPqUpsertSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** embeddings with the gate's vector hygiene (zero / NaN norms dropped —
    * NaN > 0 is false, so one predicate covers both). */
  private def vecs() = spark.read.parquet(s"$sf/embeddings.parquet")
    .selectExpr("vec_id", "cast(embedding as array<double>) as v")
    .where("aggregate(v, 0D, (acc, x) -> acc + x * x) > 0")

  test("recall parity: the upsert-maintained index matches a full rebuild " +
      "against the exact L2 ground truth") {
    val all = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val k = 5
    val exact: Map[Long, Set[Long]] = (0L until 8L).map { q =>
      val qv = all(q)
      q -> all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (l2(qv, v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          rs.count(r => exact(q)(r.getLong(1))).toDouble / k
        }
      got.sum / got.size
    }
    val rUp = recall(Similarity.annIvfPqUpsert(spark, sf))
    val rFull = recall(Similarity.annIvfPqFromTable(spark, sf))
    info(f"recall@5: upsert=$rUp%.3f fullRebuild=$rFull%.3f")
    // the upsert index quantizes the same corpus with base-fit codebooks —
    // a ~2% smaller fit sample must not cost recall beyond noise
    assert(rUp > 0.4, s"upsert recall degenerate: $rUp")
    assert((rUp - rFull).abs <= 0.2,
      s"upsert recall $rUp drifted from full-rebuild recall $rFull")
  }

  test("the upsert rewrites ONLY the touched coarse cells: untouched cl= " +
      "partitions keep their exact files") {
    val d = Files.createTempDirectory("graft-upsert-spec").toString
    val e = vecs()
    Similarity.buildIvfPqIndex(spark, d, e.filter(col("vec_id") =!= 42L))

    def partFiles(): Map[String, Set[(String, Long)]] = {
      val base = new org.apache.hadoop.fs.Path(s"$d/codes")
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = scala.collection.mutable.Map[String, Set[(String, Long)]]()
        .withDefaultValue(Set.empty)
      val it = fs.listFiles(base, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val cl = st.getPath.getParent.getName // cl=N
          out(cl) = out(cl) + ((st.getPath.getName, st.getLen))
        }
      }
      out.toMap
    }
    val before = partFiles()
    val nBefore = spark.read.parquet(s"$d/codes").count()

    val touched = Similarity.ivfPqUpsertCodes(spark, d,
      e.filter(col("vec_id") === 42L))
    assert(touched.size == 1, s"a 1-vector batch touches 1 cell: $touched")

    val after = partFiles()
    val touchedDir = s"cl=${touched.head}"
    assert(before.keySet.subsetOf(after.keySet))
    before.foreach { case (cl, files) =>
      if (cl == touchedDir)
        assert(after(cl) != files, s"touched cell $cl must be rewritten")
      else
        assert(after(cl) == files,
          s"untouched cell $cl was rewritten: ${files} vs ${after(cl)}")
    }
    // the maintained table carries the upserted vector exactly once
    val codes = spark.read.parquet(s"$d/codes")
    assert(codes.count() == nBefore + 1)
    assert(codes.filter(col("vec_id") === 42L).count() == 1)
    // and a second identical upsert is a plain overwrite, not a duplicate
    Similarity.ivfPqUpsertCodes(spark, d, e.filter(col("vec_id") === 42L))
    assert(spark.read.parquet(s"$d/codes")
      .filter(col("vec_id") === 42L).count() == 1)
  }

  test("a re-arriving vec_id that re-assigns to a DIFFERENT coarse cell " +
      "replaces its old row (no cross-cell duplicate), and a cell emptied " +
      "by the move loses its partition directory") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-upsert-move").toString
    Similarity.buildIvfPqIndex(spark, d, vecs())
    val codes0 = spark.read.parquet(s"$d/codes")
      .select(col("vec_id"), col("cl")).as[(Long, Long)].collect().toMap
    // pick two ids stored in different cells; move A onto B's vector, so
    // A's new assignment is exactly B's cell (assignL2 is deterministic on
    // identical vectors against the same codebook)
    val byCell = codes0.groupBy(_._2)
    assert(byCell.size >= 2, "need at least two coarse cells for this test")
    val cellA = byCell.keys.min
    val cellB = byCell.keys.max
    val idA = byCell(cellA).keys.min
    val idB = byCell(cellB).keys.min
    val vB = vecs().filter(col("vec_id") === idB)
      .select(col("v")).as[Seq[Double]].head()
    val movedBatch = Seq((idA, vB)).toDF("vec_id", "v")
    val touched = Similarity.ivfPqUpsertCodes(spark, d, movedBatch)
    assert(touched.contains(cellA) && touched.contains(cellB),
      s"both the old cell $cellA and the new cell $cellB must be touched: $touched")
    val codes1 = spark.read.parquet(s"$d/codes")
      .select(col("vec_id"), col("cl")).as[(Long, Long)].collect()
    val rowsA = codes1.filter(_._1 == idA)
    assert(rowsA.length == 1,
      s"vec_id $idA must appear exactly once after the move: ${rowsA.toSeq}")
    assert(rowsA.head._2 == cellB, s"vec_id $idA must live in cell $cellB now")
    assert(codes1.length == codes0.size, "the move must not change the row count")

    // now empty cellA entirely: move EVERY remaining id of cellA onto vB
    val remaining = spark.read.parquet(s"$d/codes")
      .filter(col("cl") === cellA).select(col("vec_id")).as[Long].collect()
    if (remaining.nonEmpty) {
      Similarity.ivfPqUpsertCodes(spark, d,
        remaining.toSeq.toDF("vec_id").crossJoin(Seq(Tuple1(vB)).toDF("v")))
    }
    val fs = new org.apache.hadoop.fs.Path(s"$d/codes")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/codes/cl=$cellA")),
      "an emptied cell's stale partition dir must be deleted")
    assert(spark.read.parquet(s"$d/codes").filter(col("cl") === cellA).count() == 0)
    assert(spark.read.parquet(s"$d/codes").count() == codes0.size)
  }
}
