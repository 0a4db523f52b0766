package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-13 maintenance-path upgrades: the doc→cells / id→cell SIDECARS
  * (verdict r12 task 2). Both maintained indexes now locate re-arriving
  * ids' old cells through an id-bucket-partitioned sidecar instead of
  * scanning the index; these tests pin (a) row-parity of the sidecar
  * locator with the scan locator it replaced, (b) the partition-pruned
  * plan shape of the sidecar probe, and (c) sidecar consistency with the
  * main table across cell-moving upserts. */
class Round13OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def vecs() = spark.read.parquet(s"$sf/embeddings.parquet")
    .selectExpr("vec_id", "cast(embedding as array<double>) as v")
    .where("aggregate(v, 0D, (acc, x) -> acc + x * x) > 0")

  // ---- dedup band index sidecar ----

  test("band-index old-cell locator: sidecar path ≡ scan path (same cell " +
      "multiset) and the sidecar probe is id-bucket partition-pruned") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sidecar-band").toString
    Dedup.writeBandIndex(spark, d, docs().filter(col("doc_id") < 400))
    // re-arriving ids in ONE id-bucket (doc_id ≡ 5 mod 16), so the pruned
    // probe must open exactly one sidecar partition
    val ids = spark.read.parquet(s"$d/cells").select(col("doc_id")).distinct()
      .filter(pmod(col("doc_id"), lit(16L)) === 5L)
    assert(ids.count() >= 2, "need re-arriving ids in idb=5")
    val viaSidecar = Dedup.oldCellsViaSidecar(spark, d, ids)
    val viaScan = Dedup.oldCellsViaScan(spark, d, ids)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Int)].collect().sorted.toSeq
    assert(cells(viaSidecar) == cells(viaScan),
      "sidecar locator must find exactly the scan locator's cells")
    val plan = viaSidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*idb".r.findFirstIn(plan).isDefined,
      s"idb must reach PartitionFilters:\n$plan")
    // only idb=5's files are read: every file path in the scan's partition
    // listing carries idb=5 (one partition of 16)
    val phys = viaSidecar.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scanNode = phys.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("cells")) => f
    }
    assert(scanNode.isDefined, s"no cells-side file scan in:\n$plan")
    val parts = scanNode.get.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(parts.nonEmpty && parts.forall(_.contains("idb=5")),
      s"pruned read must touch only idb=5 files: ${parts.toSeq}")
  }

  test("band-index sidecar stays consistent with rows/ across a " +
      "text-changing upsert (cells = distinct (doc_id, band, bkt) of rows)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sidecar-band2").toString
    Dedup.writeBandIndex(spark, d, docs().filter(col("doc_id") < 400))
    def proj(path: String, cols: Seq[String]) =
      spark.read.parquet(path).select(cols.map(col): _*)
        .as[(Long, Int, Int)].collect().sorted.toSeq
    def rowsProj() = proj(s"$d/rows", Seq("doc_id", "band", "bkt"))
    def cellsProj() = proj(s"$d/cells", Seq("doc_id", "band", "bkt"))
    assert(cellsProj() == rowsProj(), "post-build sidecar must mirror rows")

    // re-arrive the smallest id carrying a different doc's text: its band
    // rows move cells, and the sidecar must follow in the same upsert
    val ids = spark.read.parquet(s"$d/rows").select(col("doc_id")).distinct()
      .as[Long].collect().sorted
    val newA = docs().filter(col("doc_id") === ids(1))
      .select(lit(ids(0)).as("doc_id"), col("text"))
    Dedup.bandIndexUpsert(spark, d, newA)
    assert(cellsProj() == rowsProj(),
      "post-upsert sidecar must mirror rows (old entries replaced)")
    // and the locator finds the MOVED cells now
    val moved = Dedup.oldCellsViaSidecar(spark, d,
      Seq(ids(0)).toDF("doc_id")).as[(Int, Int)].collect().toSet
    val expect = spark.read.parquet(s"$d/rows")
      .filter(col("doc_id") === ids(0))
      .select(col("band"), col("bkt")).as[(Int, Int)].collect().toSet
    assert(moved == expect)
  }

  // ---- multi-trigger streaming dedup (probe ⇄ upsert interleave) ----

  test("dedupLshIncrementalStream detects a CROSS-BATCH dup the one-shot " +
      "index probe cannot, and equals the sequential batch recompute") {
    // fixture corpus: batch tranche = doc_id % 11 == 3, micro-batch =
    // doc_id % 3. Docs 25 (mb 1) and 14 (mb 2) share a text that exists
    // NOWHERE in the corpus — only an index maintained BETWEEN triggers
    // can match 14 → 25. Doc 47 (batch) duplicates corpus doc 7, the case
    // the one-shot probe already handles.
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "omicron sigma tau upsilon phi chi psi omega"
    val fixture = Files.createTempDirectory("graft-multidedup").toString
    import spark.implicits._
    Seq(
      (1L, "apple banana cherry date elderberry fig grape"),
      (2L, "red orange yellow green blue indigo violet"),
      (4L, "north south east west up down left right"),
      (5L, "iron copper silver gold platinum nickel zinc"),
      (7L, t2),
      (3L, "one two three four five six seven eight"), // mb 0
      (25L, t1),                                       // mb 1
      (14L, t1),                                       // mb 2: dups 25
      (47L, t2)                                        // mb 2: dups corpus 7
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$fixture/documents.parquet")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    val streamed = rows(
      graft.streaming.StreamGate.dedupLshIncrementalStream(spark, fixture))
    assert(streamed == Seq((14L, 25L, 1.0, 1L), (47L, 7L, 1.0, 1L)),
      s"got $streamed")
    // the one-shot probe (index = corpus only) must MISS the 14→25 pair
    val oneShot = rows(Dedup.dedupIncremental(spark, fixture))
    assert(oneShot == Seq((47L, 7L, 1.0, 1L)), s"got $oneShot")
    // and the streaming loop equals the sequential batch recompute
    val multi = rows(Dedup.dedupIncrementalMulti(spark, fixture))
    assert(streamed == multi)
  }

  test("dedupLshIncrementalStream ≡ dedupIncrementalMulti on the sf corpus") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val streamed = rows(
      graft.streaming.StreamGate.dedupLshIncrementalStream(spark, sf))
    val batch = rows(Dedup.dedupIncrementalMulti(spark, sf))
    assert(streamed.nonEmpty, "the sf0.001 batch tranche must match something")
    assert(streamed == batch)
  }

  // ---- exact-substring dedup ----

  test("dedupSubstring reports a known shared span with exact position " +
      "and length, via an equi-join (no cartesian) plan") {
    import spark.implicits._
    val fixture = Files.createTempDirectory("graft-substr").toString
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    Seq(
      (1L, s"a1 a2 a3 a4 $shared t1 t2 t3"),
      (2L, s"b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 $shared u1 u2"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12")
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$fixture/documents.parquet")
    val out = Dedup.dedupSubstring(spark, fixture)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1 carries the span at 1-based position 5, doc 2 at position 11,
    // exactly 30 tokens; doc 3 shares nothing
    assert(rows.toSeq == Seq((1L, 2L, 5L, 11L, 30L)), s"got ${rows.toSeq}")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the gram match must be an equi-join:\n$plan")
  }

  test("dedupSubstring's posting cap drops boilerplate grams: a gram in " +
      "33 docs yields no pairs, one in 2 docs yields its span") {
    import spark.implicits._
    val fixture = Files.createTempDirectory("graft-substr-cap").toString
    val boiler = (1 to 8).map(i => s"c$i").mkString(" ") // 33 postings > cap 32
    val rare = (1 to 8).map(i => s"d$i").mkString(" ")   // 2 postings
    val docs = (100L until 133L).map(id => (id, boiler)) ++
      Seq((200L, rare), (201L, rare))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$fixture/documents.parquet")
    val rows = Dedup.dedupSubstring(spark, fixture, minSpan = 8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((200L, 201L, 1L, 1L, 8L)), s"got ${rows.toSeq}")
  }

  // ---- native Hilbert expression ----

  test("HilbertIndexExpr matches the kernel under FORCED codegen (no " +
      "silent interpreted fallback) and the gate plan carries no ScalaUDF") {
    import spark.implicits._
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    try {
      // CODEGEN_ONLY turns a janino compile failure (e.g. a missing static
      // forwarder for the kernel) into a hard error instead of a silent
      // interpreted fallback
      spark.conf.set(key, "CODEGEN_ONLY")
      val pts = Seq((0L, 0L), (1L, 0L), (65535L, 65535L), (12345L, 54321L),
        (32768L, 32767L))
      val got = pts.toDF("x", "y")
        .select(graft.functions.HilbertExpressions
          .hilbertIndex(col("x"), col("y")).as("d"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == pts.map { case (x, y) =>
        graft.operators.Bucketing.hilbertIndex(x, y) })
    } finally spark.conf.set(key, prev)
    val plan = graft.operators.Bucketing.hilbertKeys(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("hilbert_index"),
      s"q_hilbert must run the native expression:\n$plan")
  }

  // ---- IVF-PQ id→cell sidecar ----

  test("IVF-PQ old-cell locator: sidecar ≡ codes-scan, idb-pruned plan, " +
      "and the sidecar tracks a cell-moving upsert") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sidecar-ivf").toString
    Similarity.buildIvfPqIndex(spark, d, vecs())
    val ids = spark.read.parquet(s"$d/idcells").select(col("vec_id"))
      .distinct().filter(pmod(col("vec_id"), lit(16L)) === 3L)
    assert(ids.count() >= 1, "need ids in idb=3")
    def cls(df: org.apache.spark.sql.DataFrame) =
      df.as[Long].collect().sorted.toSeq
    val viaSidecar = Similarity.ivfOldCellsViaSidecar(spark, d, ids)
    assert(cls(viaSidecar) == cls(Similarity.ivfOldCellsViaScan(spark, d, ids)))
    val plan = viaSidecar.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*idb".r.findFirstIn(plan).isDefined,
      s"idb must reach PartitionFilters:\n$plan")

    // move one id onto another's vector (different coarse cell) — the
    // sidecar must report the NEW cell afterwards, and stay row-consistent
    // with codes/
    val codes0 = spark.read.parquet(s"$d/codes")
      .select(col("vec_id"), col("cl")).as[(Long, Long)].collect().toMap
    val byCell = codes0.groupBy(_._2)
    assert(byCell.size >= 2)
    val idA = byCell(byCell.keys.min).keys.min
    val idB = byCell(byCell.keys.max).keys.min
    val vB = vecs().filter(col("vec_id") === idB)
      .select(col("v")).as[Seq[Double]].head()
    Similarity.ivfPqUpsertCodes(spark, d, Seq((idA, vB)).toDF("vec_id", "v"))
    val side = spark.read.parquet(s"$d/idcells")
      .select(col("vec_id"), col("cl")).as[(Long, Long)].collect().toSeq
    val main = spark.read.parquet(s"$d/codes")
      .select(col("vec_id"), col("cl")).as[(Long, Long)].collect().toSeq
    assert(side.sorted == main.sorted,
      "sidecar must mirror codes/ after a cell-moving upsert")
    assert(side.toMap.apply(idA) == codes0(idB),
      "the moved id's sidecar entry must carry the new cell")
  }
}
