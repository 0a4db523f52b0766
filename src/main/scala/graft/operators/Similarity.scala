package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers:
  *   - [[cosinePairs]] / [[topK]]: exact brute-force cosine — the correctness
  *     baseline. Cost O(n²·d); viable for candidate verification or small n.
  *   - [[annLsh]]: random-hyperplane LSH — sign-bit signatures bucket the
  *     vectors, candidates come only from the query's bucket. The scale path:
  *     one map pass to sign, a bucket-key shuffle, per-bucket brute force.
  *   - [[annIvf]]: IVF-style probe — k-means-ish coarse centroids (here the
  *     dataset's `label` clusters), queries probe the nProbe nearest
  *     centroids and search only those inverted lists. At 100 TB this is the
  *     architecture that keeps per-query work sublinear: centroids are a tiny
  *     broadcast, lists are partition-pruned by centroid id.
  *
  * Determinism: dot products are left-fold `aggregate` over the index order
  * (no shuffle-order dependence); cosines are rounded to 6 decimals before
  * any threshold/ordering so last-ulp FP noise (engine- or plan-dependent
  * summation order in the oracle) can't flip a comparison.
  */
object Similarity {

  /** Left-to-right dot product: the join paths evaluate this O(candidates)
    * times. [[graft.functions.VectorExpressions.vectorDot]] is a native
    * Catalyst expression with `doGenCode` — a primitive `ArrayData` loop
    * fused into whole-stage codegen (no boxing, no catalyst→Row conversion;
    * Spark's array HOFs would run interpreted with boxed lambdas per
    * element). Accumulation order is index-ascending, computing the
    * *identical* double as the DuckDB oracle's list_dot_product. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vectorDot(a, b)

  /** embedding (float) → double vector + its L2 norm. Zero-norm vectors are
    * EXCLUDED (none exist in real embedding data): a zero norm makes every
    * cosine NaN, and engines disagree on NaN downstream (Spark's long-floor
    * in portableRound6 maps NaN→0, DuckDB keeps NaN and compares it greatest)
    * — filtering at the source removes the divergent path on both sides. */
  private def withVec(df: DataFrame): DataFrame =
    // spread the single-row-group embeddings scan (Tables.spreadIfNarrow)
    // before the per-vector arithmetic: the iterative consumers (k-means
    // fits, banded self-joins) otherwise run every cached scan as ONE task
    Tables.spreadIfNarrow(df, col("vec_id"))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0 && !isnan(col("nrm"))) // NaN compares greatest on BOTH engines — exclude explicitly

  private def cosine(va: Column, na: Column, vb: Column, nb: Column): Column =
    Tables.portableRound6(dot(va, vb) / (na * nb))

  /** round(x, 6) exactly as [[Tables.portableRound6]] (and the DuckDB
    * oracle) compute it — pure IEEE floor(x·10⁶ + 0.5)/10⁶; engines'
    * round(double, n) builtins disagree at string-vs-binary half
    * boundaries, this formula never does. */
  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** All-pairs cosine ≥ threshold (exact near-dup over embeddings).
    *
    * Block-partitioned pair generation — the classic triangle-blocking
    * shape, with NO driver-side collect anywhere: vectors are hashed into B
    * blocks (B sized so a block-pair fits one task's memory), each vector is
    * replicated to the B block-pairs containing its block, and every
    * unordered block-pair (i ≤ j) becomes one task that runs the tight
    * primitive-array kernel over its two sub-lists. Work is the inherent
    * O(n²·d) of an exact baseline, but it is spread over B(B+1)/2
    * independent tasks with O(n/B) memory each — the executors scale out
    * and the driver holds nothing. (A declarative BNLJ + per-pair array
    * UDF measured ~30 s at sf0.1 vs <1 s for the primitive kernel —
    * per-pair expression-eval overhead dwarfs the 64-FLOP dot product.)
    * At larger n the sublinear paths are [[annLsh]]/[[annIvf]]; this is the
    * exact baseline they are verified against. */
  def cosinePairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4, blockSize: Int = 4096): DataFrame = {
    import spark.implicits._
    // persist: the count below and the replication pass would otherwise each
    // re-read the parquet and recompute the vector parse + norms; released
    // before return via the materialize pattern
    val rows = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .persist()
    val n = rows.count()
    // enough blocks that (a) a block-pair fits in a task, (b) there are at
    // least ~2 tasks per core even on small inputs
    val minForParallelism =
      math.ceil((1 + math.sqrt(1 + 16.0 * spark.sparkContext.defaultParallelism)) / 2).toInt
    val nBlocks = math.max(math.ceil(n.toDouble / blockSize).toInt, minForParallelism)
    val rep = rows.flatMap { case (id, vs, nrm) =>
      val b = (id % nBlocks).toInt
      val v = vs.toArray
      (0 until nBlocks).iterator.map { o =>
        // Long key: nBlocks² overflows Int past ~46k blocks (~190M vectors)
        (math.min(b, o).toLong * nBlocks + math.max(b, o), b, id, v, nrm)
      }
    }
    val pairs = rep.groupByKey(_._1)
      .flatMapGroups { (key: Long, it: Iterator[(Long, Int, Long, Array[Double], Double)]) =>
        val i = (key / nBlocks).toInt
        val j = (key % nBlocks).toInt
        val buf = it.toArray
        def cosOf(a: (Long, Int, Long, Array[Double], Double),
            b: (Long, Int, Long, Array[Double], Double)): Double = {
          val (v1, v2) = (a._4, b._4)
          var acc = 0.0
          var x = 0
          while (x < v1.length) { acc += v1(x) * v2(x); x += 1 }
          round6(acc / (a._5 * b._5))
        }
        if (i == j) {
          // within-block: each unordered id pair once
          buf.iterator.flatMap { a =>
            buf.iterator.filter(b => b._3 > a._3).flatMap { b =>
              val c = cosOf(a, b)
              if (c >= threshold) Some((a._3, b._3, c)) else None
            }
          }
        } else {
          val left = buf.filter(_._2 == i)
          val right = buf.filter(_._2 == j)
          left.iterator.flatMap { a =>
            right.iterator.flatMap { b =>
              val c = cosOf(a, b)
              if (c >= threshold)
                Some((math.min(a._3, b._3), math.max(a._3, b._3), c))
              else None
            }
          }
        }
      }
      .toDF("id1", "id2", "cos")
    // pin the small pair set, release the cached vector table, sort lazily
    Tables.materializeAndRelease(pairs, rows.toDF())
      .orderBy(col("id1"), col("id2"))
  }

  /** Brute-force cosine top-k for the query set (vec_id < nQueries): the ANN
    * baseline. Ranking orders by the *rounded* cosine with vec_id tiebreak —
    * fully deterministic. */
  def topK(spark: SparkSession, sfDir: String, k: Int = 10,
      nQueries: Int = 8): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") < nQueries)
    val scored = broadcast(q).as("q").join(e.as("e"),
        col("q.vec_id") =!= col("e.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("e.vec_id").as("neighbor_id"),
        cosine(col("q.v"), col("q.nrm"), col("e.v"), col("e.nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding near-dup at scale: LSH-bucketed cosine pairs. Candidates come
    * only from vectors sharing a hyperplane-signature bucket (an O(n²)→
    * O(Σ bucket²) reduction; recall traded like any LSH), then exact cosine
    * verifies. Same output shape as [[cosinePairs]]. */
  def cosinePairsLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4, nPlanes: Int = 6): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
      .withColumn("sig", lshSignature(col("v"), nPlanes))
    e.as("a").join(e.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** Deterministic pseudo-random hyperplanes: values in [-1, 1) from a
    * fixed-seed PRNG, shipped as a literal (nPlanes × dim) matrix (and
    * inlined into the DuckDB oracle SQL as double literals — Double.toString
    * round-trips, so both engines evaluate the same IEEE doubles). */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int,
      seed: Int = 7): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Random-hyperplane LSH signature (one bit per plane, packed to a long).
    * `seed` picks the hyperplane set — distinct seeds give the independent
    * hash tables of multi-table LSH. */
  def lshSignature(v: Column, nPlanes: Int = 6, dim: Int = 64,
      seed: Int = 7): Column = {
    val planes = hyperplanes(nPlanes, dim, seed).map(_.toArray).toArray
    // native kernel expression — primitive ArrayData loop inside codegen,
    // replacing the boxed-Seq UDF this signature step used to pay per row
    graft.functions.VectorExpressions.planeSig(v, planes)
  }

  /** All XOR masks within Hamming distance `radius` of 0, ascending — the
    * multi-probe bucket set. nPlanes=6: radius 1 → 7 masks, radius 2 → 22. */
  private[operators] def probeMasks(nPlanes: Int, radius: Int): Seq[Long] =
    (0L until (1L << nPlanes)).filter(m => java.lang.Long.bitCount(m) <= radius)

  /** Multi-table, multi-probe LSH ANN: `nTables` independent hyperplane
    * sets (distinct PRNG seeds) each bucket the corpus; every query probes,
    * in EACH table, its own signature bucket plus every bucket within
    * Hamming distance `probeRadius` (bit-flip masks). A true neighbor is
    * found if ANY table keeps it within the probe radius — the OR over
    * independent tables is the classical LSH recall amplifier, and it buys
    * recall linearly in candidate cost where deeper single-table radii pay
    * combinatorially (C(nPlanes, r) new probes per radius step).
    *
    * Probing stays an EQUI-join on (table, signature) — queries explode to
    * (table, probe-signature) rows, the corpus explodes to its nTables
    * (table, signature) index entries — so at fleet scale this is a
    * broadcast of (queries × tables × probes) against L bucketed index
    * tables; candidates found by several tables collapse in one distinct.
    *
    * Recall@5 vs exact, measured at sf0.1 (PlanAudit, SCALE.md): 0.075
    * single-probe → 0.300 at 1 table/radius 1 (7 probes, 1,810 candidates)
    * → 0.500 at 1 table/radius 2 (22 probes, 5,517 candidates) → the
    * default 4 tables/radius 1 reaches the shippable coarse tier at ~4× the
    * radius-1 candidate count. Tables and radius are the two recall/cost
    * knobs; tables amplify independent views, radius digs deeper per view. */
  def annLsh(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 8, nPlanes: Int = 6, probeRadius: Int = 1,
      nTables: Int = 4): DataFrame = {
    val scored = annLshCandidates(spark, sfDir, nQueries, nPlanes, probeRadius,
      nTables)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-table seed: table t's hyperplane set. Table 0 is the historical
    * single-table seed, so nTables=1 reproduces the old signatures. */
  private[operators] def tableSeed(t: Int): Int = 7 + 31 * t

  /** The scored candidate set [[annLsh]] ranks — exposed so PlanAudit can
    * report the candidate count (the cost side of the recall/cost point)
    * without duplicating the probe pipeline. Distinct on the full row:
    * a neighbor surfaced by several tables scores identically (same
    * vectors, same IEEE dot product), so duplicates collapse exactly. */
  private[graft] def annLshCandidates(spark: SparkSession, sfDir: String,
      nQueries: Int = 8, nPlanes: Int = 6, probeRadius: Int = 1,
      nTables: Int = 4): DataFrame = {
    val tabled = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("t"),
            lshSignature(col("v"), nPlanes, seed = tableSeed(t)).as("s"))): _*))
          .as("b"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("b.t").as("t"), col("b.s").as("sig"))
    val probes = tabled.filter(col("vec_id") < nQueries)
      .withColumn("probe",
        explode(array(probeMasks(nPlanes, probeRadius)
          .map(m => col("sig").bitwiseXOR(lit(m))): _*)))
    broadcast(probes).as("q").join(tabled.as("e"),
        col("q.t") === col("e.t") && col("q.probe") === col("e.sig") &&
          col("q.vec_id") =!= col("e.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("e.vec_id").as("neighbor_id"),
        cosine(col("q.v"), col("q.nrm"), col("e.v"), col("e.nrm")).as("cos"))
      .distinct()
  }

  /** IVF-style ANN: coarse centroids = per-`label` mean vectors (stand-in for
    * a k-means codebook); each query probes its nProbe nearest centroids and
    * brute-forces only those inverted lists. Centroids are computed with one
    * posexplode + groupBy(label, dim) — a (labels × dim)-key shuffle — then
    * broadcast. */
  def annIvf(spark: SparkSession, sfDir: String, k: Int = 5, nProbe: Int = 2,
      nQueries: Int = 8): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
    ivfQuery(ivfCentroids(e), e, k, nProbe, nQueries)
  }

  /** The IVF codebook: per-label centroid vectors with norms. Centroid
    * components via exact decimal sums + round(…,6): FP addition is
    * not associative, so a raw avg() would differ across engines/partition
    * orders in the last ulps; the decimal path is order-independent and the
    * DuckDB oracle recomputes it bit-identically (sums < 2^53/10^6, so the
    * decimal→double cast is a single correctly-rounded step on both
    * engines). Shared by [[annIvf]] (derived in-plan) and
    * [[annIvfFromTable]] (materialized once, read per query). */
  private def ivfCentroids(e: DataFrame): DataFrame = e
    .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
    .groupBy(col("label"), col("pos"))
    .agg(Tables.exactAvg(col("x")).as("cx"))
    .groupBy(col("label"))
    .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
    .select(col("label").as("c_label"),
      transform(col("pcs"), p => p("cx")).as("cv"))
    .withColumn("c_nrm", sqrt(dot(col("cv"), col("cv"))))

  /** The IVF probe+score core over a codebook frame and a list table —
    * ONE definition for the in-plan and materialized-index forms, so the
    * `_tbl` twin audits the exact query the production path runs. */
  private def ivfQuery(centroids: DataFrame, e: DataFrame, k: Int,
      nProbe: Int, nQueries: Int): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("c_label"))
    val probed = q.as("q").crossJoin(broadcast(centroids))
      .select(col("q.vec_id").as("query_id"), col("q.v").as("qv"),
        col("q.nrm").as("qnrm"), col("c_label"),
        cosine(col("q.v"), col("q.nrm"), col("cv"), col("c_nrm")).as("c_cos"))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("c_label"))

    val scored = broadcast(probed).as("p").join(e.as("e"),
        col("p.c_label") === col("e.label") && col("p.query_id") =!= col("e.vec_id"))
      .select(col("query_id"), col("e.vec_id").as("neighbor_id"),
        cosine(col("p.qv"), col("p.qnrm"), col("e.v"), col("e.nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[annIvf]] fed from a MATERIALIZED vector index — the derive-once
    * read-per-analytic pattern (the backbone/bipartite/span-forest
    * precedent) extended to the ANN family: the codebook and the
    * list-assigned vector table are written as parquet ONCE per corpus
    * ([[MemoTables]] — in production, the nightly index build of a vector
    * store) and every query-time call only READS them. Results are
    * bit-identical to [[annIvf]] by construction (parquet round-trips
    * doubles exactly; the probe+score core is the shared [[ivfQuery]]),
    * so the gate reuses the same oracle — a green hash proves the index
    * round-trips exactly, and the gate exercises the scan path a
    * production query takes. */
  def annIvfFromTable(spark: SparkSession, sfDir: String, k: Int = 5,
      nProbe: Int = 2, nQueries: Int = 8): DataFrame = {
    val dir = MemoTables.dir(s"ivfindex:$sfDir", "graft-ivf-") { d =>
      val e = withVec(embeddings(spark, sfDir))
      ivfCentroids(e).write.mode("overwrite").parquet(s"$d/codebook")
      e.select(col("vec_id"), col("label"), col("v"), col("nrm"))
        .write.mode("overwrite").parquet(s"$d/lists")
    }
    ivfQuery(spark.read.parquet(s"$dir/codebook"),
      spark.read.parquet(s"$dir/lists"), k, nProbe, nQueries)
  }

  /** IVF with a REAL learned codebook: coarse centroids come from the
    * engine's own spherical k-means fit ([[Clustering.fit]]) instead of the
    * dataset's `label` column — the production IVF shape end to end
    * (fit codebook → assign inverted lists → probe nProbe lists per query).
    * The codebook is k·dim doubles on the driver (the MLlib pattern), list
    * assignment is one broadcast-codebook map pass, and the probe/search
    * join is identical to [[annIvf]]. At 100 TB the inverted lists are
    * written bucketed-by-cluster so a probe prunes partitions. */
  def annIvfKmeans(spark: SparkSession, sfDir: String, k: Int = 5,
      nProbe: Int = 2, nQueries: Int = 8, kClusters: Int = 8,
      kmIters: Int = 3): DataFrame = {
    import spark.implicits._
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    val codebook = Clustering.fit(e.select(col("vec_id"), col("v")), kClusters, kmIters)
    val lists = e.withColumn("a",
        graft.functions.VectorExpressions.assignCos(col("v"), codebook))
      .select(col("vec_id"), col("a._1").as("cluster"), col("v"), col("nrm"))

    val cents = codebook.zipWithIndex.map { case (c, cl) =>
      (cl, c.toSeq, math.sqrt(c.map(x => x * x).sum))
    }.toSeq.toDF("c_cl", "cv", "c_nrm")

    val q = e.filter(col("vec_id") < nQueries)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("c_cl"))
    val probed = q.as("q").crossJoin(broadcast(cents))
      .select(col("q.vec_id").as("query_id"), col("q.v").as("qv"),
        col("q.nrm").as("qnrm"), col("c_cl"),
        cosine(col("q.v"), col("q.nrm"), col("cv"), col("c_nrm")).as("c_cos"))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("c_cl"))

    val scored = broadcast(probed).as("p").join(lists.as("x"),
        col("p.c_cl") === col("x.cluster") && col("p.query_id") =!= col("x.vec_id"))
      .select(col("query_id"), col("x.vec_id").as("neighbor_id"),
        cosine(col("p.qv"), col("p.qnrm"), col("x.v"), col("x.nrm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
    Tables.materializeAndRelease(out, e.toDF())
      .orderBy(col("query_id"), col("rank"))
  }

  /** Int8 scalar quantization of the embedding table — the memory-budget
    * half of the 100 TB ANN story (IVF prunes the search, SQ shrinks the
    * lists 8×: 64 bytes/vector instead of 512). Per-dimension global
    * min/max (one 64-key aggregate, collected like a centroid codebook and
    * broadcast), then each component maps to
    * `floor((x−mn)/(mx−mn)·255 + 0.5)` — three IEEE ops, bit-identical on
    * any engine. Output per vector: an order-weighted integer checksum of
    * the codes (`Σ qᵢ·(131·i+1)` — exact integer arithmetic that pins every
    * code without array-dtype hazards in the gate), the code range, and the
    * max absolute reconstruction error (max is order-independent; rounded
    * to 6 decimals only at the end). */
  def quantize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val stats = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val mns = stats.map(_._2)
    val mxs = stats.map(_._3)
    // per-vector code stats as a native kernel over the broadcast (mn, mx)
    // ranges — same floor/clamp/accumulation as the former UDF, no boxing
    e.withColumn("q",
        graft.functions.VectorExpressions.quantizeStats(col("v"), mns, mxs))
      .select(col("vec_id"), col("q._1").as("q_checksum"), col("q._2").as("q_min"),
        col("q._3").as("q_max"), col("q._4").as("max_abs_err"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB twin of [[quantize]]. */
  def quantizeOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), d AS (
       |  SELECT vec_id, i, v[i] AS x FROM e, unnest(range(1, 65)) AS t(i)
       |), mm AS (
       |  SELECT i, min(x) AS mn, max(x) AS mx FROM d GROUP BY i
       |), q AS (
       |  SELECT vec_id, i, x, mn, mx,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(least(greatest(floor((x - mn) / (mx - mn) * 255 + 0.5), 0), 255) AS BIGINT)
       |    END AS qi
       |  FROM d JOIN mm USING (i)
       |), r AS (
       |  SELECT vec_id, i, qi,
       |    abs(x - (CASE WHEN mx = mn THEN mn ELSE mn + qi * (mx - mn) / 255 END)) AS err
       |  FROM q
       |)
       |SELECT vec_id,
       |  CAST(sum(qi * (131 * (i - 1) + 1)) AS BIGINT) AS q_checksum,
       |  CAST(min(qi) AS BIGINT) AS q_min,
       |  CAST(max(qi) AS BIGINT) AS q_max,
       |  ${Tables.portableRound6Sql("max(err)")} AS max_abs_err
       |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- DuckDB oracle SQL (hyperplanes/centroid math inlined) ---------------

  /** `sig` SQL expression over a DOUBLE[] column `vcol`: one bit per
    * hyperplane, bit p set iff dot(v, plane_p) > 0 — identical accumulation
    * order to [[lshSignature]] (list_dot_product is a left-to-right fold).
    * `seed` selects the hyperplane set, mirroring [[tableSeed]]. */
  private def sigSqlExpr(vcol: String, nPlanes: Int, seed: Int = 7): String =
    hyperplanes(nPlanes, 64, seed).zipWithIndex.map { case (plane, p) =>
      val lit = plane.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vcol, $lit) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB twin of [[cosinePairsLsh]]. */
  def cosinePairsLshOracleSql(threshold: Double = 0.4, nPlanes: Int = 6): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    ${sigSqlExpr("v", nPlanes)} AS sig
       |  FROM e WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  ${Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} AS cos
       |FROM n a JOIN n b ON a.sig = b.sig AND a.vec_id < b.vec_id
       |WHERE ${Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} >= $threshold
       |ORDER BY id1, id2""".stripMargin

  /** DuckDB twin of [[annLsh]]: per-table signature columns, a UNION ALL
    * index CTE (one (table, sig) entry per vector per table — the same
    * shape as the Spark side's explode), Hamming-`probeRadius` probe masks
    * per table, and a DISTINCT over (query, neighbor, cos) to collapse
    * candidates surfaced by several tables. */
  def annLshOracleSql(k: Int = 5, nQueries: Int = 8, nPlanes: Int = 6,
      probeRadius: Int = 1, nTables: Int = 4): String = {
    val masks = probeMasks(nPlanes, probeRadius).mkString("[", ", ", "]")
    val sigCols = (0 until nTables).map(t =>
      s"${sigSqlExpr("v", nPlanes, tableSeed(t))} AS sig$t").mkString(",\n    ")
    val index = (0 until nTables).map(t =>
      s"SELECT vec_id, v, nrm, $t AS t, sig$t AS sig FROM n")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    $sigCols
       |  FROM e WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), b AS (
       |  $index
       |), pr AS (
       |  SELECT vec_id, v, nrm, t, xor(sig, CAST(m.f AS BIGINT)) AS probe
       |  FROM b, unnest($masks) AS m(f)
       |  WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT DISTINCT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |    ${Tables.portableRound6Sql("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos
       |  FROM pr q JOIN b x
       |    ON q.t = x.t AND q.probe = x.sig AND q.vec_id <> x.vec_id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, cos
       |FROM r WHERE rnk <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[annIvfKmeans]]: the unrolled k-means fit CTEs
    * ([[Clustering.kmeansCtes]], ending in the fitted codebook `cnF`), final
    * list assignment, probe, and search. */
  def annIvfKmeansOracleSql(k: Int = 5, nProbe: Int = 2, nQueries: Int = 8,
      kClusters: Int = 8, kmIters: Int = 3): String = {
    val probeCos = Tables.portableRound6Sql(
      "list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")
    s"""WITH ${Clustering.kmeansCtes(kClusters, kmIters, filterZeroNorm = true)}
       |, asgF AS (
       |  SELECT vec_id, cl FROM (
       |    SELECT q.vec_id, c.cl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        $probeCos DESC, c.cl) AS rnk
       |    FROM n q CROSS JOIN cnF c
       |  ) WHERE rnk = 1
       |), probed AS (
       |  SELECT query_id, cl FROM (
       |    SELECT q.vec_id AS query_id, c.cl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        $probeCos DESC, c.cl) AS probe_rank
       |    FROM n q CROSS JOIN cnF c WHERE q.vec_id < $nQueries
       |  ) WHERE probe_rank <= $nProbe
       |), s AS (
       |  SELECT p.query_id, x.vec_id AS neighbor_id,
       |    ${Tables.portableRound6Sql("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos
       |  FROM probed p
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN asgF a ON a.cl = p.cl
       |  JOIN n x ON x.vec_id = a.vec_id AND x.vec_id <> p.query_id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, cos
       |FROM r WHERE rnk <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of [[annIvf]]: per-label centroids from exact decimal sums
    * (order-independent; the decimal→double cast is a single correctly-
    * rounded step on both engines since the sums stay < 2^53/10^6), probe
    * the nProbe nearest centroids, brute-force those inverted lists. */
  def annIvfOracleSql(k: Int = 5, nProbe: Int = 2, nQueries: Int = 8): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), cent AS (
       |  SELECT label, i,
       |    ${Tables.portableRound6Sql("CAST(SUM(CAST(v[i] AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)")} AS cx
       |  FROM n, unnest(range(1, 65)) AS t(i)
       |  GROUP BY label, i
       |), cv AS (
       |  SELECT label AS c_label, list(cx ORDER BY i) AS cv FROM cent GROUP BY label
       |), cn AS (
       |  SELECT c_label, cv, sqrt(list_dot_product(cv, cv)) AS c_nrm FROM cv
       |), probed AS (
       |  SELECT query_id, c_label FROM (
       |    SELECT q.vec_id AS query_id, cn.c_label,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${Tables.portableRound6Sql("list_dot_product(q.v, cn.cv) / (q.nrm * cn.c_nrm)")} DESC,
       |        cn.c_label) AS probe_rank
       |    FROM n q CROSS JOIN cn WHERE q.vec_id < $nQueries
       |  ) WHERE probe_rank <= $nProbe
       |), s AS (
       |  SELECT p.query_id, x.vec_id AS neighbor_id,
       |    ${Tables.portableRound6Sql("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos
       |  FROM probed p
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN n x ON x.label = p.c_label AND x.vec_id <> p.query_id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, cos
       |FROM r WHERE rnk <= $k ORDER BY query_id, rank""".stripMargin

  // ---- Johnson–Lindenstrauss random projection -----------------------------

  private val RpDims = 8

  /** Seeded signed-uniform projection matrix (8 × 64), distinct seed from
    * the LSH [[hyperplanes]]. Inlined as literals into both the Spark plan
    * and the oracle SQL, like the hyperplanes. */
  private[operators] def rpPlanes(nOut: Int = RpDims, dim: Int = 64): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(13)
    Seq.fill(nOut)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Johnson–Lindenstrauss random projection: every 64-d embedding mapped to
    * 8 signed-uniform projection coordinates — the dimensionality-reduction
    * step in front of a coarse index (project → bucket/search in 8-d →
    * exact-rerank in 64-d), and the real-valued generalization of the
    * sign-only [[lshSignature]]. Each coordinate is one [[dot]] against a
    * literal plane: a pure codegen'd map over the scan, no shuffle, no
    * broadcast (the 8×64 matrix lives in the plan), so at 100 TB this runs
    * at scan speed and shrinks what the downstream index must hold by 8×.
    * Coordinates are portableRound6-rounded only at output (the projection
    * itself is left-fold IEEE — bit-identical to `list_dot_product`). */
  def randomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val planes = rpPlanes()
    val e = embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val projCols = planes.zipWithIndex.map { case (plane, j) =>
      Tables.portableRound6(dot(col("v"), typedLit(plane))).as(s"p${j + 1}")
    }
    e.select(col("vec_id") +: projCols: _*).orderBy(col("vec_id"))
  }

  /** DuckDB twin of [[randomProjection]] (plane literals inlined). */
  def randomProjectionOracleSql: String = {
    val projExprs = rpPlanes().zipWithIndex.map { case (plane, j) =>
      val lit = plane.map(_.toString).mkString("[", ", ", "]")
      s"${Tables.portableRound6Sql(s"list_dot_product(v, $lit)")} AS p${j + 1}"
    }.mkString(",\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |)
       |SELECT vec_id,
       |  $projExprs
       |FROM e ORDER BY vec_id""".stripMargin
  }

  // ---- kNN-graph construction ---------------------------------------------

  /** Full approximate kNN-GRAPH construction: every vector's top-`k`
    * cosine neighbors among LSH-bucket candidates — the all-source twin of
    * [[annLsh]]'s query-set search, and the input to kNN-graph algorithms
    * (UMAP/t-SNE embeddings, graph-based ANN indexes, [[semanticDedup]]'s
    * connected variant, label propagation over similarity edges).
    *
    * Candidates are pairs sharing a (table, signature) bucket in ANY of
    * `nTables` independent hyperplane sets — an EQUI-join on the composite
    * bucket key, so the whole build is: one map pass to sign (nTables rows
    * per vector), one shuffle on the bucket key, per-bucket pairwise
    * cosine, a distinct to collapse multi-table hits (identical IEEE
    * doubles), and a per-source top-k window. Σ bucket² is the cost knob:
    * nPlanes sizes the buckets (production picks planes ≈ log₂(n/b̄) to
    * pin the expected bucket size b̄, adding tables for recall — the
    * [[annLsh]] amplifier). A vector with fewer than k bucket-mates emits
    * fewer than k edges; isolated vectors emit none (no sentinel rows). */
  def knnGraph(spark: SparkSession, sfDir: String, k: Int = 5,
      nPlanes: Int = 6, nTables: Int = 2): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm"))
    val sigs = (0 until nTables).map { t =>
      e.withColumn("t", lit(t))
        .withColumn("sig", lshSignature(col("v"), nPlanes, 64, tableSeed(t)))
    }.reduce(_.unionByName(_))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank").cast("long").as("rank"),
        col("dst"), col("cos"))
      .orderBy(col("src"), col("rank"))
  }

  /** DuckDB twin of [[knnGraph]] — per-table signature index via UNION
    * ALL, same distinct-then-rank pipeline. */
  def knnGraphOracleSql(k: Int = 5, nPlanes: Int = 6,
      nTables: Int = 2): String = {
    val idx = (0 until nTables).map { t =>
      s"""  SELECT vec_id, v, nrm, $t AS t,
         |    ${sigSqlExpr("v", nPlanes, tableSeed(t))} AS sig
         |  FROM n""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e WHERE list_dot_product(v, v) > 0
       |    AND NOT isnan(list_dot_product(v, v))
       |), idx AS (
       |$idx
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst,
       |    ${Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} AS cos
       |  FROM idx a JOIN idx b ON a.t = b.t AND a.sig = b.sig
       |    AND a.vec_id <> b.vec_id
       |)
       |SELECT src, CAST(rank AS BIGINT) AS rank, dst, cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
       |  FROM cand
       |) WHERE rank <= $k
       |ORDER BY src, rank""".stripMargin
  }

  // ---- NN-Descent kNN-graph refinement -------------------------------------

  /** NN-DESCENT refinement of the kNN graph (Dong, Moses & Li, WWW 2011):
    * start from the paper's RANDOM seed graph — k pseudo-random neighbors
    * per node, here a deterministic affine hash of the node's dense rank
    * so both engines draw the identical "random" graph — and iterate the
    * local-join rule: "a neighbor of my neighbor is probably my neighbor".
    * Symmetrize the current graph, make every two nodes that share a
    * neighbor candidates of each other, rescore, keep each node's top-`k`.
    * This is the algorithm large-scale kNN-graph builders actually run
    * (UMAP, NGT, pynndescent) because it converges in O(log n)-ish rounds
    * with only equi-joins — no quadratic pass anywhere. The random seed is
    * load-bearing: an LSH seed (tried first) partitions the graph into
    * tiny bucket-cliques whose transitive closure adds nothing, while the
    * affine-hash seed is a circulant expander that mixes the whole corpus
    * in a few rounds — the same reason the paper seeds randomly.
    *
    * Scale shape per iteration: symmetrize (a union, no shuffle beyond the
    * join's), self-equi-join the ≤2k-degree adjacency on the shared-pivot
    * node (candidate volume ≤ n·(2k)² rows — bounded by construction, the
    * paper's ρ-sampling knob widens this at fixed k), one distinct, two
    * id-keyed joins back to the vector table to score, and a per-source
    * top-k window on (src)-partitioned data. Each round materializes via
    * localCheckpoint so the loop's lineage (and the optimizer's view of
    * it) stays one-round deep — the [[Graph]] fixed-point discipline.
    * Iteration count is FIXED (`iters`=2) rather than convergence-tested:
    * the gate's contract is deterministic output, and production runs the
    * same bounded-round schedule (the paper's early-exit — stop when the
    * per-round update count falls below δ·n·k — is exposed as OUTPUT by
    * [[knnDescentConvergence]], an anti-join of consecutive rounds'
    * graphs; it is not used as control flow because a data-dependent
    * round count would make the output corpus-order-dependent, which the
    * oracle forbids).
    *
    * Output is [[knnGraph]]-shaped (src, rank, dst, cos); Round13bOpsSpec
    * additionally pins that refined recall@k vs the brute-force graph is
    * monotone over rounds and strictly improves on the seed. The dense
    * rank behind the seed hash is [[Ranks.globalRank]] (range shuffle, no
    * SinglePartition window), so seeding scales like a sort. */
  def knnDescent(spark: SparkSession, sfDir: String, k: Int = 5,
      iters: Int = 2): DataFrame = {
    val gs = knnDescentRounds(spark, sfDir, k, iters)
    val out = descentTopK(gs.last, k)
      .select(col("src"), col("rank").cast("long").as("rank"),
        col("dst"), col("cos"))
      .orderBy(col("src"), col("rank"))
    Tables.materializeAndRelease(out)
  }

  /** CONVERGENCE INSTRUMENT for [[knnDescent]] (verdict r13 stretch task):
    * the paper's early-exit statistic — per-round changed-edge count —
    * exposed as OUTPUT rather than as control flow, so the gate audits
    * convergence without a data-dependent round count (which would make
    * the output corpus-order-dependent, forbidden by the oracle
    * contract). One row per descent round: the round number, how many of
    * the round's kept edges are NEW vs the previous round's graph (an
    * anti-join on (src, dst) — Dong et al. terminate when this falls
    * below δ·n·k), and the round's total kept edges. Everything stays
    * in-plan: per-round 1-row aggregates cross-joined and unioned, no
    * driver-side counting. Shares [[knnDescentRounds]] with the main
    * gate, so the graphs audited ARE the gate's graphs — literally: the
    * rounds are derived ONCE per (JVM, sfDir, k, iters) and memoized as
    * parquet ([[MemoTables]], the graph-backbone discipline), so the two
    * gates read the same materialized run instead of each re-running the
    * descent. */
  def knnDescentConvergence(spark: SparkSession, sfDir: String, k: Int = 5,
      iters: Int = 2): DataFrame = {
    val gs = knnDescentRounds(spark, sfDir, k, iters)
    val rows = (1 to iters).map { i =>
      val changed = gs(i).join(gs(i - 1), Seq("src", "dst"), "left_anti")
        .agg(count(lit(1)).as("changed_edges"))
      val tot = gs(i).agg(count(lit(1)).as("edges"))
      changed.crossJoin(tot)
        .select(lit(i.toLong).as("round"), col("changed_edges"),
          col("edges"))
    }
    val out = rows.reduce(_ unionByName _).orderBy(col("round"))
    Tables.materializeAndRelease(out)
  }

  /** Per-source top-k of a (src, dst, cos) scored frame — the descent
    * loop's keep rule, shared by the gate outputs. */
  private def descentTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Round graphs g0..g`iters` of one memoized descent run — derived once
    * per (JVM, sfDir, k, iters) by [[knnDescentRoundsCompute]], written as
    * parquet (one subdir per round), and read back by every caller.
    * [[knnDescent]] (final graph) and [[knnDescentConvergence]] (per-round
    * deltas) thereby audit the SAME run in execution, not just the same
    * code — previously each gate re-ran the full loop, doubling the
    * descent's cost across the pair and at sf1 pricing two ~100 s runs
    * where one suffices. */
  private def knnDescentRounds(spark: SparkSession, sfDir: String, k: Int,
      iters: Int): IndexedSeq[DataFrame] = {
    val d = MemoTables.dir(s"knndescent|$sfDir|$k|$iters", "graft-knnd") { dir =>
      val (gs, e) = knnDescentRoundsCompute(spark, sfDir, k, iters)
      gs.zipWithIndex.foreach { case (g, i) =>
        g.write.mode("overwrite").parquet(s"$dir/g$i")
      }
      e.unpersist(false)
      ()
    }
    (0 to iters).map(i => spark.read.parquet(s"$d/g$i"))
  }

  /** [[knnDescent]] recomputed from scratch, bypassing the memo — the
    * determinism spec's comparison arm (memoized-vs-self would be a
    * tautology once the rounds are derive-once). */
  private[graft] def knnDescentFresh(spark: SparkSession, sfDir: String,
      k: Int = 5, iters: Int = 2): DataFrame = {
    val (gs, e) = knnDescentRoundsCompute(spark, sfDir, k, iters)
    val out = descentTopK(gs.last, k)
      .select(col("src"), col("rank").cast("long").as("rank"),
        col("dst"), col("cos"))
      .orderBy(col("src"), col("rank"))
    Tables.materializeAndRelease(out, e)
  }

  /** The descent itself: seed graph g0 and each round's kept graph
    * g1..g`iters`, every one eagerly localCheckpoint-ed (one-round
    * lineage), plus the persisted vector frame the caller must release. */
  private def knnDescentRoundsCompute(spark: SparkSession, sfDir: String, k: Int,
      iters: Int): (IndexedSeq[DataFrame], DataFrame) = {
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    def topk(scored: DataFrame): DataFrame = descentTopK(scored, k)
    val nn = e.agg(count(lit(1)).as("nn"))
    // localCheckpoint before the self-join below: [[Ranks.globalRank]]'s
    // range boundaries come from a SAMPLING exchange, and the seed's
    // idx⋈idx plan evaluates that subtree twice — without materialization
    // the two sides can draw different boundaries (different rdd ids seed
    // the sampler), shifting ranks between them and corrupting the seed
    // (observed at sf1: 2,600 of 100k edges off). One 2-column row per
    // vector, so the checkpoint is node-table-sized.
    val idx = Ranks.globalRank(e, "rn", Seq(col("vec_id")))
      .crossJoin(broadcast(nn))
      .withColumn("i", col("rn") - 1).drop("rn")
      .select(col("vec_id"), col("i"), col("nn"))
      .localCheckpoint(true)
    val ea = e.select(col("vec_id").as("src"), col("v").as("va"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("dst"), col("v").as("vb"), col("nrm").as("nb"))
    val seed = idx
      .withColumn("j", explode(typedLit(Seq.range(0L, k.toLong))))
      .withColumn("ti", (col("i") * 131 + col("j") * 97 + 7) % col("nn"))
      .select(col("vec_id").as("src"), col("ti"))
      .join(idx.select(col("i").as("ti"), col("vec_id").as("dst")), "ti")
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val graphs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    graphs += topk(seed.join(ea, "src").join(eb, "dst")
        .select(col("src"), col("dst"),
          cosine(col("va"), col("na"), col("vb"), col("nb")).as("cos")))
      .select(col("src"), col("dst"), col("cos"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val g = graphs.last
      val und = g.select(col("src"), col("dst"))
        .union(g.select(col("dst").as("src"), col("src").as("dst")))
      val cand = und.as("x").join(und.as("y"),
          col("x.src") === col("y.src") && col("x.dst") =!= col("y.dst"))
        .select(col("x.dst").as("src"), col("y.dst").as("dst"))
        .union(g.select(col("src"), col("dst")))
        .distinct()
      val scored = cand.join(ea, "src").join(eb, "dst")
        .select(col("src"), col("dst"),
          cosine(col("va"), col("na"), col("vb"), col("nb")).as("cos"))
      graphs += topk(scored).select(col("src"), col("dst"), col("cos"))
        .localCheckpoint(true)
    }
    (graphs.toIndexedSeq, e)
  }

  /** DuckDB twin of [[knnDescent]] — the seed table and each descent round
    * unrolled as CTE pairs (candidates, rescored top-k), identical
    * signature seed, rounding, and (cos DESC, dst) tie rule. */
  def knnDescentOracleSql(k: Int = 5, iters: Int = 2): String =
    knnDescentCtes(k, iters) +
      s"\nSELECT src, CAST(rnk AS BIGINT) AS rank, dst, cos" +
      s"\nFROM g$iters ORDER BY src, rank"

  /** DuckDB twin of [[knnDescentConvergence]] — the same unrolled round
    * CTEs plus one (changed, total) LEFT-JOIN aggregate per consecutive
    * graph pair. */
  def knnDescentConvergenceOracleSql(k: Int = 5, iters: Int = 2): String = {
    require(iters >= 1, "convergence needs at least one descent round")
    val chs = (1 to iters).map { i =>
      s""", ch$i AS (
         |  SELECT CAST($i AS BIGINT) AS round,
         |    CAST(count(*) FILTER (WHERE b.src IS NULL) AS BIGINT)
         |      AS changed_edges,
         |    CAST(count(*) AS BIGINT) AS edges
         |  FROM g$i a LEFT JOIN g${i - 1} b
         |    ON a.src = b.src AND a.dst = b.dst
         |)""".stripMargin
    }.mkString
    knnDescentCtes(k, iters) + chs + "\n" +
      (1 to iters)
        .map(i => s"SELECT round, changed_edges, edges FROM ch$i")
        .mkString("", "\nUNION ALL\n", "\nORDER BY round")
  }

  /** Shared WITH-chain of the two knn-descent twins: e/n/idx/seed and the
    * unrolled round CTEs through `g<iters>`. */
  private def knnDescentCtes(k: Int, iters: Int): String = {
    val cos = Tables.portableRound6Sql(
      "list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")
    val rounds = (1 to iters).map { i =>
      s"""u${i - 1} AS (
         |  SELECT src, dst FROM g${i - 1}
         |  UNION ALL SELECT dst, src FROM g${i - 1}
         |), c$i AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT x.dst AS src, y.dst AS dst
         |    FROM u${i - 1} x JOIN u${i - 1} y
         |      ON x.src = y.src AND x.dst <> y.dst
         |    UNION ALL SELECT src, dst FROM g${i - 1})
         |), s$i AS (
         |  SELECT c.src, c.dst, $cos AS cos
         |  FROM c$i c JOIN n a ON c.src = a.vec_id
         |    JOIN n b ON c.dst = b.vec_id
         |), g$i AS (
         |  SELECT src, dst, cos, rnk FROM (
         |    SELECT src, dst, cos,
         |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
         |    FROM s$i) WHERE rnk <= $k
         |)""".stripMargin
    }.mkString(", ")
    // iters == 0 (the seed-graph check, exercised Spark-side by
    // Round13bOpsSpec) must not leave a dangling ", $rounds" in the WITH
    // clause — short-circuit to selecting straight from g0, whose inner
    // rnk is exposed for exactly this case (ADVICE r13)
    val roundsSql = if (iters == 0) "" else s", $rounds"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e WHERE list_dot_product(v, v) > 0
       |    AND NOT isnan(list_dot_product(v, v))
       |), idx AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS i,
       |    count(*) OVER () AS nn
       |  FROM n
       |), seed AS (
       |  SELECT DISTINCT x.vec_id AS src, t.vec_id AS dst
       |  FROM idx x CROSS JOIN (SELECT range AS j FROM range($k)) js
       |  JOIN idx t ON t.i = (x.i * 131 + js.j * 97 + 7) % x.nn
       |  WHERE t.vec_id <> x.vec_id
       |), g0 AS (
       |  SELECT src, dst, cos, rnk FROM (
       |    SELECT c.src, c.dst, $cos AS cos,
       |      row_number() OVER (PARTITION BY c.src
       |        ORDER BY $cos DESC, c.dst) AS rnk
       |    FROM seed c JOIN n a ON c.src = a.vec_id
       |      JOIN n b ON c.dst = b.vec_id
       |  ) WHERE rnk <= $k
       |)$roundsSql""".stripMargin
  }

  // ---- k-center greedy coreset (farthest-point sampling) -------------------

  /** K-CENTER GREEDY coreset selection (Sener & Savarese, ICLR 2018 — the
    * "Core-Set Approach" paper; the classical farthest-point-sampling
    * 2-approximation of the k-center objective). Pick the lowest-id vector,
    * then `k`−1 times pick the vector FARTHEST (cosine distance, ties →
    * lower vec_id) from everything chosen so far. The output reports, per
    * selected center: its selection order, the distance that made it win
    * (the paper's coverage-radius curve — monotone non-increasing), and the
    * coverage it ends up providing (assigned count + max assigned distance,
    * i.e. the k-center objective value).
    *
    * Scale shape: the chosen set is ≤ `k` vectors and lives as LITERALS in
    * the plan (the [[randomProjection]] inlining pattern) — each greedy
    * round is ONE codegen'd scan computing `least(d₁…d_t)` plus a
    * TakeOrdered(1), so the whole selection is `k`−1 scans with no shuffle
    * and no broadcast; the final assignment/coverage pass is one more scan
    * + a k-row aggregate. At 100 TB each scan is embarrassingly parallel
    * and the driver state is k·dim doubles — the same bound as the
    * [[Clustering]] codebook collect. (Production k-center at large k
    * switches to batched selection — picking the top-m farthest per round —
    * which this shape extends to by swapping the limit; the per-round scan
    * structure is unchanged.)
    *
    * Distances are `1 − round6(cos)` so every comparison in both engines
    * happens on identical doubles; zero-norm vectors are excluded at the
    * source ([[withVec]] rule). */
  def coresetKCenter(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    def distTo(cv: Seq[Double], cn: Double): Column =
      lit(1.0) - cosine(col("v"), col("nrm"), typedLit(cv), lit(cn))
    val firstRow = e.orderBy(col("vec_id")).limit(1).collect()(0)
    // (sel_rank, vec_id, v, nrm, pick_dist)
    var chosen = Vector[(Long, Long, Seq[Double], Double, Option[Double])](
      (1L, firstRow.getLong(0), firstRow.getSeq[Double](1), firstRow.getDouble(2), None))
    for (t <- 2 to k) {
      val dcols = chosen.map { case (_, _, cv, cn, _) => distTo(cv, cn) }
      val md = if (dcols.size == 1) dcols.head else least(dcols: _*)
      val win = e.select(col("vec_id"), col("v"), col("nrm"), md.as("md"))
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
      chosen = chosen :+ ((t.toLong, win.getLong(0), win.getSeq[Double](1),
        win.getDouble(2), Some(win.getDouble(3))))
    }
    // coverage pass: argmin over the k literal centers, ties → earlier center
    val best = least(chosen.map { case (r, _, cv, cn, _) =>
      struct(distTo(cv, cn).as("d"), lit(r).as("r"))
    }: _*)
    val coverage = e
      .select(best.getField("r").as("sel_rank"), best.getField("d").as("d"))
      .groupBy(col("sel_rank"))
      .agg(count(lit(1)).as("n_assigned"), max(col("d")).as("radius"))
    import spark.implicits._
    val centers = chosen
      .map { case (r, id, _, _, pd) => (r, id, pd) }
      .toDF("sel_rank", "vec_id", "pick_dist")
    val out = centers.join(coverage, Seq("sel_rank"))
      .select(col("sel_rank"), col("vec_id"), col("pick_dist"),
        col("n_assigned"), col("radius"))
      .orderBy(col("sel_rank"))
    Tables.materializeAndRelease(out, e)
  }

  /** DuckDB twin of [[coresetKCenter]] — the greedy rounds unrolled as a
    * cumulative-chosen CTE chain (each round: a min-over-chosen distance
    * aggregate, an `ORDER BY md DESC, vec_id LIMIT 1` pick, a UNION ALL
    * append), then the same argmin coverage pass via a per-point
    * row_number. Chosen points never re-win a round: their distance to
    * themselves is 0. */
  def coresetKCenterOracleSql(k: Int = 8): String = {
    def d(p: String, c: String) = s"1 - ${Tables.portableRound6Sql(
      s"list_dot_product($p.v, $c.v) / ($p.nrm * $c.nrm)")}"
    val rounds = (2 to k).map { t =>
      s"""m$t AS (
         |  SELECT p.vec_id, min(${d("p", "c")}) AS md
         |  FROM n p CROSS JOIN ch${t - 1} c GROUP BY p.vec_id
         |), p$t AS (
         |  SELECT n.vec_id, n.v, n.nrm, CAST($t AS BIGINT) AS sel_rank,
         |    m.md AS pick_dist
         |  FROM m$t m JOIN n ON n.vec_id = m.vec_id
         |  ORDER BY m.md DESC, n.vec_id LIMIT 1
         |), ch$t AS (
         |  SELECT * FROM ch${t - 1} UNION ALL SELECT * FROM p$t
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       |  FROM e WHERE list_dot_product(v, v) > 0
       |    AND NOT isnan(list_dot_product(v, v))
       |), ch1 AS (
       |  SELECT vec_id, v, nrm, CAST(1 AS BIGINT) AS sel_rank,
       |    CAST(NULL AS DOUBLE) AS pick_dist
       |  FROM n WHERE vec_id = (SELECT min(vec_id) FROM n)
       |), $rounds, asgd AS (
       |  SELECT vec_id, sel_rank, dd FROM (
       |    SELECT p.vec_id, c.sel_rank, ${d("p", "c")} AS dd,
       |      row_number() OVER (PARTITION BY p.vec_id
       |        ORDER BY ${d("p", "c")} ASC, c.sel_rank ASC) AS rk
       |    FROM n p CROSS JOIN ch$k c) WHERE rk = 1
       |), cov AS (
       |  SELECT sel_rank, count(*) AS n_assigned, max(dd) AS radius
       |  FROM asgd GROUP BY sel_rank
       |)
       |SELECT c.sel_rank, c.vec_id, c.pick_dist, g.n_assigned, g.radius
       |FROM ch$k c JOIN cov g ON c.sel_rank = g.sel_rank
       |ORDER BY c.sel_rank""".stripMargin
  }

  // ---- semantic dedup (SemDeDup) -------------------------------------------

  /** SemDeDup-style semantic deduplication: cluster the embeddings with the
    * [[Clustering]] spherical k-means codebook, then WITHIN each cluster
    * drop every vector that has a lower-id cluster-mate with cosine ≥
    * `threshold` — the keep-one-representative rule of the SemDeDup paper
    * (Abbas et al. 2023), with the lowest vec_id as the deterministic
    * representative. Emits every vector with its cluster and keep flag, so
    * downstream can either filter survivors or audit the pruned set.
    *
    * Scale design: clustering makes the quadratic LOCAL — candidate pairs
    * are generated per cluster (an equi-join on the cluster id, shuffle
    * keyed on it), never across the corpus, and the per-cluster pair count
    * is the operator's tuning knob: production sizes k so E[|cluster|] is
    * a few thousand (k ≈ N/4096 in the paper), keeping each reducer's
    * C(|cluster|, 2) kernel bounded. The codebook itself stays k·dim
    * doubles on the driver (the [[Clustering.fit]] collect), assignment is
    * one broadcast map pass. A skewed (hot) cluster is absorbed the same
    * way as every other quadratic in this library — raise k or cap the
    * per-cluster membership before the self-join; at gate scale k=8 on 500
    * vectors the blow-up is the point being verified, not a hazard. */
  def semanticDedup(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 3, threshold: Double = 0.4): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v"), col("nrm")).persist()
    val centroids = Clustering.fit(e.select(col("vec_id"), col("v")), k, iters)
    val assigned = e
      .withColumn("cl", graft.functions.VectorExpressions
        .assignCos(col("v"), centroids).getField("_1").cast("long"))
      .select(col("vec_id"), col("cl"), col("v"), col("nrm"))
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.v"), col("a.nrm"), col("b.v"), col("b.nrm"))
        >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("_dropped", lit(true))
    val out = assigned
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl").as("cluster"),
        coalesce(!col("_dropped"), lit(true)).as("keep"))
    Tables.materializeAndRelease(out, e).orderBy(col("vec_id"))
  }

  /** DuckDB twin of [[semanticDedup]] — the k-means fit reuses
    * [[Clustering.kmeansCtes]] (zero-norm-filtered, matching [[withVec]]),
    * the final assignment mirrors the argmax, and the drop rule is the
    * same lower-id-mate EXISTS. */
  def semanticDedupOracleSql(k: Int = 8, iters: Int = 3,
      threshold: Double = 0.4): String = {
    val assignCos = Tables.portableRound6Sql(
      "list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")
    val pairCos = Tables.portableRound6Sql(
      "list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")
    s"""WITH ${Clustering.kmeansCtes(k, iters, filterZeroNorm = true)}, asgF AS (
       |  SELECT vec_id, cl, v, nrm FROM (
       |    SELECT q.vec_id, c.cl, q.v, q.nrm,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        $assignCos DESC, c.cl) AS rnk
       |    FROM n q CROSS JOIN cnF c
       |  ) WHERE rnk = 1
       |), dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asgF a JOIN asgF b ON a.cl = b.cl AND a.vec_id < b.vec_id
       |  WHERE $pairCos >= $threshold
       |)
       |SELECT f.vec_id, CAST(f.cl AS BIGINT) AS cluster,
       |  f.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
       |FROM asgF f ORDER BY f.vec_id""".stripMargin
  }

  // ---- MMR diverse selection ----------------------------------------------

  /** Maximal-Marginal-Relevance selection: from the `poolSize` most
    * query-similar vectors, greedily pick `k` that balance relevance
    * against redundancy — `argmax λ·cos(q,d) − (1−λ)·max_{s∈sel} cos(d,s)`
    * per step (λ = 0.7, ties to the smaller vec_id). The diverse-subset
    * primitive of retrieval reranking and training-data diversity
    * selection (the greedy step of facility-location / k-center coreset
    * picking).
    *
    * Scale split: the DISTRIBUTED part is the candidate pool — an exact
    * top-`poolSize` cosine scan (TakeOrderedAndProject; at 100 TB the pool
    * instead comes from [[annIvf]]/[[annLsh]], same contract). The greedy
    * loop is inherently sequential (each pick conditions the next), so it
    * runs on the DRIVER over the bounded pool (`poolSize`·dim doubles —
    * the [[Clustering.fit]] codebook pattern), with the identical
    * round-to-6 arithmetic as the oracle's unrolled CTE chain. Driver
    * memory is O(poolSize·dim), never O(n). */
  def mmr(spark: SparkSession, sfDir: String, k: Int = 10,
      poolSize: Int = 50, queryId: Long = 0L,
      lambda: Double = 0.7): DataFrame = {
    import spark.implicits._
    val e = withVec(embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val pool = e.as("e").crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("v"), col("nrm"),
        cosine(col("v"), col("nrm"), col("qv"), col("qn")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolSize)
      .select(col("vec_id"), col("rel"), col("v"), col("nrm"))
      .as[(Long, Double, Seq[Double], Double)]
      .collect() // bounded: poolSize rows of dim doubles
    // greedy MMR on the pool — arithmetic mirrors the oracle CTEs exactly:
    // left-fold dots, nrm-product division, round6 per comparison value
    def cosOf(a: (Long, Double, Seq[Double], Double),
        b: (Long, Double, Seq[Double], Double)): Double = {
      val (va, vb) = (a._3, b._3)
      var acc = 0.0
      var i = 0
      while (i < va.length) { acc += va(i) * vb(i); i += 1 }
      round6(acc / (a._4 * b._4))
    }
    val remaining = scala.collection.mutable.ArrayBuffer(
      pool.sortBy(p => (-p._2, p._1)): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Double, Seq[Double], Double)]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    while (selected.size < k && remaining.nonEmpty) {
      val (best, mmrScore) =
        if (selected.isEmpty) (remaining.head, remaining.head._2)
        else remaining.iterator.map { d =>
          val maxSim = selected.iterator.map(s => cosOf(d, s)).max
          (d, round6(lambda * d._2 - (1.0 - lambda) * maxSim))
        }.minBy { case (d, sc) => (-sc, d._1) }
      picks += ((selected.size + 1L, best._1, mmrScore))
      selected += best
      remaining -= best
    }
    picks.toSeq.toDF("rank", "vec_id", "mmr")
  }

  /** DuckDB twin of [[mmr]] — the greedy picks unrolled as chained CTEs;
    * each step is an argmax over (remaining candidates ⋈ pairwise cosines
    * to the already-selected). */
  def mmrOracleSql(k: Int = 10, poolSize: Int = 50, queryId: Long = 0L,
      lambda: Double = 0.7): String = {
    val relCos = Tables.portableRound6Sql(
      "list_dot_product(e.v, q.qv) / (e.nrm * q.qn)")
    val pairCos = Tables.portableRound6Sql(
      "list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")
    val oneMinus = 1.0 - lambda
    val steps = (2 to k).map { i =>
      val stepScore = Tables.portableRound6Sql(
        s"$lambda * c.rel - $oneMinus * max(p.cos)")
      s""", s$i AS MATERIALIZED (
         |  SELECT vec_id, mmr, CAST($i AS BIGINT) AS rank FROM (
         |    SELECT c.vec_id, $stepScore AS mmr
         |    FROM cand c JOIN pc p ON p.a = c.vec_id
         |    WHERE p.b IN (SELECT vec_id FROM sel${i - 1})
         |      AND c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |    GROUP BY c.vec_id, c.rel
         |  ) ORDER BY mmr DESC, vec_id LIMIT 1
         |), sel$i AS MATERIALIZED (
         |  SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i
         |)""".stripMargin
    }.mkString("\n")
    s"""WITH e0 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0
       |  WHERE sqrt(list_dot_product(v, v)) > 0
       |    AND NOT isnan(sqrt(list_dot_product(v, v)))
       |), q AS (
       |  SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = $queryId
       |), cand0 AS (
       |  SELECT e.vec_id, e.v, e.nrm, $relCos AS rel
       |  FROM n e, q WHERE e.vec_id <> $queryId
       |), cand AS MATERIALIZED (
       |  SELECT vec_id, v, nrm, rel FROM cand0
       |  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= $poolSize
       |), pc AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b, $pairCos AS cos
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
       |), s1 AS MATERIALIZED (
       |  SELECT vec_id, rel AS mmr, CAST(1 AS BIGINT) AS rank
       |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
       |), sel1 AS MATERIALIZED (
       |  SELECT * FROM s1
       |)
       |$steps
       |SELECT rank, vec_id, mmr FROM sel$k ORDER BY rank""".stripMargin
  }

  // ---- product quantization (PQ) ANN --------------------------------------

  /** PQ geometry: [[PqSubspaces]] subspaces of [[PqSubDim]] dims each (the
    * 64-dim embedding split evenly), [[PqCodebook]] centroids per subspace
    * fitted with [[PqIters]] L2 k-means rounds. */
  val PqSubspaces = 4
  val PqSubDim = 16
  val PqCodebook = 16
  val PqIters = 2

  /** Product-quantization ANN — the memory-bound billion-scale design
    * (IVF-PQ in FAISS terms): each vector is compressed to
    * [[PqSubspaces]] small codes (one per subspace, 4·log₂16 = 16 bits
    * here vs 64·32 bits raw — a 128× compression), and a query scores a
    * candidate by Asymmetric Distance Computation: its per-subspace
    * distances to every codebook centroid form a tiny lookup table
    * (m·k = 64 doubles), and the approximate distance is the sum of m
    * table lookups — no vector arithmetic in the scan loop at all.
    *
    * Two stages, the production retrieval shape: the ADC scan keeps a
    * [[ShortlistFactor]]·k shortlist per query, then the shortlist alone
    * is re-ranked by EXACT distance against the raw vectors — measured at
    * sf0.01, re-ranking lifts recall@5 vs exact L2 top-k from 0.275
    * (16-bit codes alone) to 0.75 while touching only
    * shortlist·nQueries raw vectors.
    *
    * Determinism: subspace codebooks come from the shared decimal-exact
    * fit loop ([[Clustering.fitWith]]) under L2 assignment; every distance
    * is `round6(a·a − 2·a·b + b·b)` ([[Clustering.sqDist6]] — the fixed
    * association both engines evaluate identically), the ADC sum adds the
    * m round6'd entries left-to-right and rounds again, and all argmins
    * tie to the smaller index. The DuckDB twin unrolls the per-subspace
    * fits exactly like the k-means oracle.
    *
    * Scale shape: fitting collects m·k·subdim doubles on the driver (the
    * MLlib codebook pattern); encoding is ONE broadcast-codebook map pass
    * (the codes table is what persists — 100 TB of vectors becomes ~0.8 TB
    * of codes); the query LUTs are nQueries·m·k doubles broadcast with the
    * scoring UDF; scoring is a scan of the codes table with per-query
    * top-k (`rank ≤ k` window over the bounded query-id set — group-top-k
    * aggregation past ~thousands of concurrent queries). */
  def annPq(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 8): DataFrame = {
    import spark.implicits._
    val e = Tables.spreadIfNarrow(embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    def subspace(v: Array[Double], s: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, s * PqSubDim, (s + 1) * PqSubDim)
    // all subspace codebooks in lockstep — bit-identical to the former
    // per-subspace fitWith loop, one job per round instead of nSub
    // (Clustering.fitSubspacesL2 scaladoc)
    val books: Array[Array[Array[Double]]] =
      Clustering.fitSubspacesL2(e, PqSubspaces, PqSubDim, PqCodebook, PqIters)
    // per-query ADC lookup tables, built driver-side from the same sqDist6
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
      .sortBy(_._1)
    val luts: Map[Long, Array[Array[Double]]] = qs.map { case (id, v) =>
      id -> Array.tabulate(PqSubspaces, PqCodebook) { (s, c) =>
        Clustering.sqDist6(subspace(v.toArray, s), books(s)(c))
      }
    }.toMap
    // exact re-rank distance keeps the query side FIRST in the three-dot
    // association — the order the oracle's list_dot_product chain evaluates
    val qVecs: Map[Long, Array[Double]] = qs.map { case (id, v) => id -> v.toArray }.toMap
    val queries = qs.map(_._1).toSeq.toDF("query_id")
    // encode / ADC-score as native kernels: the codes scan is the PQ hot
    // loop (every candidate × every query), now a primitive table-lookup
    // sum inside whole-stage codegen instead of two boxed-Seq UDF calls
    val scored = e.select(col("vec_id"),
        graft.functions.VectorExpressions.pqEncode(col("v"), books, PqSubDim)
          .as("codes"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorExpressions
          .adcDist(col("query_id"), col("codes"), luts).as("adist"))
    // stage 1: ADC shortlist (codes-only scan); stage 2: exact re-rank of
    // the shortlist against the raw vectors — the standard two-stage
    // retrieval that buys back the recall a 16-bit code cannot carry. The
    // shortlist join touches `shortlist·nQueries` raw vectors, not the
    // corpus.
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    val shortlist = scored.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= k * ShortlistFactor)
      .drop("arank")
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    val result = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .withColumn("dist",
        graft.functions.VectorExpressions.queryL2(col("query_id"), col("v"), qVecs))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"), col("dist"))
      .orderBy(col("query_id"), col("rank"))
    e.unpersist()
    result
  }

  /** ADC shortlist size multiplier for [[annPq]]'s exact re-rank stage. */
  val ShortlistFactor = 10

  // ---- reciprocal-rank fusion ---------------------------------------------

  /** RRF constant / per-ranker pool depth for [[rrfFusion]]. */
  val RrfC = 60L
  val RrfPool = 10

  /** Reciprocal-rank fusion of two rankers — the standard hybrid-retrieval
    * combiner (fuse sparse and dense rankings without score calibration):
    * each query's candidates are ranked independently by cosine similarity
    * (descending) and by exact L2 distance (ascending), each ranker
    * contributes `⌊10⁶/(C + rank)⌋` for its top-[[RrfPool]] placements
    * (C = [[RrfC]], the published constant; truncating integer division —
    * no floats in the fusion), and the fused top-k per query is returned
    * with the constituent ranks. Cosine and L2 disagree exactly when
    * vector NORMS differ — the disagreement RRF exists to absorb.
    *
    * Scale shape: one broadcast-queries candidate join (the [[topK]]
    * shape), two rank windows over the same per-query partition, one
    * fused top-k. At scale each ranker is replaced by its ANN form
    * ([[annLsh]]/[[annPq]]) feeding the same fusion — the gate fuses the
    * EXACT rankers so the oracle stays one self-contained query. */
  def rrfFusion(spark: SparkSession, sfDir: String, k: Int = 5,
      pool: Int = RrfPool, nQueries: Int = 8): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") < nQueries)
    val base = broadcast(q).as("q").join(e.as("e"),
        col("q.vec_id") =!= col("e.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("e.vec_id").as("neighbor_id"),
        cosine(col("q.v"), col("q.nrm"), col("e.v"), col("e.nrm")).as("cos"),
        Tables.portableRound6(
          dot(col("q.v"), col("q.v")) - lit(2.0) * dot(col("q.v"), col("e.v"))
            + dot(col("e.v"), col("e.v"))).as("dist"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("neighbor_id"))
    base
      .withColumn("rank_cos", row_number().over(wc).cast("long"))
      .withColumn("rank_l2", row_number().over(wl).cast("long"))
      .filter(col("rank_cos") <= pool || col("rank_l2") <= pool)
      .withColumn("rrf_fp",
        when(col("rank_cos") <= pool,
          expr(s"1000000L div ($RrfC + rank_cos)")).otherwise(lit(0L)) +
        when(col("rank_l2") <= pool,
          expr(s"1000000L div ($RrfC + rank_l2)")).otherwise(lit(0L)))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("rrf_fp"),
        when(col("rank_cos") <= pool, col("rank_cos")).as("rank_cos"),
        when(col("rank_l2") <= pool, col("rank_l2")).as("rank_l2"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB twin of [[rrfFusion]] — same candidate set, rank windows,
    * truncating fusion, and NULL rule for out-of-pool ranks. */
  def rrfFusionOracleSql(k: Int = 5, pool: Int = RrfPool,
      nQueries: Int = 8): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), s AS (
       |  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |    ${Tables.portableRound6Sql("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos,
       |    ${Tables.portableRound6Sql(
              "list_dot_product(q.v, q.v) - 2.0 * list_dot_product(q.v, x.v) + list_dot_product(x.v, x.v)")} AS dist
       |  FROM n q JOIN n x ON q.vec_id < $nQueries AND q.vec_id <> x.vec_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank_cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id) AS rank_l2
       |  FROM s
       |), f AS (
       |  SELECT query_id, neighbor_id, rank_cos, rank_l2,
       |    (CASE WHEN rank_cos <= $pool THEN 1000000 // ($RrfC + rank_cos) ELSE 0 END) +
       |    (CASE WHEN rank_l2 <= $pool THEN 1000000 // ($RrfC + rank_l2) ELSE 0 END) AS rrf_fp
       |  FROM r WHERE rank_cos <= $pool OR rank_l2 <= $pool
       |), ranked AS (
       |  SELECT query_id, neighbor_id, rrf_fp, rank_cos, rank_l2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_fp DESC, neighbor_id) AS rank
       |  FROM f
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |  CAST(rrf_fp AS BIGINT) AS rrf_fp,
       |  CASE WHEN rank_cos <= $pool THEN CAST(rank_cos AS BIGINT) END AS rank_cos,
       |  CASE WHEN rank_l2 <= $pool THEN CAST(rank_l2 AS BIGINT) END AS rank_l2
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of [[annPq]]: per-subspace L2 k-means unrolled (the
    * [[Clustering.kmeansCtes]] pattern under ORDER BY dist ASC), then
    * encode + ADC joins. Round CTEs are MATERIALIZED — inlining would
    * expand multiply-referenced rounds exponentially (the [[Graph
    * .kcoreOracleSql]] lesson). */
  /** Per-source L2 k-means fit as oracle CTEs, ending in `${pfx}_book(cl,
    * cv)` — the SQL mirror of `Clustering.fitWith(..., assignL2)`: init =
    * the k smallest-vec_id vectors of `src`, L2-argmin assignment
    * (distance ASC, ties to the smaller cl), decimal-exact per-dim means,
    * empty clusters keep their previous centroids. Shared by
    * [[annPqOracleSql]] (subspace books over raw slices) and
    * [[annIvfPqOracleSql]] (the coarse quantizer over full vectors AND
    * subspace books over residual slices). */
  private def l2FitCtes(src: String, pfx: String, dim: Int, k: Int,
      iters: Int): String = {
    def r6(e: String) = Tables.portableRound6Sql(e)
    def distSql(a: String, b: String) = r6(
      s"list_dot_product($a, $a) - 2*list_dot_product($a, $b) + list_dot_product($b, $b)")
    val sb = new StringBuilder
    sb.append(
      s""", ${pfx}_init AS (
         |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cl
         |  FROM $src QUALIFY row_number() OVER (ORDER BY vec_id) <= $k
         |), ${pfx}_cent0 AS MATERIALIZED (
         |  SELECT cl, i, v[i] AS cx
         |  FROM ${pfx}_init, unnest(range(1, ${dim + 1})) AS t(i)
         |)""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"${pfx}_cent${it - 1}"
      sb.append(
        s""", ${pfx}_cv$it AS MATERIALIZED (
           |  SELECT cl, list(cx ORDER BY i) AS cv FROM $prev GROUP BY cl
           |), ${pfx}_asg$it AS MATERIALIZED (
           |  SELECT vec_id, cl, v FROM (
           |    SELECT q.vec_id, c.cl, q.v,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        ${distSql("q.v", "c.cv")} ASC, c.cl) AS rnk
           |    FROM $src q CROSS JOIN ${pfx}_cv$it c
           |  ) WHERE rnk = 1
           |), ${pfx}_raw$it AS (
           |  SELECT cl, i,
           |    ${r6("CAST(SUM(CAST(v[i] AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)")} AS cx
           |  FROM ${pfx}_asg$it, unnest(range(1, ${dim + 1})) AS t(i)
           |  GROUP BY cl, i
           |), ${pfx}_cent$it AS MATERIALIZED (
           |  SELECT p.cl, p.i, coalesce(r.cx, p.cx) AS cx
           |  FROM $prev p LEFT JOIN ${pfx}_raw$it r ON p.cl = r.cl AND p.i = r.i
           |)""".stripMargin)
    }
    sb.append(
      s""", ${pfx}_book AS MATERIALIZED (
         |  SELECT cl, list(cx ORDER BY i) AS cv FROM ${pfx}_cent$iters GROUP BY cl
         |)""".stripMargin)
    sb.toString
  }

  def annPqOracleSql(k: Int = 5, nQueries: Int = 8): String = {
    def r6(e: String) = Tables.portableRound6Sql(e)
    def distSql(a: String, b: String) = r6(
      s"list_dot_product($a, $a) - 2*list_dot_product($a, $b) + list_dot_product($b, $b)")
    val sb = new StringBuilder
    sb.append(
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)""".stripMargin)
    for (s <- 0 until PqSubspaces) {
      val (lo, hi) = (s * PqSubDim + 1, (s + 1) * PqSubDim)
      sb.append(
        s""", sub$s AS MATERIALIZED (
           |  SELECT vec_id, v[$lo:$hi] AS v FROM e
           |)""".stripMargin)
      sb.append(l2FitCtes(s"sub$s", s"s$s", PqSubDim, PqCodebook, PqIters))
      sb.append(
        s""", s${s}_code AS MATERIALIZED (
           |  SELECT vec_id, cl AS c$s FROM (
           |    SELECT q.vec_id, c.cl,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        ${distSql("q.v", "c.cv")} ASC, c.cl) AS rnk
           |    FROM sub$s q CROSS JOIN s${s}_book c
           |  ) WHERE rnk = 1
           |), s${s}_qd AS MATERIALIZED (
           |  SELECT q.vec_id AS query_id, c.cl, ${distSql("q.v", "c.cv")} AS dd
           |  FROM sub$s q CROSS JOIN s${s}_book c WHERE q.vec_id < $nQueries
           |)""".stripMargin)
    }
    val encJoins = (1 until PqSubspaces)
      .map(s => s"JOIN s${s}_code USING (vec_id)").mkString(" ")
    val adcJoins = (1 until PqSubspaces).map(s =>
      s"JOIN s${s}_qd q$s ON q$s.query_id = q0.query_id AND q$s.cl = enc.c$s")
      .mkString("\n  ")
    val adcSum = (0 until PqSubspaces).map(s => s"q$s.dd").mkString(" + ")
    sb.append(
      s""", enc AS MATERIALIZED (
         |  SELECT vec_id, ${(0 until PqSubspaces).map(s => s"c$s").mkString(", ")}
         |  FROM s0_code $encJoins
         |), adc AS (
         |  SELECT q0.query_id, enc.vec_id AS neighbor_id, ${r6(adcSum)} AS adist
         |  FROM enc
         |  JOIN s0_qd q0 ON q0.cl = enc.c0
         |  $adcJoins
         |  WHERE enc.vec_id <> q0.query_id
         |), shortlist AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, adist FROM (
         |    SELECT query_id, neighbor_id, adist,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adist ASC, neighbor_id) AS arank
         |    FROM adc
         |  ) WHERE arank <= ${k * ShortlistFactor}
         |), rerank AS (
         |  SELECT s.query_id, s.neighbor_id, s.adist,
         |    ${distSql("q.v", "n.v")} AS dist
         |  FROM shortlist s
         |  JOIN e q ON q.vec_id = s.query_id
         |  JOIN e n ON n.vec_id = s.neighbor_id
         |)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist, dist
         |FROM (
         |  SELECT query_id, neighbor_id, adist, dist,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY dist ASC, neighbor_id) AS rank
         |  FROM rerank
         |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin)
    sb.toString
  }

  // ---- IVF-PQ: product quantization on coarse-cell residuals ---------------

  /** Coarse-quantizer size / fit rounds for [[annIvfPq]]. */
  val IvfPqCoarseK = 4
  val IvfPqCoarseIters = 2

  /** IVF-PQ — the composition billion-scale vector stores actually deploy
    * (FAISS `IndexIVFPQ`): a coarse L2 k-means quantizer partitions the
    * corpus into inverted lists, and PQ codebooks are fitted on the
    * RESIDUALS `v − centroid(cell)` instead of raw vectors — residuals
    * concentrate near the origin, so the same code budget quantizes them
    * with far less distortion than [[annPq]]'s raw-vector codes. A query
    * probes its `nProbe` nearest cells; within each probed cell the
    * query's OWN residual against that cell's centroid drives the ADC
    * lookup tables, the codes scan is confined to the probed lists (the
    * IVF pruning), and the shortlist re-ranks by exact distance on raw
    * vectors.
    *
    * Determinism: the coarse fit and every subspace fit run the shared
    * decimal-exact loop ([[Clustering.fitWith]], L2 assignment); residual
    * components are round6'd at creation (so the decimal-exact fit means
    * see at-most-6-decimal values — no double→DECIMAL rounding ambiguity
    * between engines); all distances are the fixed-association
    * [[Clustering.sqDist6]]; all argmins tie to the smaller index.
    *
    * Scale shape: coarse codebook + per-cell subspace books are driver
    * collects of k·dim doubles (the MLlib pattern); residual + encode is
    * ONE broadcast-codebook map pass (kernels, codegen-native); per-query
    * work is nProbe LUTs of m·k doubles; the ADC scan joins codes on the
    * probed cell ids — an equi-join that prunes to the probed lists,
    * which at 100 TB is a partition-pruned read of a cluster-bucketed
    * codes table. */
  def annIvfPq(spark: SparkSession, sfDir: String, k: Int = 5,
      nProbe: Int = 2, nQueries: Int = 8): DataFrame = {
    import spark.implicits._
    val e = withVec(embeddings(spark, sfDir))
      .select(col("vec_id"), col("v")).persist()
    // coarse quantizer: L2 k-means over the full vectors
    val coarse = Clustering.fitWith(e, IvfPqCoarseK, IvfPqCoarseIters,
      graft.functions.VectorExpressions.assignL2)
    // residuals, round6 per component (codegen kernel)
    val resid = e
      .withColumn("cl", graft.functions.VectorExpressions
        .assignL2(col("v"), coarse).getField("_1").cast("long"))
      .withColumn("r", graft.functions.VectorExpressions
        .residual(col("cl"), col("v"), coarse))
      .select(col("vec_id"), col("cl"), col("r"))
      .persist()
    // subspace codebooks fitted on the residuals — all in lockstep, one
    // job per round instead of nSub (Clustering.fitSubspacesL2 scaladoc)
    val books: Array[Array[Array[Double]]] = Clustering.fitSubspacesL2(
      resid.select(col("vec_id"), col("r").as("v")),
      PqSubspaces, PqSubDim, PqCodebook, PqIters)
    val codes = resid.select(col("vec_id"), col("cl"),
      graft.functions.VectorExpressions.pqEncode(col("r"), books, PqSubDim)
        .as("codes"))
    val result = ivfPqQuery(e, coarse, books, codes, k, nProbe, nQueries)
    Tables.materializeAndRelease(result, e, resid)
  }

  /** The query phase of [[annIvfPq]] over an arbitrary (coarse, books,
    * codes) index — shared verbatim by the in-plan form and
    * [[annIvfPqFromTable]] (the written-index production shape), so the
    * table twin is bit-identical by construction and reuses the oracle. */
  private[graft] def ivfPqQuery(e: DataFrame, coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]], codes: DataFrame, k: Int,
      nProbe: Int, nQueries: Int,
      /** Pre-collected query vectors (sorted by vec_id) — the streaming
        * maintenance gate probes the index once per trigger against the
        * SAME fixed query set; collecting it once outside the loop skips
        * a per-trigger driver job (r15). Must equal what the collect
        * below would return — [[collectQueries]] is that collect. */
      qsPre: Option[Array[(Long, Seq[Double])]] = None): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // queries: probe the nProbe nearest coarse cells, build per-(query,
    // cell) residual LUTs driver-side (nQueries·nProbe·m·k doubles)
    def subspace(v: Array[Double], s: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, s * PqSubDim, (s + 1) * PqSubDim)
    val qs = qsPre.getOrElse(collectQueries(e, nQueries))
    val qVecs: Map[Long, Array[Double]] = qs.map { case (id, v) => id -> v.toArray }.toMap
    val probes: Seq[(Long, Long)] = qs.flatMap { case (qid, v) =>
      val qv = v.toArray
      coarse.indices
        .map(c => (c, Clustering.sqDist6(qv, coarse(c))))
        .sortBy { case (c, d) => (d, c) } // finite dists; ties to smaller cl
        .take(nProbe)
        .map { case (c, _) => (qid, c.toLong) }
    }
    val luts: Map[Long, Array[Array[Double]]] = probes.map { case (qid, cl) =>
      val qv = qVecs(qid)
      val cent = coarse(cl.toInt)
      val rq = Array.tabulate(qv.length)(i => round6(qv(i) - cent(i)))
      (qid * IvfPqCoarseK + cl) -> Array.tabulate(PqSubspaces, PqCodebook) {
        (s, c) => Clustering.sqDist6(subspace(rq, s), books(s)(c))
      }
    }.toMap
    val probeDf = probes.toDF("query_id", "pcl")
    val scored = codes.join(broadcast(probeDf),
        codes("cl") === col("pcl") && codes("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorExpressions.adcDist(
          col("query_id") * IvfPqCoarseK + col("pcl"), col("codes"), luts)
          .as("adist"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    val shortlist = scored.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= k * ShortlistFactor)
      .drop("arank")
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .withColumn("dist",
        graft.functions.VectorExpressions.queryL2(col("query_id"), col("v"), qVecs))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adist"), col("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[annIvfPq]] fed from a MATERIALIZED IVF-PQ index — the
    * [[annIvfFromTable]] pattern for the residual-quantized form: the
    * coarse codebook, the per-subspace residual books, and the codes
    * table (written PARTITIONED BY the coarse cell, so a probe is a
    * partition-pruned read — the 100 TB story made literal) are built
    * ONCE per corpus and every query-time call only READS them. Parquet
    * round-trips doubles and ints exactly and the query core is the
    * shared [[ivfPqQuery]], so results are bit-identical to the in-plan
    * form and the gate reuses its oracle. */
  def annIvfPqFromTable(spark: SparkSession, sfDir: String, k: Int = 5,
      nProbe: Int = 2, nQueries: Int = 8): DataFrame = {
    val dir = MemoTables.dir(s"ivfpqindex:$sfDir", "graft-ivfpq-") { d =>
      val e = withVec(embeddings(spark, sfDir))
        .select(col("vec_id"), col("v")).persist()
      buildIvfPqIndex(spark, d, e)
      e.unpersist()
    }
    val (coarse, booksRead, codes) = readIvfPqIndex(spark, dir)
    val e = withVec(embeddings(spark, sfDir)).select(col("vec_id"), col("v"))
    ivfPqQuery(e, coarse, booksRead, codes, k, nProbe, nQueries)
  }

  /** Build a full IVF-PQ index for `fit` at `d`: the coarse codebook, the
    * per-subspace residual books, and the codes table written
    * `partitionBy(cl)` (a probe is a partition-pruned read). The build
    * step shared by [[annIvfPqFromTable]] (whole corpus) and
    * [[annIvfPqUpsert]] (base corpus; late arrivals go through
    * [[ivfPqUpsertCodes]]). */
  private[graft] def buildIvfPqIndex(spark: SparkSession, d: String,
      fit: DataFrame): Unit = {
    import spark.implicits._
    val e = fit.persist()
    val coarse = Clustering.fitWith(e, IvfPqCoarseK, IvfPqCoarseIters,
      graft.functions.VectorExpressions.assignL2)
    val resid = e
      .withColumn("cl", graft.functions.VectorExpressions
        .assignL2(col("v"), coarse).getField("_1").cast("long"))
      .withColumn("r", graft.functions.VectorExpressions
        .residual(col("cl"), col("v"), coarse))
      .select(col("vec_id"), col("cl"), col("r"))
      .persist()
    // all subspace books in lockstep — bit-identical, one job per round
    // instead of nSub (Clustering.fitSubspacesL2 scaladoc)
    val books = Clustering.fitSubspacesL2(
      resid.select(col("vec_id"), col("r").as("v")),
      PqSubspaces, PqSubDim, PqCodebook, PqIters)
    coarse.zipWithIndex.map { case (cv, cl) => (cl, cv.toSeq) }.toSeq
      .toDF("cl", "cv").repartition(1)
      .write.mode("overwrite").parquet(s"$d/coarse")
    (for { s <- books.indices; cl <- books(s).indices }
      yield (s, cl, books(s)(cl).toSeq)).toDF("s", "cl", "cv")
      .repartition(1).write.mode("overwrite").parquet(s"$d/books")
    resid.select(col("vec_id"), col("cl"),
        graft.functions.VectorExpressions.pqEncode(col("r"), books, PqSubDim)
          .as("codes"))
      .write.mode("overwrite").partitionBy("cl").parquet(s"$d/codes")
    // id→cell SIDECAR (FAISS's IDMap as a table, verdict r12 task 2):
    // which coarse cell each vec_id's code row lives in, partitioned by
    // id-bucket so the upsert's old-cell locator reads only the batch's
    // buckets — O(|batch|) maintenance, never a codes scan
    resid.select(col("vec_id"), col("cl"))
      .withColumn("idb", idBucket(col("vec_id")))
      .hint("rebalance", "idb")
      .write.mode("overwrite").partitionBy("idb").parquet(s"$d/idcells")
    resid.unpersist(); e.unpersist()
  }

  /** Id-bucket count for the IVF-PQ id→cell sidecar — see
    * [[Dedup.SidecarIdBuckets]] for the layout rationale (a 100 TB store
    * raises it so a batch's buckets are a small fraction). */
  val IvfSidecarIdBuckets = 16L

  private def idBucket(id: Column): Column =
    pmod(id, lit(IvfSidecarIdBuckets)).cast("int")

  /** O(|batch|) old-cell locator for [[ivfPqUpsertCodes]]: the coarse cells
    * re-arriving `newIds`' code rows currently live in, read from the
    * sidecar with an `idb` partition filter (only the batch's id-bucket
    * partitions open — IvfPqUpsertSpec pins pruning + parity with
    * [[ivfOldCellsViaScan]]). */
  private[graft] def ivfOldCellsViaSidecar(spark: SparkSession,
      indexDir: String, newIds: DataFrame): DataFrame = {
    val idbs = newIds.select(idBucket(col("vec_id")).as("idb")).distinct()
      .collect().map(_.getInt(0))
    spark.read.parquet(s"$indexDir/idcells")
      .filter(col("idb").isin(idbs.map(Int.box): _*))
      .join(broadcast(newIds), Seq("vec_id"))
      .select(col("cl"))
  }

  /** The pre-sidecar locator (r12 shape): full codes scan, broadcast
    * semi-join by id. Kept as [[ivfOldCellsViaSidecar]]'s parity oracle. */
  private[graft] def ivfOldCellsViaScan(spark: SparkSession,
      indexDir: String, newIds: DataFrame): DataFrame =
    spark.read.parquet(s"$indexDir/codes")
      .join(broadcast(newIds), Seq("vec_id"))
      .select(col("cl"))

  /** Read an IVF-PQ index written by [[buildIvfPqIndex]]: (coarse codebook,
    * subspace books, codes frame). Parquet round-trips doubles and ints
    * exactly, so queries over a read-back index are bit-identical to the
    * in-plan form. */
  private[graft] def readIvfPqIndex(spark: SparkSession, dir: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]], DataFrame) = {
    import spark.implicits._
    val coarse: Array[Array[Double]] = spark.read.parquet(s"$dir/coarse")
      .select(col("cl"), col("cv")).as[(Int, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    val rows = spark.read.parquet(s"$dir/books")
      .select(col("s"), col("cl"), col("cv")).as[(Int, Int, Seq[Double])]
      .collect()
    val books = Array.tabulate(PqSubspaces, PqCodebook) { (s, c) =>
      rows.find(r => r._1 == s && r._2 == c).get._3.toArray
    }
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("cl"), col("codes"))
    (coarse, books, codes)
  }

  /** Late-arrival selector for [[annIvfPqUpsert]]: `vec_id % 53 == 1`
    * (~2% of the corpus) lands AFTER the index is built. */
  val IvfPqUpsertMod = 53L

  /** Micro-batch count for the MULTI-TRIGGER streaming ANN gate
    * ([[graft.streaming.StreamGate.annIvfPqIncrementalStream]]) — the
    * [[graft.operators.Dedup.StreamDedupMicroBatches]] shape mirrored onto
    * the similarity family (verdict r13 task 3). */
  val StreamAnnMicroBatches = 3

  /** The cleaned (vec_id, v) vector frame — the loader every IVF-PQ entry
    * point shares, exposed for the streaming maintenance gate. */
  private[graft] def vectors(spark: SparkSession, sfDir: String): DataFrame =
    withVec(embeddings(spark, sfDir)).select(col("vec_id"), col("v"))

  /** The fixed query-vector set [[ivfPqQuery]] probes with, collected once
    * (vec_id-sorted) — see the `qsPre` parameter there. */
  private[graft] def collectQueries(e: DataFrame,
      nQueries: Int): Array[(Long, Seq[Double])] = {
    import e.sparkSession.implicits._
    e.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
      .sortBy(_._1)
  }

  /** The BASE-corpus IVF-PQ index (everything except the
    * [[IvfPqUpsertMod]] late arrivals), memoized per (JVM, corpus) in its
    * PRE-upsert state — the starting point the streaming maintenance gate
    * clones and then mutates trigger-by-trigger. [[annIvfPqUpsert]]'s own
    * memo can't serve: it already contains the one-shot upsert. */
  private[graft] def ivfPqBaseIndexTable(spark: SparkSession,
      sfDir: String): String =
    MemoTables.dir(s"ivfpqbase:$sfDir", "graft-ivfpq-bs-") { d =>
      val e = vectors(spark, sfDir).persist()
      buildIvfPqIndex(spark, d,
        e.filter(col("vec_id") % IvfPqUpsertMod =!= 1L))
      e.unpersist()
    }

  /** INDEX MAINTENANCE — encode `batch` (vec_id, v) with the index's
    * EXISTING coarse/residual codebooks (real vector stores do not refit
    * codebooks on ingest; FAISS `IndexIVFPQ.add` does exactly this) and
    * rewrite ONLY the coarse cells the batch touches:
    *
    *  - "touched" = the cells the batch's vectors ASSIGN to, plus the cells
    *    re-arriving vec_ids currently LIVE in — an updated vector may
    *    re-assign to a different coarse cell, and its stale row in the old
    *    cell must be rewritten away too (not just the new cell written).
    *    Old cells come from the id→cell SIDECAR (`idcells/`, FAISS's IDMap
    *    as an id-bucket-partitioned table): an idb-pruned read joined to
    *    the broadcast batch ids — O(|batch|'s buckets), never a codes
    *    scan. The sidecar is maintained in this same upsert (batch
    *    id-buckets rewritten, re-arriving ids' entries replaced);
    *  - the existing codes are read with a `cl` filter — a PARTITION-PRUNED
    *    scan of the `cl=`-partitioned codes table (untouched cells' files
    *    are never opened);
    *  - the union replaces exactly the touched partitions via a tmp-table
    *    write + partition-dir swap ([[graft.io.Storage.swapPartitionDirs]],
    *    r16 — semantics identical to the former dynamic partition
    *    overwrite, one materialization of the merged rows instead of two).
    *    At 100 TB with thousands of coarse cells a batch upsert rewrites
    *    only its own lists, not the index. A touched cell whose LAST rows
    *    were all replaced-away produces no dir in the write and is not
    *    re-created — the stale-dir delete falls out of the swap.
    *
    * Returns the touched cell ids. IvfPqUpsertSpec pins the physical
    * claims: files of untouched cells are byte-identical after the upsert,
    * a cell-moving update leaves exactly one row for the id, and an
    * emptied cell's partition disappears. */
  def ivfPqUpsertCodes(spark: SparkSession, indexDir: String,
      batch: DataFrame,
      /** The index's (coarse, books) when the caller already read them —
        * the streaming gate's probe step runs [[readIvfPqIndex]] in the
        * same trigger; passing the codebooks here skips a second pair of
        * driver collects per trigger (r15). Codebooks are immutable under
        * upsert (FAISS add-time semantics), so any same-index read is the
        * identical value. */
      preBooks: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] =
        None): Seq[Long] = {
    import spark.implicits._
    val (coarse, books) = preBooks.getOrElse {
      val (c, b, _) = readIvfPqIndex(spark, indexDir)
      (c, b)
    }
    val newCodes = batch
      .withColumn("cl", graft.functions.VectorExpressions
        .assignL2(col("v"), coarse).getField("_1").cast("long"))
      .withColumn("r", graft.functions.VectorExpressions
        .residual(col("cl"), col("v"), coarse))
      .select(col("vec_id"), col("cl"),
        graft.functions.VectorExpressions.pqEncode(col("r"), books, PqSubDim)
          .as("codes"))
      .persist()
    // ONE driver collect for the batch's cells AND id-buckets (was three
    // jobs counting the sidecar locator's own idb collect, r15)
    val batchMeta = newCodes
      .select(col("cl"), idBucket(col("vec_id")).as("idb"))
      .distinct().as[(Long, Int)].collect().toSeq
    val batchCells = batchMeta.map(_._1).distinct
    val batchIdbs = batchMeta.map(_._2).distinct.sorted
    // cells where a re-arriving id's OLD row lives (may differ from its new
    // assignment) — those partitions must be rewritten or the stale row
    // would survive, duplicating the id across two cells. Located via the
    // id→cell sidecar (id-bucket-pruned read, O(|batch|)), not a codes scan
    val newIds = newCodes.select(col("vec_id"))
    val oldCells = spark.read.parquet(s"$indexDir/idcells")
      .filter(col("idb").isin(batchIdbs.map(Int.box): _*))
      .join(broadcast(newIds), Seq("vec_id"))
      .select(col("cl"))
      .distinct().as[Long].collect().toSeq
    val touched = (batchCells ++ oldCells).distinct.sorted
    // UPSERT semantics: a re-arriving vec_id REPLACES its old code row (the
    // anti-join broadcasts the bounded batch ids), it does not duplicate it
    val existing = spark.read.parquet(s"$indexDir/codes")
      .filter(col("cl").isin(touched: _*))
      .select(col("vec_id"), col("cl"), col("codes"))
      .join(broadcast(newCodes.select(col("vec_id"))), Seq("vec_id"),
        "left_anti")
    val merged = existing.unionByName(newCodes)
    // sidecar rewrite set: idb is a pure function of vec_id, so a
    // re-arriving id's old sidecar entry lives in the partition its new
    // entry lands in — the batch's idb set (from the single batchMeta
    // collect above) covers both sides
    val mergedSidecar = spark.read.parquet(s"$indexDir/idcells")
      .filter(col("idb").isin(batchIdbs.map(Int.box): _*))
      .join(broadcast(newIds), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cl"), col("idb"))
      .unionByName(newCodes.select(col("vec_id"), col("cl"))
        .withColumn("idb", idBucket(col("vec_id"))))
    // COMMIT BY PARTITION-DIR SWAP (r16, [[graft.io.Storage
    // .swapPartitionDirs]]): each merged frame is written ONCE to a tmp
    // sibling table and the touched partition dirs are swapped into place.
    // The former localCheckpoint + dynamic-overwrite + survivors-collect
    // shape materialized the merged table twice per upsert (the streaming
    // ANN gate pays an upsert per trigger); writing to a tmp dir needs no
    // detach (source files stay untouched until the plan has executed),
    // and the write's own dir listing is the survivor set — an emptied
    // cell produces no dir and is simply not re-created. Same rows, same
    // layout, same result table.
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val codesTmp = s"$indexDir/codes-tmp-$tag"
    val idcellsTmp = s"$indexDir/idcells-tmp-$tag"
    merged.write.mode("overwrite").partitionBy("cl").parquet(codesTmp)
    mergedSidecar.hint("rebalance", "idb")
      .write.mode("overwrite").partitionBy("idb").parquet(idcellsTmp)
    newCodes.unpersist()
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.io.Storage.swapPartitionDirs(fs, codesTmp, s"$indexDir/codes",
      touched.map(cl => s"cl=$cl"))
    graft.io.Storage.swapPartitionDirs(fs, idcellsTmp, s"$indexDir/idcells",
      batchIdbs.map(i => s"idb=$i"))
    touched
  }

  /** [[annIvfPqFromTable]] under INGEST: the index is built on the base
    * corpus (every vector except the ~2% [[IvfPqUpsertMod]] late
    * arrivals), then the late batch is upserted through
    * [[ivfPqUpsertCodes]] — encoded with the existing codebooks, touched
    * cells rewritten partition-pruned — and queries run over the
    * maintained index. Deterministic end-to-end: the final codes table
    * equals "encode everything with the base-fit codebooks", which is
    * what the DuckDB twin computes (base-filtered fit CTEs, full-corpus
    * encode); recall parity with a full rebuild is pinned in
    * IvfPqUpsertSpec. */
  def annIvfPqUpsert(spark: SparkSession, sfDir: String, k: Int = 5,
      nProbe: Int = 2, nQueries: Int = 8): DataFrame = {
    val dir = MemoTables.dir(s"ivfpqupsert:$sfDir", "graft-ivfpq-up-") { d =>
      val e = withVec(embeddings(spark, sfDir))
        .select(col("vec_id"), col("v")).persist()
      buildIvfPqIndex(spark, d,
        e.filter(col("vec_id") % IvfPqUpsertMod =!= 1L))
      ivfPqUpsertCodes(spark, d,
        e.filter(col("vec_id") % IvfPqUpsertMod === 1L))
      e.unpersist()
    }
    val (coarse, books, codes) = readIvfPqIndex(spark, dir)
    val e = withVec(embeddings(spark, sfDir)).select(col("vec_id"), col("v"))
    ivfPqQuery(e, coarse, books, codes, k, nProbe, nQueries)
  }

  /** DuckDB twin of [[annIvfPq]] — the coarse fit and each residual
    * subspace fit share [[l2FitCtes]] with the Spark loop's exact
    * semantics; residual components round6 at creation; probe/LUT/ADC/
    * re-rank all from the same fixed-association distance. */
  def annIvfPqOracleSql(k: Int = 5, nProbe: Int = 2, nQueries: Int = 8,
      /** When set (the [[annIvfPqUpsert]] twin), every k-means FIT runs
        * over `e WHERE fitWhere` — the base corpus — while encode, probe
        * and re-rank stay full-corpus, mirroring "build on base, upsert
        * the late arrivals with the existing codebooks". */
      fitWhere: Option[String] = None): String = {
    def r6(e: String) = Tables.portableRound6Sql(e)
    def distSql(a: String, b: String) = r6(
      s"list_dot_product($a, $a) - 2*list_dot_product($a, $b) + list_dot_product($b, $b)")
    val sb = new StringBuilder
    sb.append(
      """WITH e0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), e AS MATERIALIZED (
        |  SELECT vec_id, v FROM e0
        |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
        |)""".stripMargin)
    fitWhere.foreach(w => sb.append(
      s""", eb AS MATERIALIZED (
         |  SELECT vec_id, v FROM e WHERE $w
         |)""".stripMargin))
    sb.append(l2FitCtes(fitWhere.map(_ => "eb").getOrElse("e"), "co", 64,
      IvfPqCoarseK, IvfPqCoarseIters))
    sb.append(
      s""", co_code AS MATERIALIZED (
         |  SELECT vec_id, cl FROM (
         |    SELECT q.vec_id, c.cl,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${distSql("q.v", "c.cv")} ASC, c.cl) AS rnk
         |    FROM e q CROSS JOIN co_book c
         |  ) WHERE rnk = 1
         |), res AS MATERIALIZED (
         |  SELECT a.vec_id, a.cl,
         |    list(${r6("q.v[i] - c.cv[i]")} ORDER BY i) AS v
         |  FROM co_code a JOIN e q ON a.vec_id = q.vec_id
         |  JOIN co_book c ON a.cl = c.cl, unnest(range(1, 65)) AS t(i)
         |  GROUP BY a.vec_id, a.cl
         |)""".stripMargin)
    for (s <- 0 until PqSubspaces) {
      val (lo, hi) = (s * PqSubDim + 1, (s + 1) * PqSubDim)
      sb.append(
        s""", rsub$s AS MATERIALIZED (
           |  SELECT vec_id, v[$lo:$hi] AS v FROM res
           |)""".stripMargin)
      fitWhere.foreach(w => sb.append(
        s""", rsubb$s AS MATERIALIZED (
           |  SELECT vec_id, v FROM rsub$s WHERE $w
           |)""".stripMargin))
      sb.append(l2FitCtes(
        fitWhere.map(_ => s"rsubb$s").getOrElse(s"rsub$s"), s"r$s",
        PqSubDim, PqCodebook, PqIters))
      sb.append(
        s""", r${s}_code AS MATERIALIZED (
           |  SELECT vec_id, cl AS c$s FROM (
           |    SELECT q.vec_id, c.cl,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        ${distSql("q.v", "c.cv")} ASC, c.cl) AS rnk
           |    FROM rsub$s q CROSS JOIN r${s}_book c
           |  ) WHERE rnk = 1
           |)""".stripMargin)
    }
    val encJoins = (1 until PqSubspaces)
      .map(s => s"JOIN r${s}_code USING (vec_id)").mkString(" ")
    sb.append(
      s""", enc AS MATERIALIZED (
         |  SELECT vec_id, cc.cl,
         |    ${(0 until PqSubspaces).map(s => s"c$s").mkString(", ")}
         |  FROM r0_code $encJoins JOIN co_code cc USING (vec_id)
         |), probe AS MATERIALIZED (
         |  SELECT vec_id AS query_id, cl FROM (
         |    SELECT q.vec_id, c.cl,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${distSql("q.v", "c.cv")} ASC, c.cl) AS rnk
         |    FROM e q CROSS JOIN co_book c WHERE q.vec_id < $nQueries
         |  ) WHERE rnk <= $nProbe
         |), qres AS MATERIALIZED (
         |  SELECT p.query_id, p.cl,
         |    list(${r6("q.v[i] - c.cv[i]")} ORDER BY i) AS v
         |  FROM probe p JOIN e q ON q.vec_id = p.query_id
         |  JOIN co_book c ON p.cl = c.cl, unnest(range(1, 65)) AS t(i)
         |  GROUP BY p.query_id, p.cl
         |)""".stripMargin)
    for (s <- 0 until PqSubspaces) {
      val (lo, hi) = (s * PqSubDim + 1, (s + 1) * PqSubDim)
      sb.append(
        s""", q${s}_qd AS MATERIALIZED (
           |  SELECT qr.query_id, qr.cl AS pcl, c.cl,
           |    ${distSql(s"qr.v[$lo:$hi]", "c.cv")} AS dd
           |  FROM qres qr CROSS JOIN r${s}_book c
           |)""".stripMargin)
    }
    val adcJoins = (1 until PqSubspaces).map(s =>
      s"JOIN q${s}_qd q$s ON q$s.query_id = q0.query_id AND q$s.pcl = q0.pcl AND q$s.cl = enc.c$s")
      .mkString("\n  ")
    val adcSum = (0 until PqSubspaces).map(s => s"q$s.dd").mkString(" + ")
    sb.append(
      s""", adc AS (
         |  SELECT q0.query_id, enc.vec_id AS neighbor_id, ${r6(adcSum)} AS adist
         |  FROM enc
         |  JOIN q0_qd q0 ON q0.pcl = enc.cl AND q0.cl = enc.c0
         |  $adcJoins
         |  WHERE enc.vec_id <> q0.query_id
         |), shortlist AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, adist FROM (
         |    SELECT query_id, neighbor_id, adist,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adist ASC, neighbor_id) AS arank
         |    FROM adc
         |  ) WHERE arank <= ${k * ShortlistFactor}
         |), rerank AS (
         |  SELECT s.query_id, s.neighbor_id, s.adist,
         |    ${distSql("q.v", "n.v")} AS dist
         |  FROM shortlist s
         |  JOIN e q ON q.vec_id = s.query_id
         |  JOIN e n ON n.vec_id = s.neighbor_id
         |)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist, dist
         |FROM (
         |  SELECT query_id, neighbor_id, adist, dist,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY dist ASC, neighbor_id) AS rank
         |  FROM rerank
         |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin)
    sb.toString
  }

  // ---- dedup-threshold sensitivity curve ----------------------------------

  /** Thresholds for [[thresholdCurve]]. */
  val CurveThresholds: Seq[Double] = Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

  /** DEDUP-THRESHOLD sensitivity curve — for each candidate cosine cutoff,
    * how many near-dup pairs and how many affected documents the corpus
    * holds. THE decision input before committing a semantic-dedup
    * threshold: the curve's knee separates "removes real duplicates" from
    * "starts deleting topical neighbors", and computing it needs the
    * all-pairs work ONCE (the cutoff only filters the already-scored pair
    * stream — six thresholds cost six conditional aggregates over the
    * [[cosinePairs]] output, not six pair joins). */
  def thresholdCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = cosinePairs(spark, sfDir)
      .withColumn("threshold", explode(lit(CurveThresholds.toArray)))
      .filter(col("cos") >= col("threshold"))
      .localCheckpoint(true)
    val np = pairs.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val nd = pairs
      .select(col("threshold"), explode(array(col("id1"), col("id2"))).as("id"))
      .groupBy(col("threshold")).agg(countDistinct(col("id")).as("n_docs"))
    CurveThresholds.toDF("threshold")
      .join(np, Seq("threshold"), "left")
      .join(nd, Seq("threshold"), "left")
      .na.fill(0L, Seq("n_pairs", "n_docs"))
      .orderBy(col("threshold"))
  }

  /** DuckDB twin of [[thresholdCurve]] — shared pair SQL, identical
    * threshold literals. */
  def thresholdCurveOracleSql: String = {
    val th = CurveThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), pairs AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2,
       |    ${Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id
       |  WHERE ${Tables.portableRound6Sql("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")} >= 0.4
       |), th AS (
       |  SELECT * FROM (VALUES $th) AS t(threshold)
       |), f AS (
       |  SELECT t.threshold, p.id1, p.id2 FROM pairs p JOIN th t ON p.cos >= t.threshold
       |), np AS (
       |  SELECT threshold, count(*) AS n_pairs FROM f GROUP BY 1
       |), nd AS (
       |  SELECT threshold, count(DISTINCT id) AS n_docs FROM (
       |    SELECT threshold, id1 AS id FROM f
       |    UNION ALL
       |    SELECT threshold, id2 FROM f
       |  ) GROUP BY 1
       |)
       |SELECT t.threshold,
       |  CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(nd.n_docs, 0) AS BIGINT) AS n_docs
       |FROM th t
       |LEFT JOIN np ON t.threshold = np.threshold
       |LEFT JOIN nd ON t.threshold = nd.threshold
       |ORDER BY t.threshold""".stripMargin
  }

  /** ANN RECALL@k — the accuracy audit of the approximate tier against the
    * exact brute-force baseline, as a first-class query instead of an
    * offline report (SCALE.md's measured 0.075→0.300→0.500 recall curve
    * came from exactly this computation inside PlanAudit; shipping the
    * measurement IS part of running ANN in production — you re-audit
    * recall every time the corpus or the LSH knobs move). Per query:
    * `n_exact` (=k while the corpus has ≥k neighbors), `n_hit` = how many
    * of the exact top-k the multi-table multi-probe [[annLsh]] tier
    * surfaced, and the portably-rounded recall ratio.
    *
    * Scale shape: both sides are the already-gated operators ([[topK]]'s
    * broadcast of the bounded query set; [[annLsh]]'s equi-join probe) —
    * the audit adds only an id-pair membership join on the two k·nQueries
    * frames (tiny at any corpus size: the expensive side is the ANN
    * search itself, and at fleet scale the exact side runs on a SAMPLE of
    * queries, which is the `nQueries` bound). */
  def annRecall(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 8, nPlanes: Int = 6, probeRadius: Int = 1,
      nTables: Int = 4): DataFrame = {
    val exact = topK(spark, sfDir, k, nQueries)
      .select(col("query_id"), col("neighbor_id"))
    val ann = annLsh(spark, sfDir, k, nQueries, nPlanes, probeRadius, nTables)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    val hits = exact.join(ann,
        exact("query_id") === col("aq") && exact("neighbor_id") === col("an"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall", Tables.portableRound6(
        col("n_hit").cast("double") / col("n_exact").cast("double")))
      .orderBy(col("query_id"))
  }

  /** The shared oracle CTE chain both ANN-eval twins build on — normalized
    * vectors (`n`), the exact brute-force top-k (`ex`), the multi-table
    * probe pipeline, the ranked candidate list (`r`), and the top-k cut
    * (`ann`). ONE definition so [[annRecallOracleSql]] and
    * [[annMrrOracleSql]] audit the SAME candidate tier by construction
    * (the lshEval/minhashLsh lesson: an eval must be tied to the tier it
    * grades, not to a hand-copied re-derivation that can drift). */
  private def annEvalCtes(k: Int, nQueries: Int, nPlanes: Int,
      probeRadius: Int, nTables: Int): String = {
    def r6(e: String) = Tables.portableRound6Sql(e)
    val masks = probeMasks(nPlanes, probeRadius).mkString("[", ", ", "]")
    val sigCols = (0 until nTables).map(t =>
      s"${sigSqlExpr("v", nPlanes, tableSeed(t))} AS sig$t").mkString(",\n    ")
    val index = (0 until nTables).map(t =>
      s"SELECT vec_id, v, nrm, $t AS t, sig$t AS sig FROM n")
      .mkString("\n  UNION ALL\n  ")
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    $sigCols
       |  FROM e WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${r6("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} DESC,
       |        x.vec_id) AS rnk
       |    FROM n q JOIN n x ON q.vec_id < $nQueries AND q.vec_id <> x.vec_id
       |  ) WHERE rnk <= $k
       |), b AS (
       |  $index
       |), pr AS (
       |  SELECT vec_id, v, nrm, t, xor(sig, CAST(m.f AS BIGINT)) AS probe
       |  FROM b, unnest($masks) AS m(f)
       |  WHERE vec_id < $nQueries
       |), s AS (
       |  SELECT DISTINCT q.vec_id AS query_id, x.vec_id AS neighbor_id,
       |    ${r6("list_dot_product(q.v, x.v) / (q.nrm * x.nrm)")} AS cos
       |  FROM pr q JOIN b x
       |    ON q.t = x.t AND q.probe = x.sig AND q.vec_id <> x.vec_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |), ann AS (
       |  SELECT query_id, neighbor_id FROM r WHERE rnk <= $k
       |)""".stripMargin
  }

  /** DuckDB twin of [[annRecall]]: the exact-top-k and [[annLshOracleSql]]
    * CTE chains over ONE shared normalized-vector table ([[annEvalCtes]]),
    * then the same membership join. */
  def annRecallOracleSql(k: Int = 5, nQueries: Int = 8, nPlanes: Int = 6,
      probeRadius: Int = 1, nTables: Int = 4): String = {
    def r6(e: String) = Tables.portableRound6Sql(e)
    s"""WITH ${annEvalCtes(k, nQueries, nPlanes, probeRadius, nTables)}, h AS (
       |  SELECT x.query_id, count(*) AS n_hit
       |  FROM ex x JOIN ann a
       |    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
       |  GROUP BY 1
       |), xc AS (
       |  SELECT query_id, count(*) AS n_exact FROM ex GROUP BY 1
       |)
       |SELECT xc.query_id, CAST(xc.n_exact AS BIGINT) AS n_exact,
       |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       |  ${r6("CAST(coalesce(h.n_hit, 0) AS DOUBLE) / xc.n_exact")} AS recall
       |FROM xc LEFT JOIN h ON h.query_id = xc.query_id
       |ORDER BY xc.query_id""".stripMargin
  }

  /** MEAN-RECIPROCAL-RANK AUDIT of the ANN tier — [[annRecall]] counts set
    * overlap; this grades ORDER: per query, the rank (within the ANN's own
    * top-k list) of the first true neighbor, and its reciprocal as exact
    * integer ppm (`10⁶ div rank` — rank ≤ k keeps it exact; a query whose
    * ANN list contains no true neighbor scores 0). The retrieval metric a
    * RAG pipeline reads when ORDER matters more than coverage.
    *
    * Scale shape: identical to [[annRecall]] — the eval joins two ≤
    * (nQueries·k)-row frames; the only heavy pass is the candidate
    * pipeline both evals share with the production [[annLsh]] by
    * construction. */
  def annMrr(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 8, nPlanes: Int = 6, probeRadius: Int = 1,
      nTables: Int = 4): DataFrame = {
    val exact = topK(spark, sfDir, k, nQueries)
      .select(col("query_id"), col("neighbor_id"))
    val ann = annLsh(spark, sfDir, k, nQueries, nPlanes, probeRadius, nTables)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val firstHit = ann.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(min(col("rank")).as("first_hit_rank"))
    exact.select(col("query_id")).distinct()
      .join(firstHit, Seq("query_id"), "left")
      .na.fill(0L, Seq("first_hit_rank"))
      .withColumn("mrr_ppm",
        when(col("first_hit_rank") > 0L,
          expr("1000000 div first_hit_rank")).otherwise(0L))
      .orderBy(col("query_id"))
  }

  /** DuckDB twin of [[annMrr]] — the same [[annEvalCtes]] chain, then the
    * first-hit-rank pick and integer reciprocal. */
  def annMrrOracleSql(k: Int = 5, nQueries: Int = 8, nPlanes: Int = 6,
      probeRadius: Int = 1, nTables: Int = 4): String =
    s"""WITH ${annEvalCtes(k, nQueries, nPlanes, probeRadius, nTables)}, fh AS (
       |  SELECT r.query_id, min(r.rnk) AS first_hit_rank
       |  FROM r JOIN ex x
       |    ON r.query_id = x.query_id AND r.neighbor_id = x.neighbor_id
       |  WHERE r.rnk <= $k
       |  GROUP BY 1
       |), qs AS (
       |  SELECT DISTINCT query_id FROM ex
       |)
       |SELECT qs.query_id,
       |  CAST(coalesce(fh.first_hit_rank, 0) AS BIGINT) AS first_hit_rank,
       |  CAST(CASE WHEN coalesce(fh.first_hit_rank, 0) > 0
       |    THEN 1000000 // fh.first_hit_rank ELSE 0 END AS BIGINT) AS mrr_ppm
       |FROM qs LEFT JOIN fh ON fh.query_id = qs.query_id
       |ORDER BY qs.query_id""".stripMargin

  // ---- hard-negative triplet mining ----------------------------------------

  /** HARD-NEGATIVE TRIPLET MINING — the contrastive-training data step:
    * for each anchor in the query set, the highest-cosine SAME-label
    * neighbor (the positive) and the highest-cosine DIFFERENT-label
    * neighbor (the hard negative), plus the triplet margin
    * `pos_cos − neg_cos` — the quantity a triplet/InfoNCE curriculum
    * thresholds on (small or negative margin ⇒ hard triplet worth
    * oversampling; large ⇒ easy, downweight). Ties break to the smaller
    * candidate id, the library-wide rank rule.
    *
    * Scale shape: identical to [[rrfFusion]] — one broadcast-queries
    * candidate join (nQueries·N cosines, the exact ranker), two rank
    * windows KEYED on the anchor (label-split partitions), one row per
    * anchor out. At fleet scale the candidate join is replaced by the ANN
    * tier ([[annLsh]]/[[annIvfKmeans]]) feeding the same windows — the
    * gate runs the exact ranker so the oracle stays one self-contained
    * query (the [[rrfFusion]] discipline). */
  def hardNegatives(spark: SparkSession, sfDir: String,
      nQueries: Int = 8): DataFrame = {
    val e = withVec(embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") < nQueries)
    val base = broadcast(q).as("q").join(e.as("e"),
        col("q.vec_id") =!= col("e.vec_id"))
      .select(col("q.vec_id").as("anchor_id"), col("q.label").as("al"),
        col("e.vec_id").as("cand_id"), col("e.label").as("cl"),
        cosine(col("q.v"), col("q.nrm"), col("e.v"), col("e.nrm")).as("cos"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val pos = base.filter(col("al") === col("cl"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("anchor_id"), col("cand_id").as("pos_id"),
        col("cos").as("pos_cos"))
    val neg = base.filter(col("al") =!= col("cl"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("anchor_id").as("na"), col("cand_id").as("neg_id"),
        col("cos").as("neg_cos"))
    pos.join(neg, col("anchor_id") === col("na"))
      .select(col("anchor_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
      .orderBy(col("anchor_id"))
  }

  /** DuckDB twin of [[hardNegatives]] — same zero-norm-filtered corpus,
    * cosine expression, per-anchor DESC/tie rank windows, and IEEE
    * subtraction of two round6 values. */
  def hardNegativesOracleSql(nQueries: Int = 8): String = {
    val cosE = Tables.portableRound6Sql(
      "list_dot_product(q.v, e.v) / (q.nrm * e.nrm)")
    s"""WITH e0 AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0
       |  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))
       |), q AS (
       |  SELECT * FROM n WHERE vec_id < $nQueries
       |), cand AS (
       |  SELECT q.vec_id AS anchor_id, q.label AS al, e.vec_id AS cand_id,
       |    e.label AS cl, $cosE AS cos
       |  FROM q, n e WHERE e.vec_id <> q.vec_id
       |), pos AS (
       |  SELECT anchor_id, cand_id AS pos_id, cos AS pos_cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC, cand_id) AS rnk
       |    FROM cand WHERE al = cl
       |  ) WHERE rnk = 1
       |), neg AS (
       |  SELECT anchor_id, cand_id AS neg_id, cos AS neg_cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC, cand_id) AS rnk
       |    FROM cand WHERE al <> cl
       |  ) WHERE rnk = 1
       |)
       |SELECT p.anchor_id, p.pos_id, p.pos_cos, g.neg_id, g.neg_cos,
       |  p.pos_cos - g.neg_cos AS margin
       |FROM pos p JOIN neg g USING (anchor_id)
       |ORDER BY p.anchor_id""".stripMargin
  }

  // ---- embedding centroid drift --------------------------------------------

  /** EMBEDDING DRIFT MONITOR — per-label centroid shift between two
    * corpus halves (vec_id parity stands in for the before/after
    * snapshots a production monitor compares): per (label, half, dim)
    * exact decimal mean ([[Tables.exactAvg]] — order-independent, the
    * IVF-centroid discipline), then the L2 distance between the two
    * centroid vectors. The distance algebra is EXACT end-to-end: the
    * per-dim means are round6 values, their difference cast to
    * DECIMAL(18,9) is exact, the squared terms (scale 18) sum exactly,
    * and only the final sqrt + round6 touch IEEE — the same two
    * correctly-rounded steps on both engines. The drift a retraining
    * trigger or an index-rebuild policy watches.
    *
    * Scale shape: one posexplode + (label × 2 × dims)-key map-side-
    * combined aggregate, then a (label × dims)-row self-join and a
    * |labels|-key final aggregate — never row-scale after the first
    * pass. */
  def centroidDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cents = e
      .select(col("label"), (col("vec_id") % 2 === 1).as("is_new"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("is_new"), col("pos"))
      .agg(Tables.exactAvg(col("x")).as("cx"), count(lit(1)).as("n"))
    val old = cents.filter(!col("is_new"))
      .select(col("label"), col("pos"), col("cx").as("co"), col("n").as("n_old"))
    val neu = cents.filter(col("is_new"))
      .select(col("label").as("l2"), col("pos").as("p2"),
        col("cx").as("cn"), col("n").as("n_new"))
    old.join(neu, col("label") === col("l2") && col("pos") === col("p2"))
      .select(col("label"), col("n_old"), col("n_new"),
        ((col("cn") - col("co")).cast("decimal(18,9)") *
          (col("cn") - col("co")).cast("decimal(18,9)")).as("d2"))
      .groupBy(col("label"))
      .agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        sum(col("d2")).as("s2"))
      .select(col("label"), col("n_old"), col("n_new"),
        Tables.portableRound6(sqrt(col("s2").cast("double"))).as("drift"))
      .orderBy(col("label"))
  }

  /** DuckDB twin of [[centroidDrift]] — identical decimal algebra. */
  def centroidDriftOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), c AS (
       |  SELECT label, vec_id % 2 = 1 AS is_new, t.i AS pos,
       |    ${Tables.exactAvgSql("v[t.i]")} AS cx, count(*) AS n
       |  FROM e, unnest(range(1, 65)) AS t(i)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT o.label, CAST(max(o.n) AS BIGINT) AS n_old,
       |  CAST(max(nn.n) AS BIGINT) AS n_new,
       |  ${Tables.portableRound6Sql(
            "sqrt(CAST(SUM(CAST(nn.cx - o.cx AS DECIMAL(18,9)) * " +
            "CAST(nn.cx - o.cx AS DECIMAL(18,9))) AS DOUBLE))")} AS drift
       |FROM c o JOIN c nn
       |  ON o.label = nn.label AND o.pos = nn.pos
       |  AND NOT o.is_new AND nn.is_new
       |GROUP BY o.label ORDER BY o.label""".stripMargin
}

