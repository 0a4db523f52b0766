package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Spherical k-means over the `embeddings` table — the semantic-clustering
  * primitive a training pipeline uses for diversity balancing, semantic
  * dedup, and domain mixing.
  *
  * Algorithm (fixed, fully deterministic, cross-engine reproducible):
  *   - init: centroids = the k smallest-vec_id vectors (verbatim doubles),
  *     cluster labels = 0-based rank positions;
  *   - assign: cluster = argmax over centroids of round(cos(v, c), 6),
  *     ties to the smallest cluster id;
  *   - update: centroid components = round(exactDecimalMean(v_i), 6) per
  *     assigned cluster; clusters that lose all members keep their previous
  *     centroid;
  *   - `iters` full assign+update rounds, then a final assignment is emitted
  *     as (vec_id, cluster, cos).
  *
  * Scale design: the classic Spark k-means shape — centroids are tiny
  * (k × dim doubles) and live on the driver/broadcast; assignment is a pure
  * map over the vectors; the update is one shuffle keyed by (cluster, dim)
  * — k·dim keys, no skew. Per iteration: one map + one small agg. The
  * decimal-exact mean (order-independent sums, single correctly-rounded
  * decimal→double step) is what makes the result identical on any engine,
  * any partitioning — a raw double avg would drift in the last ulps.
  *
  * The DuckDB oracle ([[kmeansOracleSql]]) unrolls the same iterations as
  * generated CTEs.
  */
object Clustering {

  /** Pure-IEEE round-to-6 (see [[Tables.portableRound6]]); NaN/Inf
    * propagate (math.floor keeps them), matching DuckDB's floor. */
  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** Spherical k-means: returns (vec_id, cluster, cos) after `iters`
    * assign+update rounds. */
  def kmeans(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 3): DataFrame = {
    val e = Tables.spreadIfNarrow(embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    val centroids = fit(e, k, iters)
    val result = e.withColumn("a",
        graft.functions.VectorExpressions.assignCos(col("v"), centroids))
      .select(col("vec_id"), col("a._1").cast("long").as("cluster"),
        col("a._2").as("cos"))
      .orderBy(col("vec_id"))
    // iterations are done (centroids collected eagerly); release the cache —
    // the returned plan re-reads the source once when executed instead of
    // leaking one cached frame per kmeans() call
    e.unpersist()
    result
  }

  // ---- cluster-quality evaluation -------------------------------------------

  /** CLUSTER-QUALITY EVAL over the fitted spherical k-means — the numbers a
    * pipeline reads before trusting a clustering for semantic dedup or
    * domain mixing: per cluster, the member count, COHESION (decimal-exact
    * mean of the round6 assignment cosines — how tight the cluster is) and
    * SEPARATION (the nearest OTHER centroid's cosine — how close the
    * nearest confusable cluster sits), plus their margin (a silhouette-
    * style gap that needs no sqrt and no per-pair pass). A healthy
    * clustering has cohesion well above nn_cos on every row; a collapsed
    * pair of clusters shows margin ≈ 0.
    *
    * Scale shape: identical to [[kmeans]] — assignment is one broadcast-
    * codebook map pass; cohesion one (cluster)-keyed agg; separation runs
    * on the k×k DRIVER-side codebook (k ≤ 8 — the bounded-collect class).
    * NaN-cos rows (zero-norm vectors) are excluded symmetrically in both
    * engines. */
  def clusterEval(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    val e = Tables.spreadIfNarrow(embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    val centroids = fit(e, k, iters)
    val members = e.withColumn("a",
        graft.functions.VectorExpressions.assignCos(col("v"), centroids))
      .select(col("a._1").cast("long").as("cluster"), col("a._2").as("cos"))
      .filter(!isnan(col("cos")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        Tables.exactAvg(col("cos")).as("cohesion"))
    // nearest-other-centroid cosine over the k×k codebook — same dot/round
    // and DESC-with-NaN-first, ties-to-smaller-id semantics as the oracle's
    // row_number pick
    val cNrm = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
    val nn = centroids.indices.map { c =>
      var bestCl = -1
      var bestCos = Double.NaN
      centroids.indices.foreach { o =>
        if (o != c) {
          var acc = 0.0
          var i = 0
          while (i < centroids(c).length) {
            acc += centroids(c)(i) * centroids(o)(i); i += 1
          }
          val cos = round6(acc / (cNrm(c) * cNrm(o)))
          val takes =
            if (bestCl < 0) true
            else if (cos.isNaN) !bestCos.isNaN
            else !bestCos.isNaN && cos > bestCos
          if (takes) { bestCos = cos; bestCl = o }
        }
      }
      (c.toLong, bestCl.toLong, bestCos)
    }
    val nnDf = nn.toDF("cluster", "nn_cluster", "nn_cos")
    val out = members.join(nnDf, Seq("cluster"))
      .withColumn("margin", col("cohesion") - col("nn_cos"))
      .select(col("cluster"), col("n_members"), col("cohesion"),
        col("nn_cluster"), col("nn_cos"), col("margin"))
      .orderBy(col("cluster"))
    // materialize BEFORE unpersisting so the final assignment/cohesion pass
    // reads the cached frame instead of re-deriving the projection — the
    // same release discipline as shingleContainment/novelty
    Tables.materializeAndRelease(out, e)
  }

  /** DuckDB twin of [[clusterEval]] — the shared k-means CTEs, the same
    * final assignment, decimal-exact cohesion, and the centroid-pair
    * nearest pick with identical DESC/NaN/tie semantics. */
  def clusterEvalOracleSql(k: Int = 8, iters: Int = 3): String = {
    val cosExpr = Tables.portableRound6Sql(
      "list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")
    s"""WITH ${kmeansCtes(k, iters)},
       |asgF AS (
       |  SELECT vec_id, cl, cos FROM (
       |    SELECT q.vec_id, c.cl, $cosExpr AS cos,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        $cosExpr DESC, c.cl) AS rnk
       |    FROM n q CROSS JOIN cnF c
       |  ) WHERE rnk = 1
       |), mem AS (
       |  SELECT cl, count(*) AS n_members,
       |    ${Tables.exactAvgSql("cos")} AS cohesion
       |  FROM asgF WHERE NOT isnan(cos) GROUP BY cl
       |), cpairs AS (
       |  SELECT a.cl AS cl, b.cl AS ocl,
       |    ${Tables.portableRound6Sql(
             "list_dot_product(a.cv, b.cv) / (a.c_nrm * b.c_nrm)")} AS cos
       |  FROM cnF a JOIN cnF b ON a.cl <> b.cl
       |), nn AS (
       |  SELECT cl, ocl AS nn_cluster, cos AS nn_cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cl
       |      ORDER BY cos DESC, ocl) AS rnk
       |    FROM cpairs
       |  ) WHERE rnk = 1
       |)
       |SELECT CAST(m.cl AS BIGINT) AS cluster, m.n_members, m.cohesion,
       |  CAST(nn.nn_cluster AS BIGINT) AS nn_cluster, nn.nn_cos,
       |  m.cohesion - nn.nn_cos AS margin
       |FROM mem m JOIN nn ON m.cl = nn.cl ORDER BY 1""".stripMargin
  }

  /** The fitted centroid codebook after `iters` assign+update rounds over a
    * `(vec_id, v)` frame — shared by [[kmeans]] and
    * [[Similarity.annIvfKmeans]] (IVF with a real learned codebook). The
    * caller manages caching of `e` (both users persist it around the
    * iteration loop). */
  private[operators] def fit(e: DataFrame, k: Int, iters: Int): Array[Array[Double]] =
    fitWith(e, k, iters, graft.functions.VectorExpressions.assignCos)

  /** [[fit]] with a pluggable assignment rule —
    * [[graft.functions.VectorExpressions.assignCos]] (cosine argmax,
    * spherical k-means) for [[kmeans]]/IVF,
    * [[graft.functions.VectorExpressions.assignL2]] (squared-Euclidean
    * argmin) for [[Similarity.annPq]]'s subspace codebooks. The init and
    * decimal-exact update are identical. Assignment is a native kernel
    * expression (primitive ArrayData loop inside whole-stage codegen —
    * no per-row boxed `Seq[Double]`, the tax that dominated the iteration
    * loop at embedding scale). */
  private[operators] def fitWith(e: DataFrame, k: Int, iters: Int,
      assign: (org.apache.spark.sql.Column, Array[Array[Double]]) =>
        org.apache.spark.sql.Column): Array[Array[Double]] = {
    import e.sparkSession.implicits._
    // init: the k smallest-vec_id vectors; cluster labels are RANK POSITIONS
    // (0-based), not raw vec_ids — the oracle labels identically, so sparse
    // or non-zero-based id spaces cannot desynchronize the two engines
    var centroids: Array[Array[Double]] = e
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
      .map(_._2.toArray)
    var it = 0
    while (it < iters) {
      val assigned = e.withColumn("a", assign(col("v"), centroids))
        .select(col("vec_id"), col("a._1").as("cluster"), col("v"))
      // update: decimal-exact per-(cluster, dim) means, rounded to 6
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(Tables.exactAvg(col("x")).as("cx"))
        .as[(Int, Int, Double)].collect()
      val next = centroids.map(_.clone()) // empty clusters keep old centroid
      means.foreach { case (c, pos, cx) => next(c)(pos) = cx }
      // a cluster present in `means` gets all dims overwritten (posexplode
      // emits every dim), so the clone only survives for empty clusters
      centroids = next
      it += 1
    }
    centroids
  }

  /** ALL `nSub` per-subspace L2 codebooks fitted in LOCKSTEP — bit-identical
    * to `nSub` independent `fitWith(slice(v, s·subDim+1, subDim), k, iters,
    * assignL2)` calls (the subspace fits never interact: each round's
    * assignment and decimal-exact update read only that subspace's slice
    * and codebook), but the cluster runs ONE init collect and ONE
    * assign+update job per round for the whole codebook set instead of
    * `nSub` of each — the PQ fit was `nSub·(iters+1)` tiny driver-collect
    * jobs whose fixed job latency dominated the wall at gate scale (r15;
    * the per-row work is unchanged, only the job count drops). The
    * subspace id rides as an explode key; assignment picks the matching
    * codebook via a CASE chain of the same [[graft.functions
    * .VectorExpressions.assignL2]] kernel the independent fits ran. */
  private[operators] def fitSubspacesL2(e: DataFrame, nSub: Int, subDim: Int,
      k: Int, iters: Int): Array[Array[Array[Double]]] = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.Column
    // init: the k smallest-vec_id vectors, sliced per subspace — the exact
    // init each independent fit draws (one collect instead of nSub)
    val initVecs: Array[Array[Double]] = e
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])].collect()
      .map(_._2.toArray)
    var books: Array[Array[Array[Double]]] = Array.tabulate(nSub) { s =>
      initVecs.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
    }
    val subRows = e.select(
        posexplode(array((0 until nSub).map(s =>
          slice(col("v"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sv")))
    var it = 0
    while (it < iters) {
      val assignCase: Column = (0 until nSub).map { s =>
        (s, graft.functions.VectorExpressions.assignL2(col("sv"), books(s))
          .getField("_1"))
      }.foldRight(lit(null).cast("int")) { case ((s, a), acc) =>
        when(col("s") === s, a).otherwise(acc)
      }
      val means = subRows
        .select(col("s"), assignCase.as("cluster"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("s"), col("cluster"), col("pos"))
        .agg(Tables.exactAvg(col("x")).as("cx"))
        .as[(Int, Int, Int, Double)].collect()
      val next = books.map(_.map(_.clone())) // empty clusters keep old centroids
      means.foreach { case (s, c, pos, cx) => next(s)(c)(pos) = cx }
      books = next
      it += 1
    }
    books
  }

  /** Squared-Euclidean distance with the cross-engine association contract:
    * `round6(a·a − 2·a·b + b·b)` — three SEQUENTIAL dot products combined
    * left-to-right, exactly what the DuckDB twin's
    * `list_dot_product(a,a) - 2*list_dot_product(a,b) + list_dot_product(b,b)`
    * evaluates, so both engines round the identical IEEE value. A direct
    * `Σ(aᵢ−bᵢ)²` loop would associate differently and could flip the
    * rounded 6th digit on boundary pairs. */
  private[operators] def sqDist6(a: Array[Double], b: Array[Double]): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) {
      aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1
    }
    round6(aa - 2.0 * ab + bb)
  }

  /** DuckDB twin of [[kmeans]] — the iterations unrolled as generated CTEs
    * (long centroid format (cl, i, cx); assignment via a row_number argmax
    * ordered cos DESC, cl ASC — same tie rule as the strict-greater loop). */
  def kmeansOracleSql(k: Int = 8, iters: Int = 3): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(kmeansCtes(k, iters))
    sb.append(
      s"""
         |SELECT vec_id, CAST(cl AS BIGINT) AS cluster, cos FROM (
         |  SELECT q.vec_id, c.cl,
         |    ${Tables.portableRound6Sql("list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")} AS cos,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${Tables.portableRound6Sql("list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")} DESC,
         |      c.cl) AS rnk
         |  FROM n q CROSS JOIN cnF c
         |) WHERE rnk = 1 ORDER BY vec_id""".stripMargin)
    sb.toString
  }

  /** The k-means fit as a reusable CTE body: `e`/`n` (vectors + norms),
    * unrolled iterations, ending in `cnF` = the fitted codebook with norms
    * `(cl, cv, c_nrm)`. Shared by [[kmeansOracleSql]] (unfiltered — the
    * Spark `kmeans` feeds every vector) and
    * [[Similarity.annIvfKmeansOracleSql]] (`filterZeroNorm = true` — its
    * Spark side goes through `withVec`, which excludes zero/NaN-norm
    * vectors; the oracle must fit/assign/probe over the same set or a
    * single degenerate vector desynchronizes the engines). */
  private[operators] def kmeansCtes(k: Int, iters: Int,
      filterZeroNorm: Boolean = false): String = {
    val where =
      if (filterZeroNorm)
        "\n  WHERE list_dot_product(v, v) > 0 AND NOT isnan(list_dot_product(v, v))"
      else ""
    val sb = new StringBuilder
    sb.append(
      s"""e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), n AS (
         |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e$where
         |), init AS (
         |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cl
         |  FROM n QUALIFY row_number() OVER (ORDER BY vec_id) <= $k
         |), cent0 AS (
         |  SELECT cl, i, v[i] AS cx
         |  FROM init, unnest(range(1, 65)) AS t(i)
         |)""".stripMargin)
    for (it <- 1 to iters) {
      val prev = s"cent${it - 1}"
      sb.append(
        s""", cv$it AS (
           |  SELECT cl, list(cx ORDER BY i) AS cv FROM $prev GROUP BY cl
           |), cn$it AS (
           |  SELECT cl, cv, sqrt(list_dot_product(cv, cv)) AS c_nrm FROM cv$it
           |), asg$it AS (
           |  SELECT vec_id, cl, v FROM (
           |    SELECT q.vec_id, c.cl, q.v,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        ${Tables.portableRound6Sql("list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")} DESC,
           |        c.cl) AS rnk
           |    FROM n q CROSS JOIN cn$it c
           |  ) WHERE rnk = 1
           |), raw$it AS (
           |  SELECT cl, i,
           |    ${Tables.portableRound6Sql("CAST(SUM(CAST(v[i] AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)")} AS cx
           |  FROM asg$it, unnest(range(1, 65)) AS t(i)
           |  GROUP BY cl, i
           |), cent$it AS (
           |  SELECT p.cl, p.i, coalesce(r.cx, p.cx) AS cx
           |  FROM $prev p LEFT JOIN raw$it r ON p.cl = r.cl AND p.i = r.i
           |)""".stripMargin)
    }
    sb.append(
      s""", cvF AS (
         |  SELECT cl, list(cx ORDER BY i) AS cv FROM cent$iters GROUP BY cl
         |), cnF AS (
         |  SELECT cl, cv, sqrt(list_dot_product(cv, cv)) AS c_nrm FROM cvF
         |)""".stripMargin)
    sb.toString
  }

  // ---- prototype pruning (dataset pruning over the fitted clusters) ------

  /** Prototype pruning over the fitted spherical k-means — the dataset-
    * pruning shape of Sorscher et al. 2022 ("Beyond neural scaling laws",
    * arXiv:2206.14486) and SemDeDup's cluster-wise selection (Abbas et al.
    * 2023, arXiv:2303.09540): within each cluster, the members CLOSEST to
    * their centroid are the most prototypical/redundant examples, and a
    * data-rich pipeline drops them first (keep the hard tail). Per cluster
    * this gate prunes the top ⌈n/4⌉ members by assignment cosine and
    * reports the decision surface: member count, pruned count, the most
    * prototypical cosine (`proto_cos`, rank 1), the LAST pruned cosine
    * (`cut_cos` — the threshold an online filter would apply), and the
    * decimal-exact mean cosine of the KEPT set (how hard the surviving
    * examples are).
    *
    * Scale shape: assignment is the same broadcast-codebook map pass as
    * [[kmeans]]; the per-cluster rank uses [[Ranks.globalRank]]'s grouped
    * form — one range shuffle on (cluster, cos desc, vec_id) plus
    * broadcast offsets — because a `Window.partitionBy(cluster)` with
    * k = 8 keys would funnel a 100 TB corpus through 8 reducers. The
    * summary aggregate is k-row bounded. */
  def prunePrototypes(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 3): DataFrame = {
    val e = Tables.spreadIfNarrow(embeddings(spark, sfDir), col("vec_id"))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .persist()
    val centroids = fit(e, k, iters)
    // NaN cosine = zero-norm vector; excluded symmetrically in both engines
    // (the clusterEval discipline): a NaN row in the kept set would skew the
    // decimal kept-mean asymmetrically — Spark's exactAvg silently drops the
    // NaN from the sum while count() keeps the row, and DuckDB errors
    // casting NaN to DECIMAL.
    val members = e.withColumn("a",
        graft.functions.VectorExpressions.assignCos(col("v"), centroids))
      .select(col("vec_id"), col("a._1").cast("long").as("cluster"),
        col("a._2").as("cos"))
      .filter(!isnan(col("cos")))
    val ranked = Ranks.globalRank(members, "grank",
      Seq(col("cluster"), col("cos").desc, col("vec_id")))
    val sizes = ranked.groupBy(col("cluster"))
      .agg(min(col("grank")).as("base"), count(lit(1)).as("n_members"))
      .withColumn("n_pruned", expr("(n_members + 3) div 4"))
    val out = ranked.join(broadcast(sizes), "cluster")
      .withColumn("crank", col("grank") - col("base") + lit(1L))
      .groupBy(col("cluster"), col("n_members"), col("n_pruned"))
      .agg(
        max(when(col("crank") === 1L, col("cos"))).as("proto_cos"),
        max(when(col("crank") === col("n_pruned"), col("cos"))).as("cut_cos"),
        Tables.exactAvg(when(col("crank") > col("n_pruned"), col("cos")))
          .as("kept_mean_cos"))
      .orderBy(col("cluster"))
    e.unpersist()
    out
  }

  /** DuckDB twin of [[prunePrototypes]] — same fit CTEs, a per-cluster
    * row_number (fine at oracle scale; the Spark side ranks distributed),
    * identical ⌈n/4⌉ rule and kept-mean decimal discipline. */
  def prunePrototypesOracleSql(k: Int = 8, iters: Int = 3): String = {
    val cos = Tables.portableRound6Sql(
      "list_dot_product(q.v, c.cv) / (q.nrm * c.c_nrm)")
    s"""WITH ${kmeansCtes(k, iters)},
       |asg AS (
       |  SELECT vec_id, cl, cos FROM (
       |    SELECT q.vec_id, c.cl, $cos AS cos,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC,
       |        c.cl) AS rnk
       |    FROM n q CROSS JOIN cnF c
       |  ) WHERE rnk = 1 AND NOT isnan(cos)
       |), rk AS (
       |  SELECT vec_id, cl, cos,
       |    row_number() OVER (PARTITION BY cl ORDER BY cos DESC, vec_id)
       |      AS crank
       |  FROM asg
       |), sz AS (
       |  SELECT cl, count(*) AS n_members, (count(*) + 3) // 4 AS n_pruned
       |  FROM asg GROUP BY cl
       |)
       |SELECT CAST(cl AS BIGINT) AS cluster,
       |  CAST(n_members AS BIGINT) AS n_members,
       |  CAST(n_pruned AS BIGINT) AS n_pruned,
       |  MAX(CASE WHEN crank = 1 THEN cos END) AS proto_cos,
       |  MAX(CASE WHEN crank = n_pruned THEN cos END) AS cut_cos,
       |  ${Tables.exactAvgSql("CASE WHEN crank > n_pruned THEN cos END")}
       |    AS kept_mean_cos
       |FROM rk JOIN sz USING (cl)
       |GROUP BY cl, n_members, n_pruned
       |ORDER BY cluster""".stripMargin
  }
}
