package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Executes the distributed connected-components path at REAL size: a
  * 2.09M-edge synthetic graph mixing 5,860 chains of 256 nodes (depth —
  * drives the O(log diameter) round count; the adversarial worst case is
  * separately proven on small chains in OperatorsSpec) with 600 width-1000
  * stars (fan-out), forced onto star contraction, checked label-for-label
  * against the driver union-find and against the known component
  * structure.
  *
  * Opt-in (≈1 min at GRAFT_TEST_CORES=32, much longer on the default
  * local[4]): set GRAFT_SLOW_TESTS=1. Measured result recorded in SCALE.md
  * (Dedup section).
  */
class CcScaleSpec extends SparkTestBase {

  private def slowTest(name: String)(f: => Unit): Unit =
    if (sys.env.get("GRAFT_SLOW_TESTS").contains("1")) test(name)(f)
    else ignore(name)(f)

  slowTest("star contraction at 2.1M edges: labels exact, rounds ≤ log2(n)+2") {
    // chain length 256 → convergence at ~9 rounds. Longer chains (4096)
    // converge equally correctly (edge counts measured constant at 2.098M,
    // matching an independent reference simulation) but late rounds slow
    // super-linearly on local[32] as contracting centers reach degree
    // ~2^round — wall went 5 s/round (r≤9) → 11 s (r10) → 67 s (r11) with
    // IDENTICAL input sizes, so the cost is engine-side (skewed-key
    // handling), not algorithmic. Depth behavior is separately proven on
    // adversarial chains in OperatorsSpec; THIS spec pins execution at
    // ≥2M-edge scale.
    val chainLen = 256L // nodes per chain
    val nChains = 5860L // chain edges = 5860 × 255 = 1,494,300
    val chainN = nChains * chainLen
    val nStars = 600L
    val leaves = 1000L
    val starBase = 10000000L
    val starStep = 2000L

    // chains occupy ids [c*chainLen, (c+1)*chainLen); edge (i, i+1) except
    // across chain boundaries — each chain's min node is its label
    val chain = spark.range(0L, chainN - 1)
      .filter((col("id") + 1L) % chainLen =!= 0L)
      .select(col("id").as("id1"), (col("id") + 1L).as("id2"))
    // `div`, not `/`: Spark long division with `/` yields DOUBLE, which
    // would silently turn the star centers into 600k distinct fractional ids
    val starIdx = expr(s"id div $leaves")
    val stars = spark.range(0L, nStars * leaves).select(
      (lit(starBase) + starIdx * starStep).as("id1"),
      (lit(starBase) + starIdx * starStep
        + (col("id") % leaves) + 1L).as("id2"))
    // checkpoint the generated edges: clears the union-of-ranges lineage
    // (which trips Catalyst's Union constraint rewrite) and pins one
    // materialization for all downstream passes
    val edges = chain.union(stars).localCheckpoint(true)
    val nEdges = edges.count()
    assert(nEdges >= 2000000L, s"graph must exceed 2M edges, got $nEdges")

    val t0 = System.nanoTime()
    val (starLabels, rounds) = Dedup.starContraction(edges)
    val labels = starLabels.localCheckpoint(true)
    val wallS = (System.nanoTime() - t0) / 1e9
    val nNodes = chainN + nStars * (leaves + 1)
    val bound = (math.log(nNodes.toDouble) / math.log(2.0)).ceil.toInt + 2
    info(f"star contraction: $nEdges edges, $nNodes nodes, $rounds rounds, $wallS%.1f s")
    assert(rounds <= bound, s"$rounds rounds exceeds log2(n)+2 = $bound")

    // structure: one component per chain (labeled by its min node,
    // c × chainLen) + one per star (labeled by its center)
    val byLabel = labels.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    assert(byLabel.count() == nChains + nStars)
    assert(byLabel.filter(col("label") < starBase)
      .filter(col("label") % chainLen =!= 0L || col("n") =!= chainLen).isEmpty,
      "every chain component must be labeled by its min node with chainLen members")
    assert(byLabel.filter(col("label") >= starBase)
      .filter(col("n") =!= (leaves + 1L)).isEmpty,
      "every star component must have exactly leaves+1 members")

    // exact agreement with the bounded driver union-find on the same edges
    val uf = Dedup.componentLabels(edges, smallCutoff = Long.MaxValue)
    assert(labels.count() == nNodes && uf.count() == nNodes)
    assert(labels.except(uf).isEmpty && uf.except(labels).isEmpty,
      "star-contraction labels must equal union-find labels")
  }
}
