package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Document deduplication for training-data pipelines: exact, n-gram Jaccard
  * (exact pairwise), MinHash+LSH, SimHash. The reference gestures at this
  * with its unused `Blake3Hash` dedup hook (/root/reference/src/types.rs:171-187);
  * these operators are the scaled-out realization over the `documents` table.
  *
  * Scale design (100 TB of documents):
  *   - exact dedup shuffles md5(text) (16 bytes), never the document body,
  *     and is a single hash-aggregate;
  *   - MinHash/LSH is the scale path for near-dup: cost is
  *     O(docs × shingles × perms) map-side + a band-bucket shuffle whose
  *     key cardinality (band, bandSig) is huge → no hot keys. Candidate
  *     verification touches only bucket-colliding pairs, never all pairs;
  *   - exact pairwise Jaccard (the correctness baseline for LSH) shuffles on
  *     the shingle; at scale, frequent-shingle skew is bounded by dropping
  *     ultra-common shingles (stopword shingles carry no dedup signal) —
  *     here kept exact to stay oracle-comparable;
  *   - SimHash is one map pass + a 16-bit-band bucket shuffle, same shape as
  *     LSH.
  *
  * All hash functions are deterministic (xxhash64 with Spark's fixed seed 42,
  * affine perms from a fixed-seed PRNG) so every output is reproducible.
  */
object Dedup {

  /** Distinct word-3-gram shingles per document. Shared by Jaccard + MinHash.
    * Pure codegen HOFs — no UDF, no shuffle. */
  def shingleCol(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).select(col("doc_id"), shingleCol(col("text")).as("sh"))

  /** Exact dedup: canonical-row selection per identical text. Groups on
    * md5(text) so the shuffle key is 16 bytes regardless of document size
    * (hash-groupBy pattern). Emits every doc with its keep/drop verdict. */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") === min(col("doc_id")).over(w)).as("is_canonical"),
        count(lit(1)).over(w).as("dup_group_size"))
      .orderBy(col("doc_id"))
  }

  /** Exact pairwise n-gram Jaccard ≥ threshold: explode distinct shingles,
    * self-join on the shingle (shuffle key = shingle), count intersections;
    * |A∪B| = |A|+|B|−|A∩B|. Integer counts → the jaccard division is
    * bit-identical across engines. */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    val sh = docShingles(spark, sfDir)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("id1") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id2") === col("sb.doc_id"))
      .select(col("id1"), col("id2"),
        (col("c") / (col("sa.n") + col("sb.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- MinHash + LSH ----

  private val NumPerms = 64
  private val Bands = 16 // 16 bands × 4 rows
  private val RowsPerBand = NumPerms / Bands
  private val MersennePrime = 2147483647L // 2^31 − 1

  /** Affine permutation coefficients from a fixed seed — deterministic across
    * runs and executors. */
  private lazy val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumPerms)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** 64-perm MinHash signature of a shingle array: map each shingle to a
    * 31-bit hash, then min over (a·h+b) mod p per permutation. All HOFs —
    * runs map-side in one pass, no shuffle. */
  def minhashSignature(sh: Column): Column = {
    val aLit = typedLit(permA.toSeq)
    val bLit = typedLit(permB.toSeq)
    val hs = transform(sh, s => xxhash64(s).bitwiseAND(lit(MersennePrime)))
    transform(sequence(lit(0), lit(NumPerms - 1)), i =>
      array_min(transform(hs, h =>
        (element_at(aLit, i + 1) * h + element_at(bLit, i + 1)) % lit(MersennePrime))))
  }

  /** MinHash+LSH near-dup pairs: band signatures → bucket self-join →
    * candidate pairs → exact-Jaccard verification of candidates only.
    * Output: (id1, id2, est_jaccard, jaccard) for exact jaccard ≥ threshold. */
  def minhashLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    val sh = docShingles(spark, sfDir).filter(size(col("sh")) > 0)
    val signed = sh.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh")).as("sig"))

    // one (band, bandSig) row per band; bandSig hashes the 4-perm slice
    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bandSig"))
    }: _*)
    val banded = signed
      .select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bandSig").as("bandSig"))

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandSig") === col("b.bandSig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    // verify: estimated (sig agreement) + exact jaccard, candidates only
    val withSig = signed.select(col("doc_id"), col("sh"), col("sig"))
    candidates
      .join(withSig.as("da"), col("id1") === col("da.doc_id"))
      .join(withSig.as("db"), col("id2") === col("db.doc_id"))
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("da.sig"), col("db.sig"), (x, y) => x === y),
          b => b)).cast("double") / lit(NumPerms.toDouble)).as("est_jaccard"),
        (size(array_intersect(col("da.sh"), col("db.sh"))).cast("double") /
          size(array_union(col("da.sh"), col("db.sh"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- SimHash ----

  private val SimBits = 63 // bits 0..62 of xxhash64 masked non-negative

  /** 63-bit SimHash over the token multiset (token frequency = weight).
    * bit_j(doc) = sign of Σ_tokens (±1 by bit j of xxhash64(token)). */
  def simhashCol(text: Column): Column = {
    val pow2 = typedLit((0 until SimBits).map(j => 1L << j))
    val toks = split(text, " ")
    val hs = transform(toks, t => xxhash64(t).bitwiseAND(lit(Long.MaxValue)))
    val bits = transform(sequence(lit(0), lit(SimBits - 1)), j => {
      val m = element_at(pow2, j + 1)
      val weight = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L))
      when(weight > 0, 1L).otherwise(0L)
    })
    aggregate(zip_with(bits, pow2, (b, m) => b * m), lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found via
    * 16-bit band bucketing (a pair within Hamming ≤ 3 of 4 bands must agree
    * on ≥ 1 band — standard pigeonhole blocking; wider distances are
    * recall-traded like any LSH). */
  def simhashPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = 10): DataFrame = {
    val docs = documents(spark, sfDir)
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bandSig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("simhash"),
        col("bs.band").as("band"), col("bs.bandSig").as("bandSig"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandSig") === col("b.bandSig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }
}
