package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{QuerySurface, Ranks, Sampling, Tables, TextAnalysis}

/** Round-8 coverage: the distributed global-rank machinery that replaced
  * the three empty-key `row_number`/`ntile` windows (pack_shards, q_lorenz,
  * text_quality_ntile). Value-parity is proven against the window forms
  * they replaced — same answer, no SinglePartition funnel. */
class Round8OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("globalRank equals the empty-key row_number window (documents by size)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val viaWindow = docs.withColumn("rk",
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id")))
        .cast("long"))
    val viaRanks = Ranks.globalRank(docs, "rk",
      Seq(col("n_chars").desc, col("doc_id")))
      .select(col("doc_id"), col("n_chars"), col("rk"))
    assertFrameEqual(viaRanks, viaWindow, Seq("doc_id"))
  }

  test("globalRank is dense 1..N across many partition counts (incl. empty ranges)") {
    import spark.implicits._
    // 97 rows over 16 range partitions → several near-empty partitions;
    // ranks must still be exactly 1..97 in value order
    val df = spark.range(1, 98).select((col("id") * 37 % 101).as("k"), col("id"))
    val got = Ranks.globalRank(df, "rk", Seq(col("k"), col("id")), partitions = 16)
      .orderBy(col("k"), col("id")).select(col("rk")).as[Long].collect()
    assert(got.toSeq == (1L to 97L))
  }

  test("ntileFromRank reproduces SQL ntile for every remainder class") {
    import spark.implicits._
    for (n <- Seq(7, 10, 12, 19, 100, 101)) {
      val df = spark.range(1, n + 1).select(col("id"))
      val viaWindow = df.withColumn("t",
        ntile(10).over(Window.orderBy(col("id"))).cast("long"))
        .orderBy(col("id")).select(col("t")).as[Long].collect().toSeq
      val viaFormula = df
        .withColumn("t", Ranks.ntileFromRank(col("id"), lit(n.toLong), 10))
        .orderBy(col("id")).select(col("t")).as[Long].collect().toSeq
      assert(viaFormula == viaWindow, s"n=$n: $viaFormula vs $viaWindow")
    }
  }

  test("pack_shards matches the former window-based form cell-by-cell") {
    val s = Sampling.PackShardCount
    val ranked = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("pos", expr(s"(rk - 1) % (2 * $s)"))
      .withColumn("shard",
        expr(s"IF(pos < $s, pos, 2 * $s - 1 - pos)").cast("long"))
    val bands = ranked.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("shard_chars"))
    val expected = bands
      .withColumn("tot", sum(col("shard_chars")).over(Window.partitionBy()))
      .select(col("shard"), col("n_docs"), col("shard_chars"),
        expr(s"(abs($s * shard_chars - tot) * 1000000) div tot").as("dev_abs_ppm"),
        expr(s"$s * shard_chars >= tot").as("over_ideal"))
    assertFrameEqual(Sampling.packShards(spark, sf), expected, Seq("shard"))
  }

  test("q_lorenz matches the former window-based form cell-by-cell") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
    val od = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val rev = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(28,2)")) * 100)
        .cast("long").as("rev_c"))
    val bands = rev
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rev_c").desc, col("o_custkey"))))
      .withColumn("n_cust", count(lit(1)).over(Window.partitionBy()))
      .withColumn("decile", expr("((rn - 1) * 10) div n_cust"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("band_c"))
    val expected = bands
      .withColumn("tot_c", sum(col("band_c")).over(Window.partitionBy()))
      .withColumn("cum_c", sum(col("band_c")).over(Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_customers"), col("band_c").as("rev_cents"),
        expr("((band_c * 1000) div tot_c) * 1000 + ((band_c * 1000) % tot_c) * 1000 div tot_c")
          .as("share_ppm"),
        expr("((cum_c * 1000) div tot_c) * 1000 + ((cum_c * 1000) % tot_c) * 1000 div tot_c")
          .as("cum_share_ppm"))
    assertFrameEqual(QuerySurface.lorenzDeciles(spark, sf), expected, Seq("decile"))
  }

  // ---- real image decode through the perceptual near-dup path ----

  /** Deterministic test PNG: a w×h gradient with per-pixel perturbation
    * from `seed`, PNG-encoded via the JDK's own ImageIO (lossless). */
  private def pngBytes(w: Int, h: Int, seed: Int,
      tweak: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / (w - 1) + seed * 37) % 256
      val v = ((base + tweak(x, y)) % 256 + 256) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("image dHash: PNG decode → 9x8 gradient signature, near-dups found, " +
    "non-images fall back to the byte stub") {
    import spark.implicits._
    import graft.operators.Multimodal
    val base = pngBytes(64, 64, seed = 0)
    // one-pixel-block perturbation: cell averages barely move → tiny hamming
    val nearDup = pngBytes(64, 64, seed = 0,
      tweak = (x, y) => if (x == 10 && y == 10) 40 else 0)
    // reversed gradient: every horizontal comparison flips → huge hamming
    val far = pngBytes(64, 64, seed = 0,
      tweak = (x, _) => 255 - 2 * (x * 255 / 63))
    val sigBase = Multimodal.dhashImage(base)
    val sigNear = Multimodal.dhashImage(nearDup)
    val sigFar = Multimodal.dhashImage(far)
    assert(sigBase != 0L && (sigBase & (1L << 63)) == 0L) // 63-bit convention
    assert(java.lang.Long.bitCount(sigBase ^ sigNear) <= 2,
      s"near-dup hamming ${java.lang.Long.bitCount(sigBase ^ sigNear)}")
    assert(java.lang.Long.bitCount(sigBase ^ sigFar) > 20,
      s"far hamming ${java.lang.Long.bitCount(sigBase ^ sigFar)}")
    // decode is deterministic across calls (and thus across partitions)
    assert(Multimodal.dhashImage(base) == sigBase)
    // a non-image payload falls back to the byte-level stub, not an error
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.dhashImage(junk) == Multimodal.dhashStub(junk))

    // end-to-end through the SAME banding/verify plan as the gate, with the
    // real decoder swapped in for the stub
    val media = Seq(
      Multimodal.Media(1L, "image/png", base),
      Multimodal.Media(2L, "image/png", nearDup),
      Multimodal.Media(3L, "image/png", far)).toDS()
    val pairs = Multimodal.nearDupMediaPairs(media, maxHamming = 6,
        sig = Multimodal.dhashImage)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"pairs=$pairs")
  }

  test("text_quality_ntile matches the former ntile-window form cell-by-cell") {
    val expected = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("quality_score"), col("doc_id")))
          .cast("long"))
    assertFrameEqual(TextAnalysis.qualityNtile(spark, sf), expected, Seq("doc_id"))
  }
}
