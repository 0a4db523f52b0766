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

  test("text_quality_ntile matches the former ntile-window form cell-by-cell") {
    val expected = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("quality_score"), col("doc_id")))
          .cast("long"))
    assertFrameEqual(TextAnalysis.qualityNtile(spark, sf), expected, Seq("doc_id"))
  }
}
