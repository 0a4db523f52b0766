package graft

import graft.operators.Tables

/** The engine's surface is equally reachable through `spark.sql`: register
  * the tables as views and the same Catalyst plans serve ANSI SQL — the
  * interop a reference user gets from DuckDB/Trino over the parquet. */
class SqlApiSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def register(): Unit =
    Seq("events", "lineitem", "orders", "customer", "nation", "documents")
      .foreach(t => Tables.table(spark, sf, t).createOrReplaceTempView(t))

  test("spark.sql answers the documented query shapes over registered views") {
    register()
    val counts = spark.sql(
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin).collect()
    assert(counts.length == 5)
    // equals the DataFrame-API result
    val viaDf = graft.operators.QuerySurface.groupByCount(spark, sf).collect()
    assert(counts.map(_.toSeq.toList).toList == viaDf.map(_.toSeq.toList).toList)

    val topOrders = spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin).collect()
    assert(topOrders.length == 5)

    val joined = spark.sql(
      """SELECT n_name, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
    assert(joined.count() > 0)
  }

  test("GraftExtensions expose the custom expressions as SQL functions") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 32.0)
    // vector_dot over a real table — same result as the Column API
    Tables.table(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      """SELECT vec_id, vector_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                          CAST(embedding AS ARRAY<DOUBLE>)) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    import org.apache.spark.sql.functions._
    val viaCol = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VectorExpressions.vectorDot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("sq"))
      .orderBy(col("vec_id")).limit(5).collect()
    assert(viaSql.map(_.toSeq.toList).toList == viaCol.map(_.toSeq.toList).toList)
    // attrs_json via SQL: sorted keys, typed values
    val js = spark.sql(
      """SELECT attrs_json(array(
        |  named_struct('key', 'b', 'value',
        |    named_struct('stringValue', 'x', 'boolValue', CAST(NULL AS BOOLEAN),
        |      'intValue', CAST(NULL AS STRING), 'doubleValue', CAST(NULL AS DOUBLE),
        |      'bytesValue', CAST(NULL AS STRING))),
        |  named_struct('key', 'a', 'value',
        |    named_struct('stringValue', CAST(NULL AS STRING), 'boolValue', true,
        |      'intValue', CAST(NULL AS STRING), 'doubleValue', CAST(NULL AS DOUBLE),
        |      'bytesValue', CAST(NULL AS STRING)))
        |)) AS j""".stripMargin).collect().head.getString(0)
    assert(js == """{"a":true,"b":"x"}""", js)
  }

  test("kmv_bottomk aggregate: SQL == Column API == brute-force order statistic") {
    GraftExtensions.register(spark)
    register()
    import org.apache.spark.sql.functions._
    val hashed = Tables.events(spark, sf).select(col("event_type"),
      udf((s: String) => graft.functions.PortableHash.md5Lower63(s))
        .apply(col("user_id").cast("string")).as("h"))
    hashed.createOrReplaceTempView("hashed_events")
    val viaSql = spark.sql(
      """SELECT event_type, kmv_bottomk(h, 8).kth_hash AS kth,
        |       kmv_bottomk(h, 8).k_n AS k_n
        |FROM hashed_events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    val viaCol = hashed.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), 8).as("kmv"))
      .select(col("event_type"), col("kmv.kth_hash"), col("kmv.k_n"))
      .orderBy(col("event_type")).collect()
    assert(viaSql.map(_.toSeq.toList).toList == viaCol.map(_.toSeq.toList).toList)
    // brute force: kth smallest distinct hash per group
    val brute = hashed.distinct().collect()
      .groupBy(_.getString(0)).view.mapValues { rows =>
        val hs = rows.map(_.getLong(1)).distinct.sorted.take(8)
        (hs.last, hs.length.toLong)
      }.toMap
    viaSql.foreach { r =>
      val (kth, kn) = brute(r.getString(0))
      assert(r.getLong(1) == kth && r.getLong(2) == kn, s"mismatch: $r vs ($kth,$kn)")
    }
    // the aggregate must plan partial/final (map-side combine), not a sort
    val plan = hashed.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_bottomk") || plan.contains("ObjectHashAggregate"),
      s"expected a partial aggregate plan, got:\n$plan")
    assert(!plan.toLowerCase.contains("sortaggregate") || plan.contains("ObjectHashAggregate"),
      s"sketch must not require sorting every group:\n$plan")
  }

  test("round-9 expressions reachable from SQL: shingle_hashes, minhash_sig, " +
      "cdc_chunks, qsketch_bottomk_pairs — SQL == kernel") {
    GraftExtensions.register(spark)
    register()
    // shingle_hashes == the Scala kernel, and composes with minhash_sig
    val row = spark.sql(
      """SELECT shingle_hashes('a b c d') AS sh,
        |       minhash_sig(shingle_hashes('a b c d')) AS sig""".stripMargin)
      .collect().head
    assert(row.getSeq[Long](0) ==
      graft.functions.ShingleHash.computeArray("a b c d").toSeq)
    assert(row.getSeq[Long](1).length == graft.functions.MinhashSig.NumPerms)
    assert(row.getSeq[Long](1) == graft.functions.MinhashSig
      .computeArray(graft.functions.ShingleHash.computeArray("a b c d")).toSeq)
    // cdc_chunks over a real document == the gate's constants and kernel
    val doc = Tables.documents(spark, sf)
      .selectExpr("text").orderBy("text").limit(1).collect().head.getString(0)
    spark.sql("SELECT 1").collect() // keep the analyzer warm
    val viaSql = spark.sql(
      s"""SELECT cdc_chunks(split(text, ' '), 4, 32) AS ch
         |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin)
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(_.toSeq.toList).toList)
    import org.apache.spark.sql.functions._
    val viaCol = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.CdcChunksExpr(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            split(col("text"), " ")), 4, 32L)).as("ch"), col("doc_id"))
      .orderBy(col("doc_id")).limit(3)
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(_.toSeq.toList).toList)
    assert(viaSql.toList == viaCol.toList && doc.nonEmpty)
    // qsketch_bottomk_pairs: SQL aggregate == Column API
    val hashed = Tables.events(spark, sf).select(col("event_type"),
      graft.functions.PortableHash.md5Lower63Col(col("user_id").cast("string")).as("h"),
      col("value"))
    hashed.createOrReplaceTempView("hashed_events_pairs")
    val viaSqlP = spark.sql(
      """SELECT event_type, qsketch_bottomk_pairs(h, value, 16) AS sk
        |FROM hashed_events_pairs GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq.toList).toList).toMap
    val viaColP = hashed.groupBy(col("event_type"))
      .agg(graft.functions.QsketchAggregate.qsketchBottomKPairs(
        col("h"), col("value"), 16).as("sk"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq.toList).toList).toMap
    assert(viaSqlP == viaColP && viaSqlP.nonEmpty)
  }

  test("kmv_bottomk_set aggregate: SQL == Column API == brute-force set") {
    GraftExtensions.register(spark)
    register()
    import org.apache.spark.sql.functions._
    val hashed = Tables.events(spark, sf).select(col("event_type"),
      udf((s: String) => graft.functions.PortableHash.md5Lower63(s))
        .apply(col("user_id").cast("string")).as("h"))
    hashed.createOrReplaceTempView("hashed_events_set")
    val viaSql = spark.sql(
      """SELECT event_type, kmv_bottomk_set(h, 8) AS sk
        |FROM hashed_events_set GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    val viaCol = hashed.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomKSet(col("h"), 8).as("sk"))
      .orderBy(col("event_type")).collect()
    assert(viaSql.map(_.getSeq[Long](1).toList).toList ==
      viaCol.map(_.getSeq[Long](1).toList).toList)
    // brute force: the 8 smallest distinct hashes per group, ascending
    val brute = hashed.distinct().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).distinct.sorted.take(8).toList).toMap
    viaSql.foreach { r =>
      assert(r.getSeq[Long](1).toList == brute(r.getString(0)),
        s"set mismatch for ${r.getString(0)}")
    }
    // and the set form agrees with the (kth_hash, k_n) form
    val pair = hashed.groupBy(col("event_type"))
      .agg(graft.functions.KmvAggregate.kmvBottomK(col("h"), 8).as("kmv"))
      .orderBy(col("event_type")).collect()
    viaSql.zip(pair).foreach { case (s, p) =>
      val set = s.getSeq[Long](1)
      val st = p.getStruct(1)
      assert(set.last == st.getLong(0) && set.length.toLong == st.getLong(1))
    }
  }

  test("qsketch_bottomk aggregate: SQL == Column API == brute-force sample") {
    GraftExtensions.register(spark)
    register()
    import org.apache.spark.sql.functions._
    val hashed = Tables.events(spark, sf).select(col("event_type"),
      col("value"),
      udf((s: String) => graft.functions.PortableHash.md5Lower63(s))
        .apply(col("event_id").cast("string")).as("h"))
    hashed.createOrReplaceTempView("qsketch_events")
    val viaSql = spark.sql(
      """SELECT event_type, qsketch_bottomk(h, value, 16) AS sample
        |FROM qsketch_events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    val viaCol = hashed.groupBy(col("event_type"))
      .agg(graft.functions.QsketchAggregate
        .qsketchBottomK(col("h"), col("value"), 16).as("sample"))
      .orderBy(col("event_type")).collect()
    assert(viaSql.map(_.toSeq.toList).toList == viaCol.map(_.toSeq.toList).toList)
    // brute force: values of the 16 smallest (h, value) pairs, value-sorted
    val brute = hashed.collect()
      .groupBy(_.getString(0)).view.mapValues { rows =>
        rows.map(r => (r.getLong(2), r.getDouble(1))).distinct
          .sortBy(identity).take(16).map(_._2).sorted.toList
      }.toMap
    viaSql.foreach { r =>
      assert(r.getSeq[Double](1).toList == brute(r.getString(0)),
        s"sample mismatch for ${r.getString(0)}")
    }
  }
}
