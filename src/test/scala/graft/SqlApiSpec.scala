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
}
