package graft

import org.apache.spark.sql.functions._

import graft.operators.{QuerySurface, Tables, TextAnalysis}

/** Round-7 operator semantics: the wide→long unpivot gate and the
  * quality-decile ntile gate. */
class Round7OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("unpivot: one row group per (flag, measure), sums match direct aggregation") {
    val got = QuerySurface.unpivotMeasures(spark, sf).collect()
    val flags = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(got.length == flags * 4, s"expected $flags flags x 4 measures")

    // the melted-then-aggregated sum must equal the direct column sum
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(Tables.exactSum(col("l_quantity"), 8, 2).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.filter(_.getAs[String]("measure") == "l_quantity").foreach { r =>
      assert(r.getAs[Double]("sum_value") == direct(r.getAs[String]("l_returnflag")))
    }

    // the melt itself must plan as Expand (narrow), not a join or UDF
    val plan = QuerySurface.unpivotMeasures(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot should plan via Expand:\n$plan")
  }

  test("quality ntile: 10 near-equal deciles, monotone in score, total coverage") {
    val rows = TextAnalysis.qualityNtile(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)

    val byDecile = rows.groupBy(_.getAs[Long]("decile"))
    assert(byDecile.keySet == (1L to 10L).toSet)
    // SQL-standard ntile distribution: sizes differ by at most one
    val sizes = byDecile.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"decile sizes: $sizes")
    // deciles are monotone in (score, doc_id): every doc in decile d
    // precedes every doc in decile d+1 under the total order
    val maxKey = byDecile.view.mapValues(_.map(r =>
      (r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id"))).max).toMap
    val minKey = byDecile.view.mapValues(_.map(r =>
      (r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id"))).min).toMap
    (1L to 9L).foreach { d =>
      assert(Ordering[(Double, Long)].lt(maxKey(d), minKey(d + 1)),
        s"decile $d overlaps ${d + 1}")
    }
  }
}
