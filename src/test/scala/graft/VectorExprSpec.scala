package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vectorDot

/** [[graft.functions.VectorDotExpr]]: codegen correctness (with fallback
  * disabled, so a broken doGenCode fails loudly), null semantics, and
  * numerical parity with a plain left-fold. */
class VectorExprSpec extends SparkTestBase {

  test("vector_dot computes the left-fold dot product under codegen") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(11)
      val rows = Seq.fill(100)(
        (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
      val got = rows.toDF("a", "b")
        .select(vectorDot(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
      val want = rows.map { case (a, b) =>
        var acc = 0.0
        var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      assert(got.toSeq == want, "codegen result must equal the left-fold")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("vector_dot: null input → null; length mismatch → shorter prefix") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0, 9.0)), Some(Seq(5.0, 6.0)))
    ).toDF("a", "b")
    val got = df.select(vectorDot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 17.0)
  }

  test("vector_dot: a null ELEMENT yields null, never a silent zero") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val got = df.select(vectorDot(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0), "null element must poison the dot product")
    assert(got(1).getDouble(0) == 11.0)
  }

  test("vector_dot rejects non-double arrays at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), "x")).toDF("a", "b")
    intercept[Exception] {
      df.select(vectorDot(col("a"), col("b"))).collect()
    }
  }
}
