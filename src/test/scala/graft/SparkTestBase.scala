package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

trait SparkTestBase extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestBase.session

  /** Cell-by-cell frame equality after sorting by `sortCols`; normalizes
    * binary/array cells so diffs are readable. */
  def assertFrameEqual(actual: DataFrame, expected: DataFrame,
      sortCols: Seq[String]): Unit = {
    val acols = actual.columns.toSeq
    assert(acols == expected.columns.toSeq,
      s"column mismatch: $acols vs ${expected.columns.toSeq}")
    val a = actual.orderBy(sortCols.map(actual(_)): _*).collect()
    val e = expected.orderBy(sortCols.map(expected(_)): _*).collect()
    assert(a.length == e.length, s"row count ${a.length} != ${e.length}")
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: scala.collection.Seq[_] => s.map(norm).toList
      case other => other
    }
    a.zip(e).zipWithIndex.foreach { case ((ra, re), i) =>
      acols.indices.foreach { j =>
        val (va, ve) = (norm(ra.get(j)), norm(re.get(j)))
        assert(va == ve,
          s"row $i col ${acols(j)}: actual=[$va] expected=[$ve]\nactual row: $ra\nexpected row: $re")
      }
    }
  }
}

object SparkTestBase {
  // default 4 cores keeps the suite's partition-boundary coverage honest;
  // the opt-in scale specs (CcScaleSpec) override via env for wall-time
  private val cores = sys.env.getOrElse("GRAFT_TEST_CORES", "4")
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
