package graft

import org.apache.spark.sql.functions._

import graft.operators.OtelQueries

/** Span-tree assembly ([[OtelQueries.traceDepth]]) against (a) a generated
  * depth-3 corpus with closed-form shape and (b) the reference's golden
  * traces, which exercise the orphan path (6 of 19 golden spans carry a
  * parent id that is absent from the table). */
class TraceAssemblySpec extends SparkTestBase {

  test("depth-3 generated corpus: every trace assembles to its closed form") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tracedepth").toFile
    try {
      val n = TestDataGen.writeTraces(dir.getAbsolutePath, tracesPerFile = 200,
        childrenPerTrace = 2, grandchildrenPerChild = 3)
      // 1 root + 2 children + 2*3 grandchildren = 9 spans per trace
      assert(n == TestDataGen.Services * TestDataGen.TracesPerService * 9L)
      val flat = graft.transform.Otlp.traces(
        graft.io.OtlpRead.jsonl(spark, graft.io.OtlpRead.Traces, dir.getAbsolutePath))
      val out = OtelQueries.traceDepth(flat).collect()
      assert(out.length == TestDataGen.Services * TestDataGen.TracesPerService)
      out.foreach { r =>
        assert(r.getAs[Long]("n_spans") == 9L, s"bad span count: $r")
        assert(r.getAs[Long]("max_depth") == 3L, s"bad depth: $r")
        assert(r.getAs[Long]("n_roots") == 1L)
        assert(r.getAs[Long]("n_orphans") == 0L)
        assert(r.getAs[String]("root_name").endsWith(".handle"))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("golden traces: roots at depth 1, missing parents surface as orphans") {
    val golden = spark.read.parquet("/root/reference/testdata/parquet/traces.parquet")
    val out = OtelQueries.traceDepth(golden).collect()
    assert(out.length == 19) // 19 single-span traces
    val (rooted, orphaned) = out.partition(_.getAs[Long]("max_depth") == 1L)
    // 6 golden spans have ParentSpanId NULL (true roots); the other 13
    // carry a parent id absent from the table (partial traces → orphans)
    assert(rooted.length == 6 && orphaned.length == 13)
    rooted.foreach { r =>
      assert(r.getAs[Long]("n_roots") == 1L && r.getAs[Long]("n_orphans") == 0L)
      assert(r.getAs[String]("root_name") != null)
    }
    orphaned.foreach { r =>
      assert(r.getAs[Long]("max_depth") == 0L)
      assert(r.getAs[Long]("n_roots") == 0L && r.getAs[Long]("n_orphans") == 1L)
      assert(r.getAs[String]("root_name") == null)
    }
  }
}
