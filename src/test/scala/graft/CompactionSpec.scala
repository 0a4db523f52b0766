package graft

import org.apache.spark.sql.functions._

import graft.io.Compaction

/** Small-file compaction: many-file table → few files, rows exactly
  * preserved, never in place. */
class CompactionSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("compaction merges a fragmented table without changing its rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    try {
      // fragment: 64 files for a ~100 KB table (the post-streaming shape)
      val src = operators.Tables.events(spark, sf)
      src.repartition(64).write.parquet(s"$tmp/fragmented")
      val (nFrag, fragBytes) = Compaction.listDataFiles(spark, s"$tmp/fragmented")
      assert(nFrag == 64, s"expected 64 fragment files, got $nFrag")

      val stats = Compaction.compact(spark, s"$tmp/fragmented", s"$tmp/compacted",
        targetFileBytes = fragBytes) // everything fits one target file
      assert(stats.inFiles == 64 && stats.outFiles == 1,
        s"64 files should compact to 1, got $stats")

      // rows exactly preserved (both directions of except = set equality;
      // events rows are unique by event_id)
      val before = spark.read.parquet(s"$tmp/fragmented")
      val after = spark.read.parquet(s"$tmp/compacted")
      assert(after.count() == before.count())
      assert(after.except(before).isEmpty && before.except(after).isEmpty)
    } finally graft.io.Storage.deleteRecursively(new java.io.File(tmp))
  }

  test("compaction targets file size, refuses in-place, rebalance shuffles") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    try {
      operators.Tables.events(spark, sf).repartition(16)
        .write.parquet(s"$tmp/in")
      val (_, bytes) = Compaction.listDataFiles(spark, s"$tmp/in")
      // quarter-size target → 4 output files (±1 for rounding)
      val stats = Compaction.compact(spark, s"$tmp/in", s"$tmp/out4",
        targetFileBytes = math.max(bytes / 4, 1L))
      assert(stats.outFiles >= 3 && stats.outFiles <= 5,
        s"quarter-size target should yield ~4 files, got ${stats.outFiles}")
      // rebalance path produces the same row set
      val stats2 = Compaction.compact(spark, s"$tmp/in", s"$tmp/outR",
        targetFileBytes = bytes, rebalance = true)
      assert(stats2.outFiles == 1)
      assert(spark.read.parquet(s"$tmp/outR").count() ==
        spark.read.parquet(s"$tmp/in").count())
      intercept[IllegalArgumentException] {
        Compaction.compact(spark, s"$tmp/in", s"$tmp/in")
      }
    } finally graft.io.Storage.deleteRecursively(new java.io.File(tmp))
  }
}
