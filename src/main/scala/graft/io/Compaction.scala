package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operator every streaming
  * ingest needs at scale: micro-batches write a file per trigger per
  * partition, and a year of 30-second triggers turns a table into millions
  * of KB-sized parquet files whose open/footer costs dominate every scan
  * (the reference's batcher exists to bound this at write time —
  * `/root/reference/src/batch/mod.rs` flushes on rows/bytes/age — but
  * nothing bounds it across restarts and partitions; compaction is the
  * at-rest complement).
  *
  * Strategy: measure the table's real on-disk bytes from the file listing
  * (no sampling, no stats dependency), rewrite into
  * `ceil(bytes / targetFileBytes)` files. The rewrite uses `coalesce` —
  * compaction is IO-bound and coalesce moves NO rows between executors
  * (each output task concatenates whole input splits); `repartition` (a
  * full shuffle) is opt-in for when input files are pathologically skewed
  * and balanced outputs matter more than the shuffle. Safety: writes to a
  * NEW directory (never in place) so a failed rewrite leaves the source
  * untouched — the caller swaps directories after validating, which is
  * the only atomic-publish primitive a plain filesystem offers.
  */
object Compaction {

  /** What a compaction run did: input file count/bytes → output files. */
  final case class CompactStats(inFiles: Long, inBytes: Long, outFiles: Long)

  /** Recursively sum (count, bytes) of data files under `dir`, skipping
    * hidden/metadata entries (`_SUCCESS`, `.crc`). */
  private[graft] def listDataFiles(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1L; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  /** Compact the parquet table at `inPath` into `outPath` with files of
    * ~`targetFileBytes` (compressed size heuristic: output ≈ input bytes,
    * which holds for a same-codec rewrite). Returns the measured stats. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20,
      rebalance: Boolean = false): CompactStats = {
    require(new Path(inPath).toUri != new Path(outPath).toUri,
      "compaction never rewrites in place — write to a new directory and swap")
    val (inFiles, inBytes) = listDataFiles(spark, inPath)
    val nOut = math.max(1L, (inBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    val sized = if (rebalance) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").option("compression", "snappy").parquet(outPath)
    val (outFiles, _) = listDataFiles(spark, outPath)
    CompactStats(inFiles, inBytes, outFiles)
  }
}
