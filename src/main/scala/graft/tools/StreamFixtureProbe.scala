package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 15): split the three multi-trigger maintenance
  * gates' wall into their FIXED-COST phases — index clone (FileUtil.copy
  * of the memoized table), landing-file construction (nMb coalesce(1)
  * write jobs), and the remainder (trigger machinery + probe/upsert +
  * verify) — so the optimization aims at the measured block, not the
  * guessed one. Phases are re-measured standalone (clone and landing are
  * re-runnable side-effect-free into fresh temp dirs); the gate total is
  * the usual warm interleaved median. */
object StreamFixtureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // memo build happens on first touch — time it separately so the phase
    // numbers below are warm
    val (tIdx, idxDir) = time(graft.operators.Dedup.bandIndexTable(spark, sfDir))
    println(f"band index memo (first touch): $tIdx%.2f s at $idxDir")
    val (tAnnIdx, annIdxDir) =
      time(graft.operators.Similarity.ivfPqBaseIndexTable(spark, sfDir))
    println(f"ivfpq base index memo (first touch): $tAnnIdx%.2f s at $annIdxDir")

    val conf = spark.sparkContext.hadoopConfiguration
    def cloneCost(label: String, srcDir: String): Unit = {
      val ts = (1 to reps).map { _ =>
        val work = java.nio.file.Files.createTempDirectory("graft-cloneprobe")
        val src = new org.apache.hadoop.fs.Path(srcDir)
        val fs = src.getFileSystem(conf)
        val (t, _) = time(org.apache.hadoop.fs.FileUtil.copy(fs, src,
          fs, new org.apache.hadoop.fs.Path(s"$work/index"), false, conf))
        graft.io.Storage.deleteRecursively(work.toFile)
        t
      }
      val files = {
        def count(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(count).sum else 1
        count(new java.io.File(srcDir))
      }
      println(f"$label clone (FileUtil.copy, $files files): " +
        ts.map(t => f"$t%.2f").mkString(" ") + " s")
    }
    cloneCost("bandindex", idxDir)
    cloneCost("ivfpq", annIdxDir)

    // landing-file construction as the gates do it: nMb filter+coalesce(1)
    // write jobs + a file move each
    def landingCost(label: String, nMb: Int, docs: org.apache.spark.sql.DataFrame,
        mbCol: String): Unit = {
      val ts = (1 to reps).map { _ =>
        val work = java.nio.file.Files.createTempDirectory("graft-landprobe")
        val landing = new java.io.File(work.toFile, "landing")
        landing.mkdirs()
        val (t, _) = time {
          (0 until nMb).foreach { m =>
            val tmp = s"$work/mb$m-tmp"
            docs.filter(pmod(col(mbCol), lit(nMb.toLong)) === m.toLong)
              .coalesce(1).write.parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .find(f => f.getName.endsWith(".parquet")).get
            java.nio.file.Files.move(part.toPath,
              new java.io.File(landing, s"mb$m.parquet").toPath)
            graft.io.Storage.deleteRecursively(new java.io.File(tmp))
          }
        }
        graft.io.Storage.deleteRecursively(work.toFile)
        t
      }
      println(f"$label landing ($nMb files): " +
        ts.map(t => f"$t%.2f").mkString(" ") + " s")
    }
    val isBatch = col("doc_id") % graft.operators.Dedup.IncrementalBatchMod === 3L
    val docsB = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(isBatch).select(col("doc_id"), col("text"))
    landingCost("dedup-multi", graft.operators.Dedup.StreamDedupMicroBatches,
      docsB, "doc_id")

    // gate totals, warm interleaved
    val gates = Seq("stream_dedup_lsh_multi", "stream_dedup_lsh_pruned",
      "stream_ann_ivfpq")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (i <- 1 to reps; g <- gates) {
      spark.catalog.clearCache()
      System.gc()
      val (t, n) = time(graft.SparkEntry.queries(g)(spark, sfDir).count())
      println(f"$g rep $i: $t%.2f s ($n rows)")
      if (i > 1) times(g) = times(g) :+ t
    }
    gates.foreach { g =>
      val ts = times(g).sorted
      if (ts.nonEmpty) println(f"$g%-26s median ${ts(ts.length / 2)}%.2f s")
    }
    spark.stop()
  }
}
