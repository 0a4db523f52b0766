package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the round-10 kernel-vs-UDF gap on the embedding assign loop at
  * a corpus size where the per-row conversion tax is visible — the gate
  * corpora (500–5k vectors) are vector-count-bound, so the sweep can't
  * show what the kernels buy at real embedding scale.
  *
  * Generates N synthetic 64-dim vectors (deterministic congruence values,
  * cached), then times three passes of the identical spherical-k-means
  * assignment (8 centroids, argmax round6 cosine) through:
  *   - `kernel`: the production [[graft.functions.CosAssignKernel]]
  *     expression (primitive ArrayData loop inside codegen);
  *   - `udf`: a faithful replica of the pre-round-10 Scala UDF (boxed
  *     Seq[Double] per row, ScalaUDF eval fence).
  * Both reduce to the same checksum aggregate so neither path can elide
  * work; the checksums must MATCH (same loop semantics) or the probe
  * aborts. Prints one JSON line per (path, pass).
  *
  * Usage: VecKernelProbe [nVectors] (default 2,000,000)
  */
object VecKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic corpus: 64 doubles per row from integer congruences
    val vecs = spark.range(n)
      .select(col("id"), transform(sequence(lit(0), lit(63)),
        i => ((col("id") * 31L + i * 7L) % 1000L).cast("double") / 1000.0)
        .as("v"))
      .persist()
    vecs.count()

    val cents: Array[Array[Double]] = Array.tabulate(8, 64) { (c, i) =>
      ((c * 13 + i * 3) % 17).toDouble / 17.0
    }

    def kernelCol = graft.functions.VectorExpressions.assignCos(col("v"), cents)

    // the pre-round-10 shape, verbatim loop
    def udfCol = {
      val cNrm = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val u = udf { (v: Seq[Double]) =>
        val arr = v.toArray
        val nrm = math.sqrt(arr.map(x => x * x).sum)
        def better(cand: Double, best: Double): Boolean =
          if (cand.isNaN) !best.isNaN else !best.isNaN && cand > best
        var best = 0
        var bestCos = Double.NaN
        var c = 0
        while (c < cents.length) {
          val cent = cents(c)
          var acc = 0.0
          var i = 0
          while (i < arr.length) { acc += arr(i) * cent(i); i += 1 }
          val cos = math.floor(acc / (nrm * cNrm(c)) * 1000000.0 + 0.5) / 1000000.0
          if (c == 0 || better(cos, bestCos)) { bestCos = cos; best = c }
          c += 1
        }
        (best, bestCos)
      }
      u(col("v"))
    }

    def checksum(assigned: DataFrame): (Long, Double) = {
      val r = assigned
        .agg(sum(col("a._1").cast("long") * (col("id") % 97L)).as("cs"),
          sum(col("a._2")).as("sc")).head
      (r.getLong(0), r.getDouble(1))
    }

    def timePass(name: String, c: org.apache.spark.sql.Column): (Long, Double) = {
      val t0 = System.nanoTime()
      val cs = checksum(vecs.withColumn("a", c))
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"$name","n":$n,"wall_s":$wall%.2f,"rows_per_s":${(n / wall).toLong}}""")
      cs
    }

    var csK: (Long, Double) = null
    var csU: (Long, Double) = null
    (1 to 3).foreach { _ =>
      csK = timePass("kernel", kernelCol)
      csU = timePass("udf", udfCol)
    }
    require(csK == csU, s"checksum mismatch: kernel=$csK udf=$csU")
    println(s"""{"checksums_match":true,"cs":${csK._1}}""")
    spark.stop()
  }
}
