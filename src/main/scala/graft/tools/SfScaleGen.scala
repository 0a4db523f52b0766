package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an N×-scaled copy of a driver-generated sf directory (round-6
  * verdict task 6: run the full sweep at sf1 to catch hidden
  * super-linearity — the triangle-projection k² would have been caught by
  * exactly this). Each copy key-shifts every entity id consistently
  * (orders↔lineitem↔customer/supplier/part joins still land; nation/region
  * are fixed-size dimensions at every sf, like TPC-H), so join
  * cardinalities and group counts scale linearly — the property a scaling
  * probe needs.
  *
  * Two columns are DECORRELATED per copy rather than replicated verbatim,
  * because verbatim copies would manufacture quadratic work that sf1 data
  * would not contain (every doc/vector gaining 9 identical twins →
  * near-dup families of 10 everywhere):
  *   - `documents.text`: deterministic per-copy word shuffle (hash-seeded
  *     Fisher–Yates) — destroys cross-copy shingle overlap while keeping
  *     length/vocabulary distributions;
  *   - `embeddings.embedding`: deterministic per-(copy,dim) perturbation
  *     then L2 renormalize — pushes cross-copy cosine well under the
  *     near-dup thresholds while keeping the space's geometry.
  *
  * Usage: SfScaleGen <srcSfDir> <dstDir> <copies>
  */
object SfScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SfScaleGen <srcSfDir> <dstDir> <copies>")
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    // One offset per key DOMAIN, computed from the domain's PARENT table and
    // applied to every referencing column (c_custkey and o_custkey shift by
    // the same amount, etc.). Deriving each column's offset from its own
    // table would break cross-copy joins whenever the highest parent key is
    // unreferenced by a child — the maxima only coincide by luck in the
    // current testdata.
    def domainMax(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0)
    val custOff  = domainMax("customer", "c_custkey") + 1L
    val suppOff  = domainMax("supplier", "s_suppkey") + 1L
    val partOff  = domainMax("part", "p_partkey") + 1L
    val orderOff = domainMax("orders", "o_orderkey") + 1L
    // single-table domains — the owning table is its own parent
    val eventOff = domainMax("events", "event_id") + 1L
    val userOff  = domainMax("events", "user_id") + 1L
    val docOff   = domainMax("documents", "doc_id") + 1L
    val vecOff   = domainMax("embeddings", "vec_id") + 1L
    // FK sanity: every child key must sit inside its parent domain, or the
    // shared offset would not cover the child and copies could collide
    def assertContained(childT: String, childC: String, parentMax: Long): Unit = {
      val m = domainMax(childT, childC)
      require(m < parentMax,
        s"$childT.$childC max $m outside parent domain (max offset $parentMax)")
    }
    assertContained("orders", "o_custkey", custOff)
    assertContained("lineitem", "l_orderkey", orderOff)
    assertContained("lineitem", "l_partkey", partOff)
    assertContained("lineitem", "l_suppkey", suppOff)

    // one row per (source row, copy) via a small range cross join; each key
    // column shifts by copy × its domain offset, so copies never collide and
    // every FK still lands on the same copy's parent row
    def replicate(df: DataFrame, shifts: Seq[(String, Long)]): DataFrame = {
      val cp = spark.range(0L, copies.toLong).select(col("id").as("_copy"))
      shifts.foldLeft(df.crossJoin(broadcast(cp))) { case (acc, (c, off)) =>
        acc.withColumn(c, col(c) + col("_copy") * off)
      }
    }

    write(read("nation"), "nation")
    write(read("region"), "region")
    write(replicate(read("customer"), Seq("c_custkey" -> custOff)).drop("_copy"),
      "customer")
    write(replicate(read("supplier"), Seq("s_suppkey" -> suppOff)).drop("_copy"),
      "supplier")
    write(replicate(read("part"), Seq("p_partkey" -> partOff)).drop("_copy"), "part")
    write(replicate(read("orders"),
      Seq("o_orderkey" -> orderOff, "o_custkey" -> custOff)).drop("_copy"), "orders")
    write(replicate(read("lineitem"),
      Seq("l_orderkey" -> orderOff, "l_partkey" -> partOff,
        "l_suppkey" -> suppOff)).drop("_copy"), "lineitem")
    write(replicate(read("events"),
      Seq("event_id" -> eventOff, "user_id" -> userOff)).drop("_copy"), "events")

    // documents: shuffle words deterministically per (doc, copy)
    val shuffleWords = udf { (text: String, seed: Long) =>
      if (text == null) null
      else {
        val words = text.split(" ")
        val rnd = new scala.util.Random(seed)
        val arr = words.clone()
        var i = arr.length - 1
        while (i > 0) {
          val j = rnd.nextInt(i + 1)
          val t = arr(i); arr(i) = arr(j); arr(j) = t
          i -= 1
        }
        arr.mkString(" ")
      }
    }
    val docs = replicate(read("documents"), Seq("doc_id" -> docOff))
      .withColumn("text",
        when(col("_copy") === 0L, col("text"))
          .otherwise(shuffleWords(col("text"),
            xxhash64(col("doc_id"), col("_copy")))))
      .drop("_copy")
    write(docs, "documents")

    // embeddings: perturb + renormalize per copy (copy 0 stays verbatim)
    val emb = replicate(read("embeddings"), Seq("vec_id" -> vecOff))
      .withColumn("noisy",
        expr("""transform(embedding, (x, i) ->
                 x + CAST(pmod(xxhash64(vec_id, _copy, i), 1000) - 500 AS FLOAT) / 1000.0F)"""))
      .withColumn("nrm",
        expr("CAST(sqrt(aggregate(noisy, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS FLOAT)"))
      .withColumn("embedding",
        when(col("_copy") === 0L, col("embedding"))
          .otherwise(expr("transform(noisy, x -> CAST(x / nrm AS FLOAT))")))
      .drop("_copy", "noisy", "nrm")
    write(emb, "embeddings")
  }
}
