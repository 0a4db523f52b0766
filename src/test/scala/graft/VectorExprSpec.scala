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

  // ---- round-10 kernels: codegen parity + the NaN/tie edge semantics ------

  private def round6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  test("assignCos kernel under codegen (no fallback): argmax with " +
      "smaller-id ties and NaN-ranks-largest, incl. zero-norm vectors") {
    import spark.implicits._
    import graft.functions.VectorExpressions.assignCos
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cents = Array(
        Array(1.0, 0.0), Array(1.0, 0.0), // duplicate: tie must pick cl 0
        Array(0.0, 1.0))
      val cNrm = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val rnd = new scala.util.Random(23)
      val vecs = Seq.fill(200)(Seq.fill(2)(rnd.nextDouble() * 2 - 1)) ++
        Seq(Seq(0.0, 0.0)) // zero norm: every cos NaN → NaN-first keeps cl 0
      val got = vecs.toDF("v")
        .select(assignCos(col("v"), cents).as("a"))
        .select(col("a._1"), col("a._2")).collect()
        .map(r => (r.getInt(0), r.getDouble(1)))
      val want = vecs.map { v =>
        val nrm = math.sqrt(v.map(x => x * x).sum)
        def better(c: Double, b: Double) =
          if (c.isNaN) !b.isNaN else !b.isNaN && c > b
        var best = 0; var bestCos = Double.NaN
        cents.indices.foreach { c =>
          val cos = round6(v.zip(cents(c)).map { case (a, b) => a * b }.sum
            / (nrm * cNrm(c)))
          if (c == 0 || better(cos, bestCos)) { bestCos = cos; best = c }
        }
        (best, bestCos)
      }
      got.zip(want).foreach { case ((gb, gc), (wb, wc)) =>
        assert(gb == wb && (gc == wc || (gc.isNaN && wc.isNaN)))
      }
      // the duplicate-centroid tie really resolved to the smaller id
      assert(got.forall(_._1 != 1))
      // the zero-norm row assigned to cluster 0 with NaN score, no crash
      assert(got.last._1 == 0 && got.last._2.isNaN)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("assignL2 / pqEncode / adcDist / queryL2 / residual kernels: " +
      "codegen parity with the plain-Scala distance chain") {
    import spark.implicits._
    import graft.functions.VectorExpressions._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(41)
      val dim = 8
      val cents = Array.fill(4)(Array.fill(dim)(rnd.nextDouble()))
      def sq6(a: Array[Double], b: Array[Double]): Double = {
        var aa = 0.0; var ab = 0.0; var bb = 0.0; var i = 0
        while (i < a.length) {
          aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1 }
        round6(aa - 2.0 * ab + bb)
      }
      val vecs = (0L until 50L).map(id =>
        (id, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      val df = vecs.toDF("id", "v")
      // assignL2
      val gotA = df.select(col("id"), assignL2(col("v"), cents).as("a"))
        .collect().map(r => r.getLong(0) ->
          (r.getStruct(1).getInt(0), r.getStruct(1).getDouble(1))).toMap
      vecs.foreach { case (id, v) =>
        val ds = cents.map(c => sq6(v.toArray, c))
        val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
        assert(gotA(id) == ((best._2, best._1)), s"assignL2 $id")
      }
      // residual: round6(v - cents[cl]) under the struct-selected cluster
      val gotR = df
        .withColumn("cl", assignL2(col("v"), cents).getField("_1").cast("long"))
        .select(col("id"), col("cl"), residual(col("cl"), col("v"), cents))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
      gotR.foreach { case (id, cl, res) =>
        val v = vecs(id.toInt)._2
        val want = v.toArray.zip(cents(cl.toInt))
          .map { case (a, b) => round6(a - b) }.toSeq
        assert(res == want, s"residual $id")
      }
      // pqEncode (2 subspaces of dim/2) + adcDist + queryL2
      val books = Array.fill(2)(Array.fill(3)(Array.fill(dim / 2)(rnd.nextDouble())))
      val enc = df.select(col("id"), pqEncode(col("v"), books, dim / 2).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (id, v) =>
        val want = (0 until 2).map { s =>
          val sub = v.toArray.slice(s * dim / 2, (s + 1) * dim / 2)
          books(s).zipWithIndex.map { case (c, i) => (sq6(sub, c), i) }
            .minBy { case (d, i) => (d, i) }._2
        }
        assert(enc(id) == want, s"pqEncode $id")
      }
      val luts: Map[Long, Array[Array[Double]]] = (0L until 4L).map { q =>
        val qv = vecs(q.toInt)._2.toArray
        q -> Array.tabulate(2, 3) { (s, c) =>
          sq6(qv.slice(s * dim / 2, (s + 1) * dim / 2), books(s)(c)) }
      }.toMap
      val qVecs = (0L until 4L).map(q => q -> vecs(q.toInt)._2.toArray).toMap
      val scored = df.filter(col("id") < 4)
        .select(col("id"),
          adcDist(col("id"), pqEncode(col("v"), books, dim / 2), luts).as("ad"),
          queryL2(col("id"), col("v"), qVecs).as("qd"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      scored.foreach { case (q, ad, qd) =>
        val codes = enc(q)
        val wantAd = round6(luts(q)(0)(codes(0)) + luts(q)(1)(codes(1)))
        assert(ad == wantAd, s"adc $q")
        assert(qd == sq6(qVecs(q), vecs(q.toInt)._2.toArray), s"queryL2 $q")
      }
      // null child → null result (kernels are standard null-intolerant)
      val nd = Seq((1L, Option.empty[Seq[Double]])).toDF("id", "v")
      assert(nd.select(assignL2(col("v"), cents)).collect()(0).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("IdDecodeExpr null contract under codegen: absent ids → zero id " +
      "(NOT null); or-null mode keeps root spans null; invalid ids throw") {
    import spark.implicits._
    import graft.transform.OtlpUdfs.{idBytes8, idHex8, idHex8OrNull, idHex16}
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        Option("EjRWeJCrze8"),  // base64 of 8 bytes 0x123456789abcdef
        Option(""),              // empty → zero id
        Option.empty[String]     // null → zero id
      ).toDF("s")
      val hex = df.select(idHex8(col("s"))).collect().map(_.getString(0))
      assert(hex(1) == "0000000000000000" && hex(2) == "0000000000000000")
      assert(hex(0).length == 16 && hex(0) != "0000000000000000")
      val orNull = df.select(idHex8OrNull(col("s"))).collect()
      assert(orNull(0).getString(0) == hex(0))
      assert(orNull(1).isNullAt(0) && orNull(2).isNullAt(0))
      val bytes = df.select(idBytes8(col("s"))).collect()
        .map(_.getAs[Array[Byte]](0))
      assert(bytes(1).forall(_ == 0) && bytes(1).length == 8)
      // 32-char hex decodes as hex, not base64
      val h16 = Seq("000102030405060708090a0b0c0d0e0f").toDF("s")
        .select(idHex16(col("s"))).collect()(0).getString(0)
      assert(h16 == "000102030405060708090a0b0c0d0e0f")
      intercept[Exception] {
        Seq("!!!not-an-id!!!").toDF("s").select(idHex8(col("s"))).collect()
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
