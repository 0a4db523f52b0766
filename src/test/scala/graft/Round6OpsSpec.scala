package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.io.FooterStamp
import graft.operators.{Graph, QuerySurface}

/** Round-6 operator semantics: the triangle-projection fan-out cap (the
  * documented-not-implemented scale-killer from the round-5 verdict), the
  * degree-ordered census orientation, the footer-stamp ingest knob, and the
  * funnel's NULL-rate rule on empty stages. */
class Round6OpsSpec extends SparkTestBase {

  test("triangle projection: hot-customer pair fan-out bounded by the cap, not k²") {
    // one customer buying from k = 1000 suppliers would emit C(1000,2) =
    // 499,500 pairs into the projection join; the cap keeps the top-100
    // suppliers under the (c, s) total order, bounding it at C(100,2) =
    // 4,950 — per customer, at any k
    val hot = spark.range(1L, 1001L)
      .select(lit(1L).as("c"), col("id").as("s"))
    val normal = spark.range(0L, 9L) // customers 2-4 × suppliers 2000-2002
      .select((col("id") % 3 + 2L).as("c"), (expr("id div 3") + 2000L).as("s"))
    val cs = hot.unionByName(normal).localCheckpoint(true)

    val capped = Graph.supplierPairs(cs, 100).localCheckpoint(true)
    val hotPairs = capped.filter(col("src") < 2000L).count()
    assert(hotPairs == 100L * 99L / 2,
      s"hot customer must emit C(cap,2) = 4950 pairs, got $hotPairs")
    // the capped projection keeps exactly the cap's lowest supplier ids
    assert(capped.filter(col("src") < 2000L)
      .agg(max(col("dst"))).head.getLong(0) == 100L)
    // normal customers are untouched by the cap
    assert(capped.filter(col("src") >= 2000L).count() == 3L * 3L)

    val uncapped = Graph.supplierPairs(cs, Int.MaxValue)
      .filter(col("src") < 2000L).count()
    assert(uncapped == 1000L * 999L / 2, s"uncapped control is k², got $uncapped")
  }

  test("degree-ordered census: equal to id-ordered, join width bounded on a star") {
    // star: center 0 ↔ leaves 1..200, plus the leaf ring (i, i+1) — every
    // ring edge closes a triangle through the center (199 triangles). Under
    // ID order the center (id 0) carries all 200 star edges as src: join
    // width 200 = its raw degree. Under DEGREE order every star edge points
    // leaf → center, so no node's out-degree exceeds the ring's ~3 —
    // within the O(√(2E)) bound the orientation guarantees.
    val star = spark.range(1L, 201L).select(lit(0L).as("src"), col("id").as("dst"))
    val ring = spark.range(1L, 200L).select(col("id").as("src"), (col("id") + 1L).as("dst"))
    val edges = star.unionByName(ring).localCheckpoint(true)

    val idCensus = Graph.censusFromEdges(edges, degreeOrdered = false)
    val degCensus = Graph.censusFromEdges(edges, degreeOrdered = true)
    val row = idCensus.head
    assert(row.getAs[Long]("n_nodes") == 201L)
    assert(row.getAs[Long]("n_edges") == 399L)
    assert(row.getAs[Long]("n_triangles") == 199L)
    assertFrameEqual(degCensus, idCensus, Seq("n_nodes"))

    val deg = edges.select(col("src").as("v"))
      .unionByName(edges.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    def maxOutDegree(oriented: org.apache.spark.sql.DataFrame): Long =
      oriented.groupBy(col("src")).agg(count(lit(1)).as("w"))
        .agg(max(col("w"))).head.getLong(0)
    val idWidth = maxOutDegree(edges)
    val degWidth = maxOutDegree(Graph.orientByDegree(edges, deg))
    val bound = math.ceil(math.sqrt(2.0 * 399)).toLong // √(2|E|) ≈ 29
    assert(idWidth == 200L, s"id order concentrates the star on the center: $idWidth")
    assert(degWidth <= bound,
      s"degree order must bound join width at √(2E) = $bound, got $degWidth")
  }

  test("ingest stamps schema-version footers when writer.footer_stamp is on, not when off") {
    def kvOf(root: String): Seq[Option[String]] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val base = new Path(s"$root/otel_logs")
      val fs = base.getFileSystem(conf)
      val it = fs.listFiles(base, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
          val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
            finally r.close()
          out += kv.get(FooterStamp.SchemaVersionKey)
        }
      }
      out.toSeq
    }
    val src = "/root/reference/testdata/logs.jsonl"
    val version = graft.schema.OtlpSchemas.LogsSchemaVersion

    val onRoot = java.nio.file.Files.createTempDirectory("graft-stamp-on").toString
    val cfgOn = Config.GraftConfig(
      writer = Config.WriterConfig(footerStamp = true))
    Ingest.run(spark, cfgOn, "logs", "jsonl", Seq(src), onRoot,
      new Telemetry(spark.sparkContext))
    val stamped = kvOf(onRoot)
    assert(stamped.nonEmpty && stamped.forall(_.contains(version)),
      s"every footer must carry $version when the knob is on: $stamped")

    val offRoot = java.nio.file.Files.createTempDirectory("graft-stamp-off").toString
    Ingest.run(spark, Config.GraftConfig(), "logs", "jsonl", Seq(src), offRoot,
      new Telemetry(spark.sparkContext))
    val unstamped = kvOf(offRoot)
    assert(unstamped.nonEmpty && unstamped.forall(_.isEmpty),
      "no footer may carry the stamp when the knob is off")

    graft.io.Storage.deleteRecursively(new java.io.File(onRoot))
    graft.io.Storage.deleteRecursively(new java.io.File(offRoot))
  }

  test("funnel: empty upstream stages yield NULL rates, never NaN/Infinity") {
    // a signup-free corpus: n_signup = 0 must produce NULL conversion
    // rates on both engines (the oracle's NULLIF mirrors the when())
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-empty").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type") === "click")
      .write.parquet(s"$tmp/events.parquet")
    val row = QuerySurface.funnel(spark, tmp).head
    assert(row.getAs[Long]("n_signup") == 0L)
    assert(row.getAs[Long]("n_click_after") == 0L)
    assert(row.isNullAt(row.fieldIndex("rate_click")), "rate_click must be NULL")
    assert(row.isNullAt(row.fieldIndex("rate_purchase")), "rate_purchase must be NULL")
    graft.io.Storage.deleteRecursively(new java.io.File(tmp))
  }
}
