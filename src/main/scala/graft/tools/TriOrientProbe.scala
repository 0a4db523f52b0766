package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the triangle-census join under id-ordering vs (degree, id)-
  * ordering on a synthetic SKEWED backbone (round-7 verdict task 7) —
  * the regime the sf1 sweep can't isolate because the real co-purchase
  * backbone mixes backbone construction into the wall. Builds hub stars
  * (nHubs hubs × hubDeg satellites each — raw degree hubDeg, far above
  * the √(2|E|) bound degree-orientation guarantees) plus nRandom
  * deterministic satellite-satellite edges that close some triangles,
  * then times ONLY `censusFromEdges` both ways on the cached edge list
  * and asserts the censuses are identical.
  *
  * args: nHubs hubDeg nRandom [cores]   e.g. `5 1000 5000 32`
  */
object TriOrientProbe {
  def main(args: Array[String]): Unit = {
    val nHubs = args(0).toLong
    val hubDeg = args(1).toLong
    val nRandom = args(2).toLong
    val cores = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nSat = nHubs * hubDeg
    // satellites are ids [nHubs, nHubs + nSat); each connects to one hub
    val hubEdges = spark.range(0L, nSat).select(
      (col("id") % nHubs).as("src"), (col("id") + nHubs).as("dst"))
    // deterministic pseudo-random satellite pairs (xxhash64-derived)
    val satEdges = spark.range(0L, nRandom).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(nSat)) + nHubs).as("a"),
      (pmod(xxhash64(col("id"), lit(2)), lit(nSat)) + nHubs).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
    val edges = hubEdges.unionByName(satEdges).distinct().localCheckpoint(true)
    println(s"edges: ${edges.count()} (hubs=$nHubs deg=$hubDeg random=$nRandom)")

    def run(degreeOrdered: Boolean): (Double, String) = {
      val t0 = System.nanoTime()
      val row = graft.operators.Graph.censusFromEdges(edges, degreeOrdered)
        .collect().head
      ((System.nanoTime() - t0) / 1e9, row.toString)
    }
    run(degreeOrdered = true) // warm both paths' codegen/caches once
    run(degreeOrdered = false)
    val (tId, cId) = run(degreeOrdered = false)
    val (tDeg, cDeg) = run(degreeOrdered = true)
    require(cId == cDeg, s"census mismatch: $cId vs $cDeg")
    println(f"""{"id_ordered_s":$tId%.2f,"degree_ordered_s":$tDeg%.2f,"census":"$cId"}""")
    spark.stop()
  }
}
