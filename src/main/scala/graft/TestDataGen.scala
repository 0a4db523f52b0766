package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Base64

/** Deterministic OTLP payload generator — the engine-side analog of the
  * reference's `scripts/generate_testdata.py --size-mb` (same role: produce
  * an arbitrarily large, reproducible landing corpus to drive the full
  * pipeline at >golden scale). Everything derives from (seed, indices) via
  * MD5, so two runs — or the generator and a spec recomputing expectations
  * — agree exactly with no shared state.
  *
  * Log/trace linkage is deterministic: log record g (global index) points at
  * trace key `g % TracesPerService` of its service; the traces generator
  * emits exactly those traces, root spans erroring iff `key % 5 == 0`. A
  * spec can therefore predict join cardinalities in closed form.
  *
  * Timestamps spread over 30 hours crossing a month boundary
  * (2024-02-28T22:00Z onward), so the partitioned layout exercises
  * year/month/day/hour pruning, not just service pruning.
  */
object TestDataGen {

  val Services = 8
  val TracesPerService = 200
  val BaseNanos: Long = 1709157600L * 1000000000L // 2024-02-28T22:00:00Z
  val HourNanos: Long = 3600L * 1000000000L
  val SpanHours = 30 // crosses 2024-02-29 (leap day!) into 2024-03-01

  private def md5(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))

  private def b64(bytes: Array[Byte]): String =
    Base64.getEncoder.encodeToString(bytes)

  /** 16-byte trace id for (service, key) — shared by the logs and traces
    * generators, which is what makes the cross-signal join land. */
  def traceIdB64(svc: Int, key: Int, seed: Long): String =
    b64(md5(s"trace:$seed:$svc:$key"))

  def spanIdB64(tag: String, seed: Long): String =
    b64(md5(s"span:$seed:$tag").take(8))

  def service(i: Int): String = s"svc-$i"

  /** Severity for global log record g: every 10th ERROR, every 10th+1 WARN,
    * every 100th+55 FATAL (never collides with the ERROR slots), else INFO. */
  def severity(g: Long): (String, Int) =
    if (g % 100L == 55L) ("FATAL", 21)
    else if (g % 10L == 0L) ("ERROR", 17)
    else if (g % 10L == 1L) ("WARN", 13)
    else ("INFO", 9)

  /** Record timestamp: hour rotates through the 30-hour window by global
    * index, seconds jitter derived from the index. */
  def timeNanos(g: Long): Long =
    BaseNanos + (g % SpanHours) * HourNanos + (g % 3391L) * 1000000000L % HourNanos

  /** One envelope = one resourceLogs entry for one service with
    * `recordsPerEnvelope` records — the request-body shape the reference's
    * HTTP handler receives, one per line (jsonl). Returns total records. */
  def writeLogs(dir: String, files: Int, envelopesPerFile: Int,
      recordsPerEnvelope: Int, seed: Long = 7L): Long = {
    Files.createDirectories(Paths.get(dir))
    var g = 0L
    for (f <- 0 until files) {
      val sb = new StringBuilder(1 << 20)
      for (e <- 0 until envelopesPerFile) {
        val svc = ((f * envelopesPerFile + e) % Services)
        sb.append(s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"${service(svc)}"}}]},"scopeLogs":[{"scope":{"name":"graft-gen"},"logRecords":[""")
        for (r <- 0 until recordsPerEnvelope) {
          val (sevText, sevNum) = severity(g)
          val traceKey = (g % TracesPerService).toInt
          if (r > 0) sb.append(',')
          sb.append(s"""{"timeUnixNano":"${timeNanos(g)}","severityNumber":$sevNum,"severityText":"$sevText","body":{"stringValue":"event $g from ${service(svc)}"},"attributes":[{"key":"gen.seq","value":{"intValue":"$g"}}],"traceId":"${traceIdB64(svc, traceKey, seed)}","spanId":"${spanIdB64(s"log:$g", seed)}"}""")
          g += 1L
        }
        sb.append("]}]}]}\n")
      }
      Files.write(Paths.get(dir, f"logs-$f%03d.jsonl"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
    }
    g
  }

  /** Traces for every (service, key) pair: one root span (SERVER, errored
    * iff key % 5 == 0) plus `childrenPerTrace` INTERNAL children. One
    * envelope per trace, `tracesPerFile` lines per file. Returns total
    * spans. */
  def writeTraces(dir: String, tracesPerFile: Int,
      childrenPerTrace: Int, seed: Long = 7L,
      grandchildrenPerChild: Int = 0): Long = {
    Files.createDirectories(Paths.get(dir))
    var spans = 0L
    var fileIdx = 0
    var sb = new StringBuilder(1 << 20)
    var inFile = 0
    def flush(): Unit = if (inFile > 0) {
      Files.write(Paths.get(dir, f"traces-$fileIdx%03d.jsonl"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
      fileIdx += 1; inFile = 0; sb = new StringBuilder(1 << 20)
    }
    for (svc <- 0 until Services; key <- 0 until TracesPerService) {
      val tid = traceIdB64(svc, key, seed)
      val root = spanIdB64(s"root:$svc:$key", seed)
      val g = (svc * TracesPerService + key).toLong
      val t0 = timeNanos(g)
      val rootDur = 1000000L * (1L + (g % 997L)) // up to ~1 s, deterministic
      val status =
        if (key % 5 == 0) """{"code":"STATUS_CODE_ERROR"}""" else "{}"
      sb.append(s"""{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"${service(svc)}"}}]},"scopeSpans":[{"scope":{"name":"graft-gen"},"spans":[""")
      sb.append(s"""{"traceId":"$tid","spanId":"$root","name":"${service(svc)}.handle","kind":"SPAN_KIND_SERVER","startTimeUnixNano":"$t0","endTimeUnixNano":"${t0 + rootDur}","status":$status}""")
      spans += 1L
      for (c <- 0 until childrenPerTrace) {
        val cid = spanIdB64(s"child:$svc:$key:$c", seed)
        val cs = t0 + 1000000L * (c + 1)
        sb.append(s""",{"traceId":"$tid","spanId":"$cid","parentSpanId":"$root","name":"${service(svc)}.step$c","kind":"SPAN_KIND_INTERNAL","startTimeUnixNano":"$cs","endTimeUnixNano":"${cs + 500000L}","status":{}}""")
        spans += 1L
        for (gc <- 0 until grandchildrenPerChild) {
          val gid = spanIdB64(s"gchild:$svc:$key:$c:$gc", seed)
          val gs = cs + 100000L * (gc + 1)
          sb.append(s""",{"traceId":"$tid","spanId":"$gid","parentSpanId":"$cid","name":"${service(svc)}.step$c.sub$gc","kind":"SPAN_KIND_INTERNAL","startTimeUnixNano":"$gs","endTimeUnixNano":"${gs + 50000L}","status":{}}""")
          spans += 1L
        }
      }
      sb.append("]}]}]}\n")
      inFile += 1
      if (inFile >= tracesPerFile) flush()
    }
    flush()
    spans
  }

  /** Deterministic sf-scale OTLP-histogram table, generated from
    * `spark.range(n)` with PURE ARITHMETIC — no files, no RNG — so the
    * DuckDB oracle regenerates the identical table from `range(n)` and the
    * gate's hash compare covers a ≥10⁴-row histogram input (the golden
    * `metrics_histogram` table the array-p95 query was first verified on
    * has only 3 rows). Layout coverage by construction:
    *
    *   - bucket-count length rotates 1..8 (`id % 8` explicit bounds + the
    *     +Inf overflow bucket; `id % 8 == 0` → NO explicit bounds, counts
    *     = [overflow] only — every such row's p95 lands in overflow);
    *   - every 97th row is the EMPTY histogram (both arrays zero-length —
    *     the `sequence(1,0)` descending-range trap row);
    *   - every 89th row has ALL-ZERO counts (total_count = 0);
    *   - every 11th row is overflow-heavy (100 in the +Inf bucket) so p95
    *     falls past the last explicit bound → NULL p95_bound;
    *   - bound spacing varies per row (`10 + id % 13`).
    *
    * Schema matches the reference's histogram columns
    * (`/root/reference/docs/reference.md:94-162`): `BucketCounts` BIGINT[],
    * `ExplicitBounds` DOUBLE[], plus the generator's `hist_id`. */
  def histograms(spark: org.apache.spark.sql.SparkSession,
      n: Long = 10000L): org.apache.spark.sql.DataFrame =
    spark.range(n).selectExpr(
      "id AS hist_id",
      """IF(id % 97 = 0 OR id % 8 = 0, array(),
        |   transform(sequence(1, CAST(id % 8 AS INT)),
        |     j -> CAST(j * (10 + id % 13) AS DOUBLE))) AS ExplicitBounds""".stripMargin,
      """IF(id % 97 = 0, array(),
        |   transform(sequence(1, CAST(id % 8 AS INT) + 1),
        |     j -> IF(id % 89 = 0, 0L,
        |          IF(id % 11 = 0 AND j = CAST(id % 8 AS INT) + 1, 100L,
        |             (id * 31 + j * 17) % 5)))) AS BucketCounts""".stripMargin)

  /** DuckDB CTE regenerating [[histograms]] bit-identically (same modulo
    * arithmetic over non-negative ids — `%` agrees across engines there).
    * Exposed so the oracle SQL and the Spark generator share one source of
    * truth for the layout rules. */
  def histogramsSqlCte(n: Long = 10000L): String =
    s"""hist AS (
       |  SELECT id AS hist_id,
       |    CASE WHEN id % 97 = 0 OR id % 8 = 0 THEN CAST([] AS DOUBLE[])
       |         ELSE list_transform(generate_series(1, CAST(id % 8 AS INT)),
       |                j -> CAST(j * (10 + id % 13) AS DOUBLE)) END AS ExplicitBounds,
       |    CASE WHEN id % 97 = 0 THEN CAST([] AS BIGINT[])
       |         ELSE list_transform(generate_series(1, CAST(id % 8 AS INT) + 1),
       |                j -> CAST(CASE WHEN id % 89 = 0 THEN 0
       |                     WHEN id % 11 = 0 AND j = id % 8 + 1 THEN 100
       |                     ELSE (id * 31 + j * 17) % 5 END AS BIGINT)) END AS BucketCounts
       |  FROM range($n) t(id)
       |)""".stripMargin

  /** Deterministic sf-scale EXPONENTIAL-histogram table — the
    * [[histograms]] sibling for the OTLP exponential form
    * (`/root/reference/docs/reference.md:94-162`: `Scale`, `ZeroCount`,
    * `PositiveOffset`, `PositiveBucketCounts`). Layout coverage:
    *
    *   - scale rotates −2..5 (`id % 8 − 2` — negative scales = coarse
    *     power-of-4/16 buckets are legal and exercised);
    *   - positive-bucket count rotates 0..6 (`id % 7`; 0 → zero-count-only
    *     rows whose p95 falls in the zero bucket);
    *   - every 83rd row is fully EMPTY (zero count 0, no buckets);
    *   - every 13th row is tail-heavy (count 90 in the LAST positive
    *     bucket) so p95 lands at the highest index;
    *   - `PositiveOffset` varies −20..19 (`id % 40 − 20`).
    */
  def expHistograms(spark: org.apache.spark.sql.SparkSession,
      n: Long = 10000L): org.apache.spark.sql.DataFrame =
    spark.range(n).selectExpr(
      "id AS hist_id",
      "CAST(id % 8 - 2 AS INT) AS Scale",
      "IF(id % 83 = 0, 0L, 1L + id % 5) AS ZeroCount",
      "CAST(id % 40 - 20 AS BIGINT) AS PositiveOffset",
      """IF(id % 83 = 0 OR id % 7 = 0, array(),
        |   transform(sequence(1, CAST(id % 7 AS INT)),
        |     j -> IF(id % 13 = 0 AND j = CAST(id % 7 AS INT), 90L,
        |             (id * 29 + j * 11) % 6))) AS PositiveBucketCounts""".stripMargin)

  /** DuckDB CTE regenerating [[expHistograms]] bit-identically. */
  def expHistogramsSqlCte(n: Long = 10000L): String =
    s"""ehist AS (
       |  SELECT id AS hist_id,
       |    CAST(id % 8 - 2 AS INT) AS Scale,
       |    CAST(CASE WHEN id % 83 = 0 THEN 0 ELSE 1 + id % 5 END AS BIGINT) AS ZeroCount,
       |    CAST(id % 40 - 20 AS BIGINT) AS PositiveOffset,
       |    CASE WHEN id % 83 = 0 OR id % 7 = 0 THEN CAST([] AS BIGINT[])
       |         ELSE list_transform(generate_series(1, CAST(id % 7 AS INT)),
       |                j -> CAST(CASE WHEN id % 13 = 0 AND j = id % 7 THEN 90
       |                     ELSE (id * 29 + j * 11) % 6 END AS BIGINT)) END
       |      AS PositiveBucketCounts
       |  FROM range($n) t(id)
       |)""".stripMargin

  /** Deterministic span-TREE corpus for the critical-path gate — the golden
    * traces are 19 single-span traces (orphan accounting, not tree shape),
    * so DAG analytics need a generated corpus with real depth. Trace `t`
    * holds `1 + t % 15` spans laid out as a binary heap (span i's parent is
    * `(i-1) div 2`), giving depths 1..4 and every shape from a lone root to
    * a full 4-level tree. Durations and names are modulo arithmetic over
    * non-negative ids, so the DuckDB CTE twin ([[spanTreesSqlCte]])
    * regenerates the table bit-identically. */
  def spanTrees(spark: org.apache.spark.sql.SparkSession,
      n: Long = 2000L): org.apache.spark.sql.DataFrame =
    spark.range(n)
      .selectExpr("id AS trace_id", "explode(sequence(0L, id % 15)) AS span_idx")
      .selectExpr(
        "trace_id", "span_idx",
        "IF(span_idx = 0, CAST(NULL AS BIGINT), (span_idx - 1) div 2) AS parent_idx",
        "concat('op-', (trace_id + span_idx) % 7) AS span_name",
        "1000L + ((trace_id * 31 + span_idx * 17) % 97) * 10 AS duration_ns")

  /** DuckDB CTE regenerating [[spanTrees]] bit-identically. */
  def spanTreesSqlCte(n: Long = 2000L): String =
    s"""spant AS (
       |  SELECT t.id AS trace_id, s.i AS span_idx,
       |    CASE WHEN s.i = 0 THEN CAST(NULL AS BIGINT) ELSE (s.i - 1) // 2 END AS parent_idx,
       |    'op-' || CAST((t.id + s.i) % 7 AS VARCHAR) AS span_name,
       |    CAST(1000 + ((t.id * 31 + s.i * 17) % 97) * 10 AS BIGINT) AS duration_ns
       |  FROM range($n) t(id) CROSS JOIN range(15) s(i)
       |  WHERE s.i <= t.id % 15
       |)""".stripMargin

  /** CLI: TestDataGen <logs|traces> <dir> ... (defaults produce ~20k log
    * records / 8k spans — ≥200× the golden corpus). */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TestDataGen <logs|traces> <dir> [sizes...]")
    val n = args(0) match {
      case "logs" => writeLogs(args(1),
        files = if (args.length > 2) args(2).toInt else 8,
        envelopesPerFile = if (args.length > 3) args(3).toInt else 250,
        recordsPerEnvelope = if (args.length > 4) args(4).toInt else 10)
      case "traces" => writeTraces(args(1),
        tracesPerFile = if (args.length > 2) args(2).toInt else 200,
        childrenPerTrace = if (args.length > 3) args(3).toInt else 4)
      case other => throw new IllegalArgumentException(s"unknown kind: $other")
    }
    println(s"""{"generated":$n}""")
  }
}
