package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.OtlpStream
import graft.streaming.OtlpStream.{Flush, Record}

/** Structured-Streaming ingest tests: file-source pipeline end-to-end and
  * the explicit keyed batcher's flush predicate (SURVEY §2.3). */
class StreamingSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming jsonl landing dir → partitioned parquet (AvailableNow drain)") {
    val in = tmp("graft-stream-in")
    val out = tmp("graft-stream-out")
    val ckpt = tmp("graft-stream-ckpt")
    Files.copy(java.nio.file.Paths.get("/root/reference/testdata/logs.jsonl"),
      java.nio.file.Paths.get(in, "logs.jsonl"))

    val q = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val written = spark.read.parquet(s"$out/otel_logs")
    assert(written.count() == 81)
    // partition columns materialized from the path
    assert(written.columns.contains("service"))
    assert(written.select("service").distinct().count() >= 5)
  }

  test("streaming protobuf payload files → partitioned parquet") {
    val in = tmp("graft-pbstream-in")
    val out = tmp("graft-pbstream-out")
    val ckpt = tmp("graft-pbstream-ckpt")
    Files.copy(java.nio.file.Paths.get("/root/reference/testdata/logs.pb"),
      java.nio.file.Paths.get(in, "payload-1.pb"))

    val q = OtlpStream.logsProtobufToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val written = spark.read.parquet(s"$out/otel_logs")
    assert(written.count() == 81) // golden record count
    assert(written.columns.contains("SeverityText"))
  }

  test("streaming traces landing dir → partitioned parquet") {
    val in = tmp("graft-tstream-in")
    val out = tmp("graft-tstream-out")
    val ckpt = tmp("graft-tstream-ckpt")
    Files.copy(java.nio.file.Paths.get("/root/reference/testdata/traces.jsonl"),
      java.nio.file.Paths.get(in, "traces.jsonl"))

    val q = OtlpStream.tracesToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val written = spark.read.parquet(s"$out/otel_traces")
    assert(written.count() == 19) // golden span count
    assert(written.columns.contains("SpanKind") && written.columns.contains("service"))
  }

  test("streaming metrics landing dir → four kind tables (summary dropped)") {
    val in = tmp("graft-mstream-in")
    val out = tmp("graft-mstream-out")
    val ckpt = tmp("graft-mstream-ckpt")
    // one envelope per line; mixed covers gauge/sum/histogram, the
    // exp-histogram fixture covers the fourth persisted kind
    def flatLine(p: String): String = new String(
      Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8).replaceAll("\\s*\\n\\s*", "")
    val lines = Seq(
      flatLine("/root/reference/testdata/metrics_mixed.json"),
      flatLine("/root/reference/testdata/metrics_exponential_histogram.json"))
    Files.write(java.nio.file.Paths.get(in, "metrics.jsonl"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val q = OtlpStream.metricsToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    for (kind <- Seq("gauge", "sum", "histogram", "exponential_histogram")) {
      val t = spark.read.parquet(s"$out/otel_metrics_$kind")
      assert(t.count() > 0, s"kind $kind must have datapoints")
    }
    // summary is decoded but never persisted (reference parity)
    assert(!new java.io.File(s"$out/otel_metrics_summary").exists())
  }

  test("streamed output honors writer.footer_stamp (KV in every footer)") {
    import scala.jdk.CollectionConverters._
    val in = tmp("graft-fstream-in")
    val out = tmp("graft-fstream-out")
    val ckpt = tmp("graft-fstream-ckpt")
    Files.copy(java.nio.file.Paths.get("/root/reference/testdata/logs.jsonl"),
      java.nio.file.Paths.get(in, "logs.jsonl"))
    // knob resolved through the real config chain (env > file > defaults)
    val cfg = Config.load(Map("GRAFT_FOOTER_STAMP" -> "true"),
      new java.io.File(tmp("graft-fstream-cwd")))
    assert(cfg.writer.footerStamp)

    val q = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow(), footerStamp = cfg.writer.footerStamp)
    q.awaitTermination(120000)

    val written = spark.read.parquet(s"$out/otel_logs")
    assert(written.count() == 81)
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(s"$out/otel_logs")
    val it = base.getFileSystem(conf).listFiles(base, true)
    var checked = 0
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
          finally r.close()
        assert(kv.get(graft.io.FooterStamp.SchemaVersionKey)
          .contains(graft.schema.OtlpSchemas.LogsSchemaVersion), st.getPath.toString)
        checked += 1
      }
    }
    assert(checked > 0, "no parquet files written")
  }

  test("writer.stream_state_partitions override reaches the query plan") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val cfg = Config.load(Map("GRAFT_STREAM_STATE_PARTITIONS" -> "5"),
      new java.io.File(tmp("graft-sp-cwd")))
    assert(cfg.writer.streamStatePartitions == 5)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach(so => seen.add(so.numShufflePartitions))
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      assert(graft.streaming.StreamGate.windowCounts(spark, "/root/testdata/sf0.001",
        stateParts = Some(cfg.writer.streamStatePartitions)).count() > 0)
      // listener delivery is async — wait for the progress events
      val deadline = System.currentTimeMillis() + 30000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.asScala.toSet == Set(5L),
        s"state operator partitions: ${seen.asScala.toList}")
    } finally {
      spark.streams.removeListener(listener)
    }
  }

  test("writer.stream_checkpoint_root: config parse + invocation-time resolution") {
    val cfg = Config.load(Map("GRAFT_STREAM_CHECKPOINT_ROOT" -> "/tmp/graft-ckpt-x"),
      new java.io.File(tmp("graft-cr-cwd")))
    assert(cfg.writer.streamCheckpointRoot == "/tmp/graft-ckpt-x")
    // resolution is read-at-invocation (no module state): the same-JVM
    // probe override flips it without touching StreamGate internals
    val saved = sys.props.get("graft.stream.ckpt.root")
    try {
      sys.props("graft.stream.ckpt.root") = "none"
      assert(graft.streaming.StreamGate.checkpointRoot.isEmpty)
      val dir = tmp("graft-cr-root")
      sys.props("graft.stream.ckpt.root") = dir
      assert(graft.streaming.StreamGate.checkpointRoot.contains(dir))
    } finally {
      saved match {
        case Some(v) => sys.props("graft.stream.ckpt.root") = v
        case None => sys.props -= "graft.stream.ckpt.root"
      }
    }
  }

  test("watermarked window counts: on-time rows aggregate, late rows drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, String)]
    val logsLike = source.toDF()
      .toDF("Timestamp", "ServiceName", "SeverityText")
    val agg = OtlpStream.logCountsByWindow(logsLike,
      windowLength = "1 minute", watermarkDelay = "1 minute")
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two rows in minute 10:00, one in 10:01
    source.addData(
      (ts("2024-01-01 10:00:05"), "svc", "INFO"),
      (ts("2024-01-01 10:00:40"), "svc", "INFO"),
      (ts("2024-01-01 10:01:10"), "svc", "ERROR"))
    q.processAllAvailable()
    // batch 2: advance watermark far past 10:00 → closes those windows
    source.addData((ts("2024-01-01 10:10:00"), "svc", "INFO"))
    q.processAllAvailable()
    // batch 3: a LATE row for 10:00 — behind the watermark, must be dropped
    source.addData((ts("2024-01-01 10:00:50"), "svc", "INFO"))
    q.processAllAvailable()
    // close remaining windows
    source.addData((ts("2024-01-01 10:20:00"), "svc", "INFO"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wincounts").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("SeverityText"), r.getAs[Long]("n"))).toSet
    assert(rows.contains(("2024-01-01 10:00:00.0", "INFO", 2L)),
      s"late row must NOT bump the closed 10:00 window: $rows")
    assert(rows.contains(("2024-01-01 10:01:00.0", "ERROR", 1L)))
  }

  test("streaming sessionization: gap splits sessions, watermark closes them") {
    import spark.implicits._
    import graft.streaming.OtlpStream.{Session, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val sessions = OtlpStream.sessionizeStream(source.toDS(),
      watermarkDelay = "1 minute", gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // offset from epoch: the initial watermark is 0 and an event AT the
    // watermark is dropped as late
    def us(min: Long) = (min + 60L) * 60L * 1000000L
    // user 1: two bursts 40 min apart (gap 30 → two sessions)
    source.addData(
      SessionEvent(1L, 1L, us(0)), SessionEvent(1L, 2L, us(5)),
      SessionEvent(1L, 3L, us(45)), SessionEvent(1L, 4L, us(46)))
    q.processAllAvailable()
    // advance the watermark far past session end + gap → event-time timeout
    source.addData(SessionEvent(99L, 9L, us(600)))
    q.processAllAvailable()
    source.addData(SessionEvent(99L, 10L, us(601)))
    q.processAllAvailable()

    val got = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.startUs)
    assert(got.length == 2, s"expected 2 closed sessions, got ${got.mkString(",")}")
    assert(got(0) == Session(1L, 2L, us(0), us(5)))
    assert(got(1) == Session(1L, 2L, us(45), us(46)))
    q.stop()
  }

  test("service batcher: row-threshold flush + processing-time expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Record]
    val flushes = OtlpStream.serviceBatcher(source.toDS(), maxRows = 10,
      maxBytes = 1L << 30, maxAgeMs = 500)
    val q = flushes.writeStream
      .format("memory")
      .queryName("flushes")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()

    // 25 records for svc-a → two row-threshold flushes (10+10), 5 buffered;
    // 3 records for svc-b → stays buffered until the age timeout fires
    source.addData((1 to 25).map(i => Record("svc-a", i / 60L, 100L)) ++
      (1 to 3).map(i => Record("svc-b", 0L, 50L)): _*)

    // poll the sink (processAllAvailable can block forever here: registered
    // processing-time timeouts keep scheduling non-idle micro-batches)
    def poll(deadlineMs: Long)(pred: Seq[Flush] => Boolean): Seq[Flush] = {
      val until = System.currentTimeMillis() + deadlineMs
      var got = Seq.empty[Flush]
      while (System.currentTimeMillis() < until && !pred(got)) {
        Thread.sleep(200)
        got = spark.table("flushes").as[Flush].collect().toSeq
      }
      got
    }

    val afterBatch = poll(30000)(fs =>
      fs.count(f => f.service == "svc-a" && f.reason == "rows") == 2)
    assert(afterBatch.count(f => f.service == "svc-a" && f.reason == "rows") == 2,
      s"expected two rows-flushes, got ${afterBatch.mkString(", ")}")

    // age expiry: the 500 ms timeout must flush svc-b (3 rows) and the
    // svc-a remainder (5 rows) without any further input
    val all = poll(30000)(fs =>
      fs.exists(f => f.service == "svc-b" && f.reason == "age"))
    assert(all.exists(f => f.service == "svc-b" && f.reason == "age" && f.rows == 3),
      s"svc-b should age-flush; got ${all.mkString(", ")}")
    q.stop()
  }

  test("backpressure: pending-bytes guard drops + counts past 8×max_bytes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Record]
    val rejected = spark.sparkContext.longAccumulator("otlp.ingest.rejected-bp")
    // thresholds chosen so nothing flushes by rows/bytes: only the pending
    // guard (250) and the age expiry (500 ms) can act
    val flushes = OtlpStream.serviceBatcher(source.toDS(), maxRows = 1000000L,
      maxBytes = 1L << 30, maxAgeMs = 500L,
      maxPendingBytes = 250L, rejected = Some(rejected))
    val q = flushes.writeStream
      .format("memory")
      .queryName("bp_flushes")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()

    // burst: 100+100 buffer fine; the third record's prospective total
    // (300) exceeds the 250 limit → dropped + counted, buffer unchanged;
    // the giant 400-byte record is rejected even against an empty buffer
    // (the reference bails on prospective > limit regardless of state)
    source.addData(
      Record("svc-bp", 0L, 100L), Record("svc-bp", 0L, 100L),
      Record("svc-bp", 1L, 100L),
      Record("svc-giant", 0L, 400L))

    def poll(deadlineMs: Long)(pred: => Boolean): Unit = {
      val until = System.currentTimeMillis() + deadlineMs
      while (System.currentTimeMillis() < until && !pred) Thread.sleep(200)
    }
    poll(30000)(rejected.value >= 2L)
    assert(rejected.value == 2L,
      s"expected 2 rejected (over-limit + giant), got ${rejected.value}")

    // the age flush proves the dropped records were never buffered:
    // svc-bp flushes 2 rows / 200 bytes, svc-giant never flushes
    poll(30000)(spark.table("bp_flushes").as[Flush].collect()
      .exists(f => f.service == "svc-bp" && f.reason == "age"))
    val got = spark.table("bp_flushes").as[Flush].collect().toSeq
    assert(got.exists(f => f.service == "svc-bp" && f.reason == "age" &&
      f.rows == 2 && f.bytes == 200L),
      s"svc-bp should age-flush 2 rows/200 bytes; got ${got.mkString(", ")}")
    assert(!got.exists(_.service == "svc-giant"),
      s"svc-giant must never flush; got ${got.mkString(", ")}")
    q.stop()
  }

  test("custom-state anomaly stream reproduces the batch operator exactly (parity)") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        r.getAs[Long]("n_prev"))).toSeq
    val streamed = rows(graft.streaming.StreamGate.anomalies(spark, sf))
    val batch = rows(graft.operators.QuerySurface.anomalyZscore(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("windowed CMS grid: stream cells equal a batch recompute (sum algebra parity)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.operators.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wmMs = ev.map(_._1).max / 1000 - graft.streaming.StreamGate.WindowDelayMs
    val hourUs = 3600000000L
    val expected = ev.flatMap { case (us, u) =>
        (0 until graft.streaming.StreamGate.StreamCmsDepth).map { r =>
          ((us / hourUs) * hourUs, r,
            graft.functions.PortableHash.md5Lower63(s"scms$r:$u") %
              graft.streaming.StreamGate.StreamCmsWidth)
        }
      }
      .groupBy(identity).map { case (cell, v) => (cell._1, cell._2, cell._3, v.length.toLong) }
      .filter { case (ws, _, _, _) => (ws + hourUs) / 1000 <= wmMs }
      .toSeq.sortBy { case (ws, r, b, _) => (ws, r, b) }
    val got = graft.streaming.StreamGate.cmsWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("windowed qsketch: stream bottom-k sample equals a batch recompute (merge algebra parity)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.operators.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val wmMs = ev.map(_._1).max / 1000 - graft.streaming.StreamGate.WindowDelayMs
    val hourUs = 3600000000L
    val k = graft.streaming.StreamGate.StreamQsketchK
    val expected = ev.groupBy(t => t._1 / hourUs * hourUs).toSeq
      .filter { case (w, _) => (w + hourUs) / 1000 <= wmMs }
      .map { case (w, rows) =>
        val sample = rows
          .map(r => (graft.functions.PortableHash.md5Lower63("sq:" + r._2), r._3))
          .distinct.sortBy(identity).take(k).map(_._2).sorted
        val m = sample.length
        (w, m.toLong, sample((m + 1) / 2 - 1), sample((19 * m + 19) / 20 - 1))
      }.sortBy(_._1)
    val got = graft.streaming.StreamGate.qsketchWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming RED panel: stream equals a batch recompute (sum algebra parity)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    def r6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val ev = graft.operators.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val wmMs = ev.map(_._1).max / 1000 - graft.streaming.StreamGate.WindowDelayMs
    val hourUs = 3600000000L
    val expected = ev.groupBy(t => (t._1 / hourUs * hourUs, t._2)).toSeq
      .filter { case ((w, _), _) => (w + hourUs) / 1000 <= wmMs }
      .map { case ((w, et), rows) =>
        val n = rows.length.toLong
        val nErr = rows.count(_._3 >= 250.0).toLong
        val sumV = rows.map(r => BigDecimal(r._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (w, et, n, nErr, r6(nErr.toDouble / n), r6(sumV / n))
      }.sortBy(t => (t._1, t._2))
    val got = graft.streaming.StreamGate.redWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._4 > 0)) // some windows carry errors
  }

  test("streaming fixed-grid histogram: stream cells equal a batch recompute") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val grid = graft.operators.OtelQueries.RebucketBounds
    def bucket(v: Double): Long = {
      val i = grid.indexWhere(b => v < b.toDouble)
      if (i < 0) grid.size.toLong else i.toLong
    }
    val ev = graft.operators.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val wmMs = ev.map(_._1).max / 1000 - graft.streaming.StreamGate.WindowDelayMs
    val hourUs = 3600000000L
    val expected = ev.map { case (us, v) => (us / hourUs * hourUs, bucket(v)) }
      .groupBy(identity).map { case ((w, b), g) => (w, b, g.length.toLong) }
      .filter { case (w, _, _) => (w + hourUs) / 1000 <= wmMs }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = graft.streaming.StreamGate.histWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._2).distinct.size > 1)
  }

  test("extended flush elision (round 11): the six remaining elide-safe " +
      "gates are row-identical between the elided and watermarked forms") {
    import graft.streaming.StreamGate
    val sf = "/root/testdata/sf0.001"
    def both(f: Option[Boolean] => org.apache.spark.sql.DataFrame,
        name: String): Unit = {
      val e = f(Some(true)).collect().map(_.toString).toSeq.sorted
      val a = f(Some(false)).collect().map(_.toString).toSeq.sorted
      assert(e.nonEmpty && e == a, s"$name elide parity")
    }
    // merge-commutative windowed aggs: update-mode + closed-window filter
    both(el => StreamGate.windowCounts(spark, sf, elide = el), "stream_window_counts")
    both(el => StreamGate.cmsWindows(spark, sf, el), "stream_cms")
    both(el => StreamGate.qsketchWindows(spark, sf, el), "stream_qsketch")
    both(el => StreamGate.enrichJoin(spark, sf, elide = el), "stream_enrich_join")
    // non-agg elisions: watermark dropped (state expiry is the only thing
    // the no-data batch does for these in a single-batch replay)
    both(el => StreamGate.dedupKeys(spark, sf, el), "stream_dedup")
    both(el => StreamGate.streamStreamJoin(spark, sf, el), "stream_stream_join")
  }

  test("crash recovery: a stopped drain restarted from the same checkpoint " +
      "neither duplicates committed batches nor loses new data (exactly-once " +
      "across restart)") {
    val in = tmp("graft-crash-in")
    val out = tmp("graft-crash-out")
    val outClean = tmp("graft-crash-out-clean")
    val ckpt = tmp("graft-crash-ckpt")
    val ckptClean = tmp("graft-crash-ckpt-clean")
    val src = java.nio.file.Paths.get("/root/reference/testdata/logs.jsonl")

    // phase 1: one landing file, a running (ProcessingTime) drain; wait for
    // the first micro-batch to COMMIT to the file sink's metadata log, then
    // stop the query — the restart-from-mid-stream scenario (a crash after
    // commit N and before commit N+1; Spark's offset/commit WAL makes any
    // partially-written uncommitted files invisible to readers)
    Files.copy(src, java.nio.file.Paths.get(in, "a.jsonl"))
    val q1 = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.ProcessingTime("1 second"))
    val deadline = System.currentTimeMillis() + 120000
    def committedRows(): Long =
      try spark.read.parquet(s"$out/otel_logs").count()
      catch { case _: Throwable => 0L }
    while (committedRows() < 81 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q1.stop()
    assert(committedRows() == 81, "first micro-batch must be committed")

    // phase 2: new data lands AFTER the crash; restart from the SAME
    // checkpoint. The committed offsets must not be reprocessed (no dup of
    // a.jsonl) and the new file must be picked up (no loss).
    Files.copy(src, java.nio.file.Paths.get(in, "b.jsonl"))
    val q2 = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)

    // clean single run over the same two files = the ground truth
    val q3 = OtlpStream.logsToParquet(spark, in, outClean, ckptClean,
      trigger = Trigger.AvailableNow())
    q3.awaitTermination(120000)

    // toJSON renders binary columns by VALUE (base64), unlike Row.toString
    val recovered = spark.read.parquet(s"$out/otel_logs")
      .toJSON.collect().sorted.toSeq
    val clean = spark.read.parquet(s"$outClean/otel_logs")
      .toJSON.collect().sorted.toSeq
    assert(recovered.length == 162, s"162 rows expected, got ${recovered.length}")
    assert(recovered == clean, "restarted drain must equal the clean run")
  }

  test("crash recovery, stamped sink: a REPLAYED micro-batch (commit-log " +
      "entry lost in the crash) is absorbed by its BatchPublish marker — " +
      "exactly-once for the foreachBatch path too") {
    val in = tmp("graft-scrash-in")
    val out = tmp("graft-scrash-out")
    val outClean = tmp("graft-scrash-out-clean")
    val ckpt = tmp("graft-scrash-ckpt")
    val ckptClean = tmp("graft-scrash-ckpt-clean")
    val src = java.nio.file.Paths.get("/root/reference/testdata/logs.jsonl")

    Files.copy(src, java.nio.file.Paths.get(in, "a.jsonl"))
    val q1 = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.ProcessingTime("1 second"), footerStamp = true)
    val deadline = System.currentTimeMillis() + 120000
    def committedRows(): Long =
      try spark.read.parquet(s"$out/otel_logs").count()
      catch { case _: Throwable => 0L }
    // rows become visible the moment BatchPublish moves them — BEFORE the
    // checkpoint's commit-log entry lands (that gap is exactly the crash
    // window under test) — so wait for BOTH the rows and commits/0 before
    // stopping, or the delete below races the log write under load
    val commitEntry = new java.io.File(s"$ckpt/commits/0")
    while ((committedRows() < 81 || !commitEntry.exists()) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q1.stop()
    assert(committedRows() == 81, "first micro-batch must be published")

    // the HARSHER crash: the sink published batch 0 but the checkpoint's
    // commit-log entry was lost — the restart must RE-RUN batch 0 through
    // foreachBatch, and only the batchId marker stands between the replay
    // and 81 duplicate rows (this is exactly the window plain appends leak)
    assert(new java.io.File(s"$ckpt/commits/0").delete(),
      "test setup: commit-log entry for batch 0 must exist")
    // the local ChecksumFileSystem shadows every file with a .crc twin; a
    // stale one makes the re-created entry rename fail, which Spark reports
    // as a concurrent writer on the commit log
    new java.io.File(s"$ckpt/commits/.0.crc").delete()

    Files.copy(src, java.nio.file.Paths.get(in, "b.jsonl"))
    val q2 = OtlpStream.logsToParquet(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow(), footerStamp = true)
    q2.awaitTermination(120000)

    val q3 = OtlpStream.logsToParquet(spark, in, outClean, ckptClean,
      trigger = Trigger.AvailableNow(), footerStamp = true)
    q3.awaitTermination(120000)

    val recovered = spark.read.parquet(s"$out/otel_logs")
      .toJSON.collect().sorted.toSeq
    val clean = spark.read.parquet(s"$outClean/otel_logs")
      .toJSON.collect().sorted.toSeq
    assert(recovered.length == 162,
      s"162 rows expected (no replay dup), got ${recovered.length}")
    assert(recovered == clean, "restarted stamped drain must equal the clean run")
  }
}
