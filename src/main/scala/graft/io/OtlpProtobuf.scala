package graft.io

import org.apache.spark.sql.Row

import graft.schema.OtlpSchemas

/** Minimal protobuf wire-format decoder for the three OTLP export requests
  * (src-protobuf, SURVEY §2.1).
  *
  * No protobuf runtime or descriptor tooling exists in this environment, so
  * this parses the public protobuf wire format directly (varint / fixed64 /
  * length-delimited / fixed32) with the public opentelemetry-proto field
  * numbers, and emits [[Row]]s in the exact nested shapes of
  * [[OtlpSchemas]]'s *input* schemas — the same shapes the JSON reader
  * produces. Downstream transforms are therefore format-agnostic:
  * ids are re-encoded base64 (what the JSON path accepts), u64 nanos become
  * decimal strings, enums become int strings (the codecs normalize both
  * names and ints).
  *
  * Absent-vs-default: proto3 writers omit zero/empty fields, and the JSON
  * fixtures omit them too, so "not seen on the wire" maps to null — the
  * identical treatment the JSON parser gives a missing key. Malformed bytes
  * throw, failing the job like the reference's 400
  * (/root/reference/src/handlers.rs:106-108).
  */
object OtlpProtobuf {

  // ---- wire primitives ----------------------------------------------------

  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos)
        pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }

    def readFixed64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var out = 0L
      var i = 7
      while (i >= 0) { out = (out << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8
      out
    }

    def readFixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val out = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      out
    }

    /** length-delimited payload → sub-reader over the same buffer. */
    def readSub(): Reader = {
      val len = readVarint().toInt
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(s"bad length $len")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readBytes(): Array[Byte] = {
      val r = readSub()
      java.util.Arrays.copyOfRange(buf, r.pos, r.end)
    }

    def readString(): String = {
      val r = readSub()
      new String(buf, r.pos, r.end - r.pos, java.nio.charset.StandardCharsets.UTF_8)
    }

    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readSub()
      case 5 => readFixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def zigzag32(n: Long): Int = (((n >>> 1) ^ -(n & 1)).toInt)

  private def u64s(v: Long): String = java.lang.Long.toUnsignedString(v)

  private def b64OrNull(b: Array[Byte]): String =
    if (b == null || b.isEmpty) null
    else java.util.Base64.getEncoder.encodeToString(b)

  private def dbl(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)

  /** packed-or-not repeated scalar field accumulation. */
  private def addPacked(r: Reader, wire: Int, each: Reader => Unit): Unit =
    if (wire == 2) { val s = r.readSub(); while (s.hasMore) each(s) }
    else each(r)

  // ---- common messages ----------------------------------------------------

  import scala.collection.mutable.ListBuffer

  private def parseAnyValue(r: Reader, depth: Int): Row = {
    var s: String = null; var b: Any = null; var i: String = null
    var d: Any = null; var by: String = null
    var arr: Row = null; var kvl: Row = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => s = r.readString()
        case 2 => b = r.readVarint() != 0L
        case 3 => i = r.readVarint().toString
        case 4 => d = dbl(r.readFixed64())
        case 5 =>
          val sub = r.readSub()
          if (depth > 0) {
            val vals = ListBuffer.empty[Row]
            while (sub.hasMore) {
              val t2 = sub.readVarint()
              if ((t2 >>> 3).toInt == 1) vals += parseAnyValue(sub.readSub(), depth - 1)
              else sub.skip((t2 & 7).toInt)
            }
            arr = Row(vals.toSeq)
          }
        case 6 =>
          val sub = r.readSub()
          if (depth > 0) {
            val vals = ListBuffer.empty[Row]
            while (sub.hasMore) {
              val t2 = sub.readVarint()
              if ((t2 >>> 3).toInt == 1) vals += parseKeyValue(sub.readSub(), depth - 1)
              else sub.skip((t2 & 7).toInt)
            }
            kvl = Row(vals.toSeq)
          }
        case 7 => by = b64OrNull(r.readBytes())
        case _ => r.skip(w)
      }
    }
    // field order: stringValue, boolValue, intValue, doubleValue, bytesValue
    // [, arrayValue, kvlistValue] — OtlpSchemas.anyValueType
    if (depth > 0) Row(s, b, i, d, by, arr, kvl) else Row(s, b, i, d, by)
  }

  private def parseKeyValue(r: Reader, depth: Int): Row = {
    var key: String = null; var value: Row = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => key = r.readString()
        case 2 => value = parseAnyValue(r.readSub(), depth)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Row(key, value)
  }

  private val D = OtlpSchemas.MaxAnyValueDepth

  private def parseResource(r: Reader): Row = {
    val attrs = ListBuffer.empty[Row]; var dropped: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => dropped = r.readVarint().toString
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Row(if (attrs.isEmpty) null else attrs.toSeq, dropped)
  }

  private def parseScope(r: Reader): Row = {
    var name: String = null; var version: String = null
    val attrs = ListBuffer.empty[Row]; var dropped: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => name = r.readString()
        case 2 => version = r.readString()
        case 3 => attrs += parseKeyValue(r.readSub(), D)
        case 4 => dropped = r.readVarint().toString
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Row(name, version, if (attrs.isEmpty) null else attrs.toSeq, dropped)
  }

  // ---- logs ---------------------------------------------------------------

  private def parseLogRecord(r: Reader): Row = {
    var time: String = null; var observed: String = null
    var sevNum: String = null; var sevText: String = null
    var body: Row = null; val attrs = ListBuffer.empty[Row]
    var dropped: String = null; var flags: String = null
    var traceId: String = null; var spanId: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => time = u64s(r.readFixed64())
        case 2 => sevNum = r.readVarint().toString
        case 3 => sevText = r.readString()
        case 5 => body = parseAnyValue(r.readSub(), D)
        case 6 => attrs += parseKeyValue(r.readSub(), D)
        case 7 => dropped = r.readVarint().toString
        case 8 => flags = java.lang.Integer.toUnsignedString(r.readFixed32())
        case 9 => traceId = b64OrNull(r.readBytes())
        case 10 => spanId = b64OrNull(r.readBytes())
        case 11 => observed = u64s(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    Row(time, observed, sevNum, sevText, body,
      if (attrs.isEmpty) null else attrs.toSeq, dropped, flags, traceId, spanId)
  }

  /** generic Resource{X} / Scope{X} two-level envelope parser. */
  private def parseEnvelope(bytes: Array[Byte], itemField: Int,
      parseItem: Reader => Row): Seq[Row] = {
    val root = new Reader(bytes, 0, bytes.length)
    val resourceBlocks = ListBuffer.empty[Row]
    while (root.hasMore) {
      val tag = root.readVarint()
      if ((tag >>> 3).toInt == 1) {
        val rl = root.readSub()
        var resource: Row = null; var schemaUrl: String = null
        val scopeBlocks = ListBuffer.empty[Row]
        while (rl.hasMore) {
          val t2 = rl.readVarint()
          (t2 >>> 3).toInt match {
            case 1 => resource = parseResource(rl.readSub())
            case 2 =>
              val sl = rl.readSub()
              var scope: Row = null; var sUrl: String = null
              val items = ListBuffer.empty[Row]
              while (sl.hasMore) {
                val t3 = sl.readVarint()
                (t3 >>> 3).toInt match {
                  case 1 => scope = parseScope(sl.readSub())
                  case `itemField` => items += parseItem(sl.readSub())
                  case 3 => sUrl = sl.readString()
                  case _ => sl.skip((t3 & 7).toInt)
                }
              }
              scopeBlocks += Row(scope, if (items.isEmpty) null else items.toSeq, sUrl)
            case 3 => schemaUrl = rl.readString()
            case _ => rl.skip((t2 & 7).toInt)
          }
        }
        resourceBlocks += Row(resource,
          if (scopeBlocks.isEmpty) null else scopeBlocks.toSeq, schemaUrl)
      } else root.skip((tag & 7).toInt)
    }
    resourceBlocks.toSeq
  }

  /** transparent gunzip (src-gzip: the reference decompresses request bodies
    * before decode, /root/reference/src/lib.rs:227). */
  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else bytes

  /** ExportLogsServiceRequest bytes → one Row of logsRequestType. */
  def parseLogsRequest(bytes: Array[Byte]): Row = {
    // ScopeLogs.log_records = 2; ScopeLogs.schema_url = 3 handled generically
    Row(parseEnvelope(gunzipIfNeeded(bytes), 2, parseLogRecord))
  }

  // ---- traces -------------------------------------------------------------

  private def parseEvent(r: Reader): Row = {
    var time: String = null; var name: String = null
    val attrs = ListBuffer.empty[Row]; var dropped: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => time = u64s(r.readFixed64())
        case 2 => name = r.readString()
        case 3 => attrs += parseKeyValue(r.readSub(), D)
        case 4 => dropped = r.readVarint().toString
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Row(time, name, if (attrs.isEmpty) null else attrs.toSeq, dropped)
  }

  private def parseLink(r: Reader): Row = {
    var traceId: String = null; var spanId: String = null
    var state: String = null
    val attrs = ListBuffer.empty[Row]; var dropped: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => traceId = b64OrNull(r.readBytes())
        case 2 => spanId = b64OrNull(r.readBytes())
        case 3 => state = r.readString()
        case 4 => attrs += parseKeyValue(r.readSub(), D)
        case 5 => dropped = r.readVarint().toString
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Row(traceId, spanId, state, if (attrs.isEmpty) null else attrs.toSeq, dropped)
  }

  private def parseSpan(r: Reader): Row = {
    var traceId: String = null; var spanId: String = null
    var state: String = null; var parent: String = null
    var name: String = null; var kind: String = null
    var start: String = null; var end: String = null
    val attrs = ListBuffer.empty[Row]; var dropped: String = null
    val events = ListBuffer.empty[Row]; val links = ListBuffer.empty[Row]
    var status: Row = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => traceId = b64OrNull(r.readBytes())
        case 2 => spanId = b64OrNull(r.readBytes())
        case 3 => state = r.readString()
        case 4 => parent = b64OrNull(r.readBytes())
        case 5 => name = r.readString()
        case 6 => kind = r.readVarint().toString
        case 7 => start = u64s(r.readFixed64())
        case 8 => end = u64s(r.readFixed64())
        case 9 => attrs += parseKeyValue(r.readSub(), D)
        case 10 => dropped = r.readVarint().toString
        case 11 => events += parseEvent(r.readSub())
        case 13 => links += parseLink(r.readSub())
        case 15 =>
          val s = r.readSub()
          var msg: String = null; var code: String = null
          while (s.hasMore) {
            val t2 = s.readVarint()
            (t2 >>> 3).toInt match {
              case 2 => msg = s.readString()
              case 3 => code = s.readVarint().toString
              case _ => s.skip((t2 & 7).toInt)
            }
          }
          status = Row(msg, code)
        case _ => r.skip(w)
      }
    }
    Row(traceId, spanId, state, parent, name, kind, start, end,
      if (attrs.isEmpty) null else attrs.toSeq, dropped,
      if (events.isEmpty) null else events.toSeq,
      if (links.isEmpty) null else links.toSeq, status)
  }

  /** ExportTraceServiceRequest bytes → one Row of tracesRequestType. */
  def parseTracesRequest(bytes: Array[Byte]): Row =
    Row(parseEnvelope(gunzipIfNeeded(bytes), 2, parseSpan))

  // ---- metrics ------------------------------------------------------------

  private def parseNumberPoint(r: Reader): Row = {
    val attrs = ListBuffer.empty[Row]
    var start: String = null; var time: String = null
    var asDouble: Any = null; var asInt: String = null; var flags: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 7 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => asDouble = dbl(r.readFixed64())
        case 6 => asInt = r.readFixed64().toString // sfixed64
        case 8 => flags = r.readVarint().toString
        case _ => r.skip(w)
      }
    }
    Row(if (attrs.isEmpty) null else attrs.toSeq, start, time, asDouble, asInt, flags)
  }

  private def parseHistogramPoint(r: Reader): Row = {
    val attrs = ListBuffer.empty[Row]
    var start: String = null; var time: String = null
    var count: String = null; var sum: Any = null
    val bucketCounts = ListBuffer.empty[String]
    val bounds = ListBuffer.empty[Double]
    var min: Any = null; var max: Any = null; var flags: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 9 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => count = u64s(r.readFixed64())
        case 5 => sum = dbl(r.readFixed64())
        case 6 => addPacked(r, w, s => bucketCounts += u64s(s.readFixed64()))
        case 7 => addPacked(r, w, s => bounds += dbl(s.readFixed64()))
        case 10 => flags = r.readVarint().toString
        case 11 => min = dbl(r.readFixed64())
        case 12 => max = dbl(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    Row(if (attrs.isEmpty) null else attrs.toSeq, start, time, count, sum,
      if (bucketCounts.isEmpty) null else bucketCounts.toSeq,
      if (bounds.isEmpty) null else bounds.toSeq, min, max, flags)
  }

  private def parseExpBuckets(r: Reader): Row = {
    var offset: String = null
    val counts = ListBuffer.empty[String]
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => offset = zigzag32(r.readVarint()).toString
        case 2 => addPacked(r, w, s => counts += u64s(s.readVarint()))
        case _ => r.skip(w)
      }
    }
    Row(offset, if (counts.isEmpty) null else counts.toSeq)
  }

  private def parseExpHistogramPoint(r: Reader): Row = {
    val attrs = ListBuffer.empty[Row]
    var start: String = null; var time: String = null
    var count: String = null; var sum: Any = null; var scale: String = null
    var zeroCount: String = null; var pos: Row = null; var neg: Row = null
    var min: Any = null; var max: Any = null; var flags: String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => count = u64s(r.readFixed64())
        case 5 => sum = dbl(r.readFixed64())
        case 6 => scale = zigzag32(r.readVarint()).toString
        case 7 => zeroCount = u64s(r.readFixed64())
        case 8 => pos = parseExpBuckets(r.readSub())
        case 9 => neg = parseExpBuckets(r.readSub())
        case 10 => flags = r.readVarint().toString
        case 12 => min = dbl(r.readFixed64())
        case 13 => max = dbl(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    Row(if (attrs.isEmpty) null else attrs.toSeq, start, time, count, sum,
      scale, zeroCount, pos, neg, min, max, flags)
  }

  private def parseSummaryPoint(r: Reader): Row = {
    val attrs = ListBuffer.empty[Row]
    var start: String = null; var time: String = null
    var count: String = null; var sum: Any = null; var flags: String = null
    val quantiles = ListBuffer.empty[Row]
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 7 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => count = u64s(r.readFixed64())
        case 5 => sum = dbl(r.readFixed64())
        case 6 =>
          val q = r.readSub()
          var quantile: Any = null; var value: Any = null
          while (q.hasMore) {
            val t2 = q.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => quantile = dbl(q.readFixed64())
              case 2 => value = dbl(q.readFixed64())
              case _ => q.skip((t2 & 7).toInt)
            }
          }
          quantiles += Row(quantile, value)
        case 8 => flags = r.readVarint().toString
        case _ => r.skip(w)
      }
    }
    Row(if (attrs.isEmpty) null else attrs.toSeq, start, time, count, sum,
      if (quantiles.isEmpty) null else quantiles.toSeq, flags)
  }

  private def parseMetric(r: Reader): Row = {
    var name: String = null; var desc: String = null; var unit: String = null
    var gauge: Row = null; var sum: Row = null; var histogram: Row = null
    var expHistogram: Row = null; var summary: Row = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => name = r.readString()
        case 2 => desc = r.readString()
        case 3 => unit = r.readString()
        case 5 => // Gauge { data_points = 1 }
          val g = r.readSub()
          val dps = ListBuffer.empty[Row]
          while (g.hasMore) {
            val t2 = g.readVarint()
            if ((t2 >>> 3).toInt == 1) dps += parseNumberPoint(g.readSub())
            else g.skip((t2 & 7).toInt)
          }
          gauge = Row(if (dps.isEmpty) null else dps.toSeq)
        case 7 => // Sum { data_points=1, temporality=2, is_monotonic=3 }
          val s = r.readSub()
          val dps = ListBuffer.empty[Row]
          var temporality: String = null; var monotonic: Any = null
          while (s.hasMore) {
            val t2 = s.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseNumberPoint(s.readSub())
              case 2 => temporality = s.readVarint().toString
              case 3 => monotonic = s.readVarint() != 0L
              case _ => s.skip((t2 & 7).toInt)
            }
          }
          sum = Row(if (dps.isEmpty) null else dps.toSeq, temporality, monotonic)
        case 9 => // Histogram { data_points=1, temporality=2 }
          val h = r.readSub()
          val dps = ListBuffer.empty[Row]
          var temporality: String = null
          while (h.hasMore) {
            val t2 = h.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseHistogramPoint(h.readSub())
              case 2 => temporality = h.readVarint().toString
              case _ => h.skip((t2 & 7).toInt)
            }
          }
          histogram = Row(if (dps.isEmpty) null else dps.toSeq, temporality)
        case 10 => // ExponentialHistogram { data_points=1, temporality=2 }
          val h = r.readSub()
          val dps = ListBuffer.empty[Row]
          var temporality: String = null
          while (h.hasMore) {
            val t2 = h.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseExpHistogramPoint(h.readSub())
              case 2 => temporality = h.readVarint().toString
              case _ => h.skip((t2 & 7).toInt)
            }
          }
          expHistogram = Row(if (dps.isEmpty) null else dps.toSeq, temporality)
        case 11 => // Summary { data_points = 1 }
          val s = r.readSub()
          val dps = ListBuffer.empty[Row]
          while (s.hasMore) {
            val t2 = s.readVarint()
            if ((t2 >>> 3).toInt == 1) dps += parseSummaryPoint(s.readSub())
            else s.skip((t2 & 7).toInt)
          }
          summary = Row(if (dps.isEmpty) null else dps.toSeq)
        case _ => r.skip(w)
      }
    }
    Row(name, desc, unit, gauge, sum, histogram, expHistogram, summary)
  }

  /** ExportMetricsServiceRequest bytes → one Row of metricsRequestType. */
  def parseMetricsRequest(bytes: Array[Byte]): Row =
    Row(parseEnvelope(gunzipIfNeeded(bytes), 2, parseMetric))
}
