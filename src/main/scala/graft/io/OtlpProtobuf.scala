package graft.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.OtlpSchemas

/** Minimal protobuf wire-format decoder for the three OTLP export requests
  * (src-protobuf, SURVEY §2.1).
  *
  * No protobuf runtime or descriptor tooling exists in this environment, so
  * this parses the public protobuf wire format directly (varint / fixed64 /
  * length-delimited / fixed32) with the public opentelemetry-proto field
  * numbers, and emits rows in the exact nested shapes of [[OtlpSchemas]]'s
  * *input* schemas — the same shapes the JSON reader produces. Downstream
  * transforms are therefore format-agnostic: ids are re-encoded base64
  * (what the JSON path accepts), u64 nanos become decimal strings, enums
  * become int strings (the codecs normalize both names and ints).
  *
  * The decode builds Tungsten values DIRECTLY — [[GenericInternalRow]] /
  * [[GenericArrayData]] / [[UTF8String]] (wire strings slice the input
  * buffer with zero re-copy) — so the batch reader feeds the engine with
  * no external-Row hop and no `RowEncoder` conversion pass; round-11
  * measurement: the Row+encoder form capped the pb pipeline at 44k rows/s
  * while the JSON reader (which writes InternalRow natively) did 62k. The
  * `*Row` adapters expose the same decodes as external [[Row]]s for
  * callers that introspect values driver-side (the streaming skip-and-
  * count path, property tests).
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

    /** wire string → UTF8String WRAPPING the input buffer (the 3-arg
      * fromBytes overload is zero-copy — it aliases `buf`, it does not copy
      * the slice). Consequence: every decoded string pins the whole
      * (possibly gunzipped) request body until the emitted row is copied to
      * an UnsafeRow — which happens immediately downstream (the decode
      * expression's rows flow straight into a whole-stage-codegen projection
      * that materializes UnsafeRows), so the pin is one payload per task at
      * a time, bounded by the ingest payload limit. If rows ever become
      * long-lived in decoded form, switch to a copying
      * fromBytes(Arrays.copyOfRange(...)). Still skips the
      * byte[]→java.lang.String→byte[] round trip the old Row form paid. */
    def readString(): UTF8String = {
      val r = readSub()
      UTF8String.fromBytes(buf, r.pos, r.end - r.pos)
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

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def u64s(v: Long): UTF8String =
    utf8(java.lang.Long.toUnsignedString(v))

  private def b64OrNull(b: Array[Byte]): UTF8String =
    if (b == null || b.isEmpty) null
    else utf8(java.util.Base64.getEncoder.encodeToString(b))

  private def dbl(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)

  import scala.collection.mutable.ListBuffer

  private def ir(vs: Any*): InternalRow = new GenericInternalRow(vs.toArray)

  private def arr(vs: ListBuffer[Any]): GenericArrayData =
    new GenericArrayData(vs.toArray)

  private def arrOrNull(vs: ListBuffer[Any]): GenericArrayData =
    if (vs.isEmpty) null else arr(vs)

  /** packed-or-not repeated scalar field accumulation. */
  private def addPacked(r: Reader, wire: Int, each: Reader => Unit): Unit =
    if (wire == 2) { val s = r.readSub(); while (s.hasMore) each(s) }
    else each(r)

  // ---- common messages ----------------------------------------------------

  private def parseAnyValue(r: Reader, depth: Int): InternalRow = {
    var s: UTF8String = null; var b: Any = null; var i: UTF8String = null
    var d: Any = null; var by: UTF8String = null
    var arrV: InternalRow = null; var kvl: InternalRow = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => s = r.readString()
        case 2 => b = r.readVarint() != 0L
        case 3 => i = utf8(r.readVarint().toString)
        case 4 => d = dbl(r.readFixed64())
        case 5 =>
          val sub = r.readSub()
          if (depth > 0) {
            val vals = ListBuffer.empty[Any]
            while (sub.hasMore) {
              val t2 = sub.readVarint()
              if ((t2 >>> 3).toInt == 1) vals += parseAnyValue(sub.readSub(), depth - 1)
              else sub.skip((t2 & 7).toInt)
            }
            arrV = ir(arr(vals))
          }
        case 6 =>
          val sub = r.readSub()
          if (depth > 0) {
            val vals = ListBuffer.empty[Any]
            while (sub.hasMore) {
              val t2 = sub.readVarint()
              if ((t2 >>> 3).toInt == 1) vals += parseKeyValue(sub.readSub(), depth - 1)
              else sub.skip((t2 & 7).toInt)
            }
            kvl = ir(arr(vals))
          }
        case 7 => by = b64OrNull(r.readBytes())
        case _ => r.skip(w)
      }
    }
    // field order: stringValue, boolValue, intValue, doubleValue, bytesValue
    // [, arrayValue, kvlistValue] — OtlpSchemas.anyValueType
    if (depth > 0) ir(s, b, i, d, by, arrV, kvl) else ir(s, b, i, d, by)
  }

  private def parseKeyValue(r: Reader, depth: Int): InternalRow = {
    var key: UTF8String = null; var value: InternalRow = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => key = r.readString()
        case 2 => value = parseAnyValue(r.readSub(), depth)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    ir(key, value)
  }

  private val D = OtlpSchemas.MaxAnyValueDepth

  private def parseResource(r: Reader): InternalRow = {
    val attrs = ListBuffer.empty[Any]; var dropped: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => dropped = utf8(r.readVarint().toString)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    ir(arrOrNull(attrs), dropped)
  }

  private def parseScope(r: Reader): InternalRow = {
    var name: UTF8String = null; var version: UTF8String = null
    val attrs = ListBuffer.empty[Any]; var dropped: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => name = r.readString()
        case 2 => version = r.readString()
        case 3 => attrs += parseKeyValue(r.readSub(), D)
        case 4 => dropped = utf8(r.readVarint().toString)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    ir(name, version, arrOrNull(attrs), dropped)
  }

  // ---- logs ---------------------------------------------------------------

  private def parseLogRecord(r: Reader): InternalRow = {
    var time: UTF8String = null; var observed: UTF8String = null
    var sevNum: UTF8String = null; var sevText: UTF8String = null
    var body: InternalRow = null; val attrs = ListBuffer.empty[Any]
    var dropped: UTF8String = null; var flags: UTF8String = null
    var traceId: UTF8String = null; var spanId: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => time = u64s(r.readFixed64())
        case 2 => sevNum = utf8(r.readVarint().toString)
        case 3 => sevText = r.readString()
        case 5 => body = parseAnyValue(r.readSub(), D)
        case 6 => attrs += parseKeyValue(r.readSub(), D)
        case 7 => dropped = utf8(r.readVarint().toString)
        case 8 => flags = utf8(java.lang.Integer.toUnsignedString(r.readFixed32()))
        case 9 => traceId = b64OrNull(r.readBytes())
        case 10 => spanId = b64OrNull(r.readBytes())
        case 11 => observed = u64s(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    ir(time, observed, sevNum, sevText, body,
      arrOrNull(attrs), dropped, flags, traceId, spanId)
  }

  /** generic Resource{X} / Scope{X} two-level envelope parser. */
  private def parseEnvelope(bytes: Array[Byte], itemField: Int,
      parseItem: Reader => InternalRow): GenericArrayData = {
    val root = new Reader(bytes, 0, bytes.length)
    val resourceBlocks = ListBuffer.empty[Any]
    while (root.hasMore) {
      val tag = root.readVarint()
      if ((tag >>> 3).toInt == 1) {
        val rl = root.readSub()
        var resource: InternalRow = null; var schemaUrl: UTF8String = null
        val scopeBlocks = ListBuffer.empty[Any]
        while (rl.hasMore) {
          val t2 = rl.readVarint()
          (t2 >>> 3).toInt match {
            case 1 => resource = parseResource(rl.readSub())
            case 2 =>
              val sl = rl.readSub()
              var scope: InternalRow = null; var sUrl: UTF8String = null
              val items = ListBuffer.empty[Any]
              while (sl.hasMore) {
                val t3 = sl.readVarint()
                (t3 >>> 3).toInt match {
                  case 1 => scope = parseScope(sl.readSub())
                  case `itemField` => items += parseItem(sl.readSub())
                  case 3 => sUrl = sl.readString()
                  case _ => sl.skip((t3 & 7).toInt)
                }
              }
              scopeBlocks += ir(scope, arrOrNull(items), sUrl)
            case 3 => schemaUrl = rl.readString()
            case _ => rl.skip((t2 & 7).toInt)
          }
        }
        resourceBlocks += ir(resource, arrOrNull(scopeBlocks), schemaUrl)
      } else root.skip((tag & 7).toInt)
    }
    arr(resourceBlocks)
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

  /** ExportLogsServiceRequest bytes → one InternalRow of logsRequestType. */
  def parseLogsRequest(bytes: Array[Byte]): InternalRow = {
    // ScopeLogs.log_records = 2; ScopeLogs.schema_url = 3 handled generically
    ir(parseEnvelope(gunzipIfNeeded(bytes), 2, parseLogRecord))
  }

  // ---- traces -------------------------------------------------------------

  private def parseEvent(r: Reader): InternalRow = {
    var time: UTF8String = null; var name: UTF8String = null
    val attrs = ListBuffer.empty[Any]; var dropped: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => time = u64s(r.readFixed64())
        case 2 => name = r.readString()
        case 3 => attrs += parseKeyValue(r.readSub(), D)
        case 4 => dropped = utf8(r.readVarint().toString)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    ir(time, name, arrOrNull(attrs), dropped)
  }

  private def parseLink(r: Reader): InternalRow = {
    var traceId: UTF8String = null; var spanId: UTF8String = null
    var state: UTF8String = null
    val attrs = ListBuffer.empty[Any]; var dropped: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => traceId = b64OrNull(r.readBytes())
        case 2 => spanId = b64OrNull(r.readBytes())
        case 3 => state = r.readString()
        case 4 => attrs += parseKeyValue(r.readSub(), D)
        case 5 => dropped = utf8(r.readVarint().toString)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    ir(traceId, spanId, state, arrOrNull(attrs), dropped)
  }

  private def parseSpan(r: Reader): InternalRow = {
    var traceId: UTF8String = null; var spanId: UTF8String = null
    var state: UTF8String = null; var parent: UTF8String = null
    var name: UTF8String = null; var kind: UTF8String = null
    var start: UTF8String = null; var end: UTF8String = null
    val attrs = ListBuffer.empty[Any]; var dropped: UTF8String = null
    val events = ListBuffer.empty[Any]; val links = ListBuffer.empty[Any]
    var status: InternalRow = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => traceId = b64OrNull(r.readBytes())
        case 2 => spanId = b64OrNull(r.readBytes())
        case 3 => state = r.readString()
        case 4 => parent = b64OrNull(r.readBytes())
        case 5 => name = r.readString()
        case 6 => kind = utf8(r.readVarint().toString)
        case 7 => start = u64s(r.readFixed64())
        case 8 => end = u64s(r.readFixed64())
        case 9 => attrs += parseKeyValue(r.readSub(), D)
        case 10 => dropped = utf8(r.readVarint().toString)
        case 11 => events += parseEvent(r.readSub())
        case 13 => links += parseLink(r.readSub())
        case 15 =>
          val s = r.readSub()
          var msg: UTF8String = null; var code: UTF8String = null
          while (s.hasMore) {
            val t2 = s.readVarint()
            (t2 >>> 3).toInt match {
              case 2 => msg = s.readString()
              case 3 => code = utf8(s.readVarint().toString)
              case _ => s.skip((t2 & 7).toInt)
            }
          }
          status = ir(msg, code)
        case _ => r.skip(w)
      }
    }
    ir(traceId, spanId, state, parent, name, kind, start, end,
      arrOrNull(attrs), dropped, arrOrNull(events), arrOrNull(links), status)
  }

  /** ExportTraceServiceRequest bytes → one InternalRow of tracesRequestType. */
  def parseTracesRequest(bytes: Array[Byte]): InternalRow =
    ir(parseEnvelope(gunzipIfNeeded(bytes), 2, parseSpan))

  // ---- metrics ------------------------------------------------------------

  private def parseNumberPoint(r: Reader): InternalRow = {
    val attrs = ListBuffer.empty[Any]
    var start: UTF8String = null; var time: UTF8String = null
    var asDouble: Any = null; var asInt: UTF8String = null
    var flags: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 7 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => asDouble = dbl(r.readFixed64())
        case 6 => asInt = utf8(r.readFixed64().toString) // sfixed64
        case 8 => flags = utf8(r.readVarint().toString)
        case _ => r.skip(w)
      }
    }
    ir(arrOrNull(attrs), start, time, asDouble, asInt, flags)
  }

  private def parseHistogramPoint(r: Reader): InternalRow = {
    val attrs = ListBuffer.empty[Any]
    var start: UTF8String = null; var time: UTF8String = null
    var count: UTF8String = null; var sum: Any = null
    val bucketCounts = ListBuffer.empty[Any]
    val bounds = ListBuffer.empty[Any]
    var min: Any = null; var max: Any = null; var flags: UTF8String = null
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
        case 10 => flags = utf8(r.readVarint().toString)
        case 11 => min = dbl(r.readFixed64())
        case 12 => max = dbl(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    ir(arrOrNull(attrs), start, time, count, sum,
      arrOrNull(bucketCounts), arrOrNull(bounds), min, max, flags)
  }

  private def parseExpBuckets(r: Reader): InternalRow = {
    var offset: UTF8String = null
    val counts = ListBuffer.empty[Any]
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => offset = utf8(zigzag32(r.readVarint()).toString)
        case 2 => addPacked(r, w, s => counts += u64s(s.readVarint()))
        case _ => r.skip(w)
      }
    }
    ir(offset, arrOrNull(counts))
  }

  private def parseExpHistogramPoint(r: Reader): InternalRow = {
    val attrs = ListBuffer.empty[Any]
    var start: UTF8String = null; var time: UTF8String = null
    var count: UTF8String = null; var sum: Any = null
    var scale: UTF8String = null
    var zeroCount: UTF8String = null
    var pos: InternalRow = null; var neg: InternalRow = null
    var min: Any = null; var max: Any = null; var flags: UTF8String = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => attrs += parseKeyValue(r.readSub(), D)
        case 2 => start = u64s(r.readFixed64())
        case 3 => time = u64s(r.readFixed64())
        case 4 => count = u64s(r.readFixed64())
        case 5 => sum = dbl(r.readFixed64())
        case 6 => scale = utf8(zigzag32(r.readVarint()).toString)
        case 7 => zeroCount = u64s(r.readFixed64())
        case 8 => pos = parseExpBuckets(r.readSub())
        case 9 => neg = parseExpBuckets(r.readSub())
        case 10 => flags = utf8(r.readVarint().toString)
        case 12 => min = dbl(r.readFixed64())
        case 13 => max = dbl(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    ir(arrOrNull(attrs), start, time, count, sum,
      scale, zeroCount, pos, neg, min, max, flags)
  }

  private def parseSummaryPoint(r: Reader): InternalRow = {
    val attrs = ListBuffer.empty[Any]
    var start: UTF8String = null; var time: UTF8String = null
    var count: UTF8String = null; var sum: Any = null
    var flags: UTF8String = null
    val quantiles = ListBuffer.empty[Any]
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
          quantiles += ir(quantile, value)
        case 8 => flags = utf8(r.readVarint().toString)
        case _ => r.skip(w)
      }
    }
    ir(arrOrNull(attrs), start, time, count, sum,
      arrOrNull(quantiles), flags)
  }

  private def parseMetric(r: Reader): InternalRow = {
    var name: UTF8String = null; var desc: UTF8String = null
    var unit: UTF8String = null
    var gauge: InternalRow = null; var sum: InternalRow = null
    var histogram: InternalRow = null
    var expHistogram: InternalRow = null; var summary: InternalRow = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      f match {
        case 1 => name = r.readString()
        case 2 => desc = r.readString()
        case 3 => unit = r.readString()
        case 5 => // Gauge { data_points = 1 }
          val g = r.readSub()
          val dps = ListBuffer.empty[Any]
          while (g.hasMore) {
            val t2 = g.readVarint()
            if ((t2 >>> 3).toInt == 1) dps += parseNumberPoint(g.readSub())
            else g.skip((t2 & 7).toInt)
          }
          gauge = ir(arrOrNull(dps))
        case 7 => // Sum { data_points=1, temporality=2, is_monotonic=3 }
          val s = r.readSub()
          val dps = ListBuffer.empty[Any]
          var temporality: UTF8String = null; var monotonic: Any = null
          while (s.hasMore) {
            val t2 = s.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseNumberPoint(s.readSub())
              case 2 => temporality = utf8(s.readVarint().toString)
              case 3 => monotonic = s.readVarint() != 0L
              case _ => s.skip((t2 & 7).toInt)
            }
          }
          sum = ir(arrOrNull(dps), temporality, monotonic)
        case 9 => // Histogram { data_points=1, temporality=2 }
          val h = r.readSub()
          val dps = ListBuffer.empty[Any]
          var temporality: UTF8String = null
          while (h.hasMore) {
            val t2 = h.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseHistogramPoint(h.readSub())
              case 2 => temporality = utf8(h.readVarint().toString)
              case _ => h.skip((t2 & 7).toInt)
            }
          }
          histogram = ir(arrOrNull(dps), temporality)
        case 10 => // ExponentialHistogram { data_points=1, temporality=2 }
          val h = r.readSub()
          val dps = ListBuffer.empty[Any]
          var temporality: UTF8String = null
          while (h.hasMore) {
            val t2 = h.readVarint()
            (t2 >>> 3).toInt match {
              case 1 => dps += parseExpHistogramPoint(h.readSub())
              case 2 => temporality = utf8(h.readVarint().toString)
              case _ => h.skip((t2 & 7).toInt)
            }
          }
          expHistogram = ir(arrOrNull(dps), temporality)
        case 11 => // Summary { data_points = 1 }
          val s = r.readSub()
          val dps = ListBuffer.empty[Any]
          while (s.hasMore) {
            val t2 = s.readVarint()
            if ((t2 >>> 3).toInt == 1) dps += parseSummaryPoint(s.readSub())
            else s.skip((t2 & 7).toInt)
          }
          summary = ir(arrOrNull(dps))
        case _ => r.skip(w)
      }
    }
    ir(name, desc, unit, gauge, sum, histogram, expHistogram, summary)
  }

  /** ExportMetricsServiceRequest bytes → one InternalRow of
    * metricsRequestType. */
  def parseMetricsRequest(bytes: Array[Byte]): InternalRow =
    ir(parseEnvelope(gunzipIfNeeded(bytes), 2, parseMetric))

  // ---- external-Row adapters ----------------------------------------------

  private lazy val logsToScala =
    org.apache.spark.sql.graftbridge.ColumnBridge
      .toScalaRow(OtlpSchemas.logsRequestType)
  private lazy val tracesToScala =
    org.apache.spark.sql.graftbridge.ColumnBridge
      .toScalaRow(OtlpSchemas.tracesRequestType)
  private lazy val metricsToScala =
    org.apache.spark.sql.graftbridge.ColumnBridge
      .toScalaRow(OtlpSchemas.metricsRequestType)

  /** [[parseLogsRequest]] as an external [[Row]] — for callers that
    * introspect values driver-side or feed `Encoders.row` pipelines (the
    * streaming skip-and-count path, property tests). */
  def parseLogsRequestRow(bytes: Array[Byte]): Row =
    logsToScala(parseLogsRequest(bytes))

  def parseTracesRequestRow(bytes: Array[Byte]): Row =
    tracesToScala(parseTracesRequest(bytes))

  def parseMetricsRequestRow(bytes: Array[Byte]): Row =
    metricsToScala(parseMetricsRequest(bytes))

  // ---- the decode as a Catalyst expression ----------------------------------

  /** Guarded decode entry point for [[PbDecodeExpr]]'s generated code:
    * enforces the reference's 413 payload cap, then dispatches on the
    * signal ordinal (0 = logs, 1 = traces, 2 = metrics). */
  def decodeGuarded(bytes: Array[Byte], maxBytes: Long, signal: Int): InternalRow = {
    if (bytes.length > maxBytes)
      throw new IllegalArgumentException(
        s"payload ${bytes.length} bytes exceeds max $maxBytes (reference 413)")
    signal match {
      case 0 => parseLogsRequest(bytes)
      case 1 => parseTracesRequest(bytes)
      case _ => parseMetricsRequest(bytes)
    }
  }
}

/** `binary → Export*ServiceRequest struct`: the wire decode spliced into
  * whole-stage codegen as one static call — the batch protobuf reader's
  * row-construction path, with no external-Row hop and no RowEncoder
  * conversion (the decoder builds Tungsten values directly). Null in →
  * null out; oversized payloads throw (reference 413 parity, like the
  * JSON reader's FAILFAST). */
case class PbDecodeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    signal: Int, maxBytes: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pb_decode requires binary input, got ${t.sql}")
  }
  override def dataType: DataType = signal match {
    case 0 => OtlpSchemas.logsRequestType
    case 1 => OtlpSchemas.tracesRequestType
    case _ => OtlpSchemas.metricsRequestType
  }
  override def prettyName: String = "pb_decode"
  override protected def nullSafeEval(bytes: Any): Any =
    OtlpProtobuf.decodeGuarded(bytes.asInstanceOf[Array[Byte]], maxBytes, signal)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.io.OtlpProtobuf.decodeGuarded($v, ${maxBytes}L, $signal);")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PbDecodeExpr =
    copy(child = newChild)
}
