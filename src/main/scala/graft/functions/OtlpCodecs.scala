package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Id / enum / timestamp normalization for OTLP inputs.
  *
  * Ids arrive base64 *or* hex in OTLP/JSON (/root/reference/tests/e2e.rs:254-318);
  * invalid encodings are a hard error (matching the reference's 400).
  * Logs store raw bytes zero-filled to width; traces store lowercase hex
  * (/root/repo/SURVEY.md §1.3).
  */
object OtlpCodecs {

  private def isHex(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!ok) return false
      i += 1
    }
    true
  }

  private def hexDecode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** base64-or-hex id → exactly `nbytes` bytes; null/empty → zero-filled;
    * anything else → IllegalArgumentException (job fails, like the 400). */
  def decodeId(s: String, nbytes: Int): Array[Byte] = {
    if (s == null || s.isEmpty) return new Array[Byte](nbytes)
    if (s.length == 2 * nbytes && isHex(s)) return hexDecode(s)
    val decoded =
      try java.util.Base64.getDecoder.decode(s)
      catch {
        case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"invalid trace/span id (neither ${2 * nbytes}-char hex nor base64): $s")
      }
    if (decoded.length != nbytes)
      throw new IllegalArgumentException(
        s"invalid trace/span id: decoded ${decoded.length} bytes, expected $nbytes: $s")
    decoded
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def toHex(b: Array[Byte]): String = {
    val sb = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      sb(2 * i) = hexChars((b(i) >> 4) & 0xf)
      sb(2 * i + 1) = hexChars(b(i) & 0xf)
      i += 1
    }
    new String(sb)
  }

  // ---- enum tables (stable OTLP protobuf values; public spec) ------------

  /** SeverityNumber names → int (opentelemetry/proto logs.proto). */
  val severityByName: Map[String, Int] = {
    val levels = Seq("TRACE" -> 1, "DEBUG" -> 5, "INFO" -> 9, "WARN" -> 13,
      "ERROR" -> 17, "FATAL" -> 21)
    val named = for {
      (name, base) <- levels
      i <- 0 to 3
    } yield s"SEVERITY_NUMBER_$name${if (i == 0) "" else (i + 1).toString}" -> (base + i)
    (named :+ ("SEVERITY_NUMBER_UNSPECIFIED" -> 0)).toMap
  }

  val spanKindByNumber: Map[Int, String] = Map(
    0 -> "SPAN_KIND_UNSPECIFIED", 1 -> "SPAN_KIND_INTERNAL", 2 -> "SPAN_KIND_SERVER",
    3 -> "SPAN_KIND_CLIENT", 4 -> "SPAN_KIND_PRODUCER", 5 -> "SPAN_KIND_CONSUMER")
  val spanKindNames: Set[String] = spanKindByNumber.values.toSet

  val statusCodeByNumber: Map[Int, String] =
    Map(0 -> "STATUS_CODE_UNSET", 1 -> "STATUS_CODE_OK", 2 -> "STATUS_CODE_ERROR")
  val statusCodeNames: Set[String] = statusCodeByNumber.values.toSet

  val temporalityByName: Map[String, Int] = Map(
    "AGGREGATION_TEMPORALITY_UNSPECIFIED" -> 0,
    "AGGREGATION_TEMPORALITY_DELTA" -> 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE" -> 2)

  // ---- column expressions -------------------------------------------------

  private def isIntString(c: Column): Column = c.rlike("^-?[0-9]+$")

  /** severityNumber (name or int string) → int32; null/absent → 0. */
  def severityToInt(c: Column): Column = {
    val byName = severityByName.foldLeft(lit(null).cast("int")) {
      case (acc, (name, num)) => when(c === name, lit(num)).otherwise(acc)
    }
    coalesce(when(isIntString(c), c.cast("int")).otherwise(byName), lit(0))
  }

  /** kind (name or int string) → enum-name string; absent → UNSPECIFIED;
    * unknown names pass through (graceful, e2e.rs:238-305). */
  def spanKindToName(c: Column): Column = {
    val byNum = spanKindByNumber.foldLeft(lit("SPAN_KIND_UNSPECIFIED")) {
      case (acc, (num, name)) => when(c.cast("int") === num, lit(name)).otherwise(acc)
    }
    coalesce(when(isIntString(c), byNum).otherwise(c), lit("SPAN_KIND_UNSPECIFIED"))
  }

  /** status.code (name or int string) → enum-name string; absent → UNSET. */
  def statusCodeToName(c: Column): Column = {
    val byNum = statusCodeByNumber.foldLeft(lit("STATUS_CODE_UNSET")) {
      case (acc, (num, name)) => when(c.cast("int") === num, lit(name)).otherwise(acc)
    }
    coalesce(when(isIntString(c), byNum).otherwise(c), lit("STATUS_CODE_UNSET"))
  }

  /** aggregationTemporality (name or int string) → int32; absent → 0. */
  def temporalityToInt(c: Column): Column = {
    val byName = temporalityByName.foldLeft(lit(null).cast("int")) {
      case (acc, (name, num)) => when(c === name, lit(num)).otherwise(acc)
    }
    coalesce(when(isIntString(c), c.cast("int")).otherwise(byName), lit(0))
  }

  /** u64-nanos string → TimestampType at µs precision (truncating ns→µs,
    * SURVEY §1.3(3)); null → epoch 0. */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros(floor(coalesce(c.cast("decimal(24,0)"), lit(0)) / 1000).cast("long"))

  /** Same but keeps null (for optional event timestamps). */
  def nanosToTimestampNullable(c: Column): Column =
    timestamp_micros(floor(c.cast("decimal(24,0)") / 1000).cast("long"))
}
