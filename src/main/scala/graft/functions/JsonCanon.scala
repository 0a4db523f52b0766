package graft.functions

import org.apache.spark.sql.Row

/** Canonical JSON serialization of OTLP attributes and AnyValues.
  *
  * Replicates the reference's `serde_json::to_string` over a `BTreeMap`
  * (sorted keys, native JSON value types — observed in every golden file,
  * /root/reference/scripts/perf_audit.py:216-226 and
  * /root/reference/testdata/parquet goldens):
  *   - object keys sorted by Unicode code point (BTreeMap / UTF-8 byte order)
  *   - duplicate keys: last one wins
  *   - string escaping: `"`→\", `\`→\\, \b \f \n \r \t, other control chars
  *     as \u00XX; non-ASCII emitted raw (serde_json does not \u-escape)
  *   - ints bare, bools bare, doubles shortest-roundtrip
  *
  * Input rows follow [[graft.schema.OtlpSchemas.anyValueType]].
  */
object JsonCanon {

  def escapeInto(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** serde_json (ryu) style double formatting: integral finite values get a
    * trailing `.0`, exponents use lowercase `e` without `+`. Java's
    * `Double.toString` already emits shortest-roundtrip digits, but its
    * notation thresholds differ from ryu's: Java goes scientific at
    * |x| >= 1e7 or < 1e-3, ryu only outside kk ∈ (-5, 16] where kk is the
    * decimal-point position (10^(kk-1) <= |x| < 10^kk, ryu pretty format64).
    * So Java's E-form is re-expanded to plain decimal inside ryu's plain
    * range (e.g. 12345678.0 stays "12345678.0", 0.0001 stays "0.0001").
    */
  def fmtDouble(d: Double): String = {
    if (d.isNaN || d.isInfinite) return "null" // serde_json refuses; not reachable post metric-skip
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val a = math.abs(d)
    val sign = if (d < 0) "-" else ""
    val (digits, exp) = shortestDigits(a) // value = d1.d2d3… × 10^exp
    val kk = exp + 1 // digits before the decimal point in plain notation
    if (kk > -5 && kk <= 16) {
      // ryu plain-decimal range — expand
      if (kk >= digits.length) sign + digits + "0" * (kk - digits.length) + ".0"
      else if (kk > 0) sign + digits.substring(0, kk) + "." + digits.substring(kk)
      else sign + "0." + "0" * (-kk) + digits
    } else {
      // scientific, ryu-shaped: "1e16" / "1.23e-7" (no '+', single-digit bare)
      val mant = if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      sign + mant + "e" + exp
    }
  }

  /** Shortest half-even-rounded decimal significand of a positive finite
    * double, as (digit string, decimal exponent of the leading digit).
    * Java 17's legacy `Double.toString` is occasionally one digit longer than
    * shortest (JDK-4511638, e.g. min-subnormal "4.9E-324" vs ryu "5e-324"),
    * so Java's digit count only seeds a BigDecimal shrink loop: keep reducing
    * precision while the correctly-rounded value still round-trips.
    */
  private def shortestDigits(a: Double): (String, Int) = {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    val s = java.lang.Double.toString(a)
    val (javaMant, javaExp) = {
      val e = s.indexOf('E')
      var m = if (e < 0) s else s.substring(0, e)
      val exp =
        if (e < 0) m.indexOf('.') - 1 // plain form: digits before the point − 1
        else Integer.parseInt(s.substring(e + 1))
      if (m.endsWith(".0")) m = m.substring(0, m.length - 2)
      val digits = m.replace(".", "")
      // plain small values ("0.0012") carry leading zeros that are not
      // significant — strip them and fix the exponent; round values
      // ("100.0") carry non-significant trailing zeros — strip those too
      // (the leading-digit exponent is unchanged)
      var lead = 0
      while (lead < digits.length - 1 && digits.charAt(lead) == '0') lead += 1
      var d2 = digits.substring(lead)
      var tail = d2.length
      while (tail > 1 && d2.charAt(tail - 1) == '0') tail -= 1
      d2 = d2.substring(0, tail)
      (d2, if (e < 0 && lead > 0) exp - lead else exp)
    }
    val l = javaMant.length
    if (l == 1) return (javaMant, javaExp)
    // FAST PATH (hot per-row in canonical-JSON ingest): Java's digit string
    // is shortest for almost all doubles; it is one digit too long only in
    // rare cases (JDK-4511638). An (l−1)-digit decimal exists iff the floor
    // or ceiling of the value on that grid round-trips — two parseDouble
    // probes decide without any BigDecimal work.
    val t = javaMant.substring(0, l - 1)
    val gridExp = javaExp - (l - 2) // exponent of the (l−1)-digit grid
    val vFloor = java.lang.Double.parseDouble(t + "e" + gridExp)
    val vCeil = java.lang.Double.parseDouble((BigInt(t) + 1).toString + "e" + gridExp)
    if (vFloor != a && vCeil != a) return (javaMant, javaExp)
    // SLOW PATH: a shorter representation exists — find the minimal
    // half-even-rounded one exactly
    val exact = new JBD(a)
    var cand = exact.round(new MathContext(l, RoundingMode.HALF_EVEN))
    var p = l
    var shrinking = p > 1
    while (shrinking) {
      val r = exact.round(new MathContext(p - 1, RoundingMode.HALF_EVEN))
      if (r.doubleValue() == a) { cand = r; p -= 1; shrinking = p > 1 }
      else shrinking = false
    }
    cand = cand.stripTrailingZeros()
    val digits = cand.unscaledValue().toString
    (digits, digits.length - 1 - cand.scale())
  }

  /** Code-point (UTF-8 byte order) comparator — matches Rust BTreeMap<String>.
    * Public: shared with the catalyst expressions in AttrsJsonExpressions. */
  def cpLessThan(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(i)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
    }
    a.length < b.length
  }

  /** AnyValue Row (schema [[graft.schema.OtlpSchemas.anyValueType]]) → JSON. */
  def anyValueInto(v: Row, sb: java.lang.StringBuilder): Unit = {
    if (v == null) { sb.append("null"); return }
    val n = v.schema.fieldNames
    def idx(f: String): Int = v.fieldIndex(f)
    val iStr = idx("stringValue")
    if (!v.isNullAt(iStr)) { escapeInto(v.getString(iStr), sb); return }
    val iBool = idx("boolValue")
    if (!v.isNullAt(iBool)) { sb.append(v.getBoolean(iBool)); return }
    val iInt = idx("intValue")
    if (!v.isNullAt(iInt)) { sb.append(java.lang.Long.parseLong(v.getString(iInt).trim)); return }
    val iDbl = idx("doubleValue")
    if (!v.isNullAt(iDbl)) { sb.append(fmtDouble(v.getDouble(iDbl))); return }
    val iBytes = idx("bytesValue")
    if (!v.isNullAt(iBytes)) { escapeInto(v.getString(iBytes), sb); return } // keep base64 text
    if (n.contains("arrayValue")) {
      val iArr = idx("arrayValue")
      if (!v.isNullAt(iArr)) {
        val arr = v.getStruct(iArr)
        sb.append('[')
        val values =
          if (arr.isNullAt(arr.fieldIndex("values"))) Seq.empty[Row]
          else arr.getSeq[Row](arr.fieldIndex("values"))
        var first = true
        values.foreach { e =>
          if (!first) sb.append(','); first = false
          anyValueInto(e, sb)
        }
        sb.append(']')
        return
      }
      val iKv = idx("kvlistValue")
      if (!v.isNullAt(iKv)) {
        val kvl = v.getStruct(iKv)
        val values =
          if (kvl.isNullAt(kvl.fieldIndex("values"))) Seq.empty[Row]
          else kvl.getSeq[Row](kvl.fieldIndex("values"))
        kvListInto(values, sb)
        return
      }
    }
    sb.append("null") // empty AnyValue
  }

  /** KeyValue list → sorted-key JSON object (last duplicate wins). */
  def kvListInto(kvs: Seq[Row], sb: java.lang.StringBuilder): Unit = {
    if (kvs == null || kvs.isEmpty) { sb.append("{}"); return }
    // last-wins dedup, then code-point sort
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Row]
    kvs.foreach { kv =>
      if (kv != null) {
        val k = if (kv.isNullAt(0)) "" else kv.getString(0)
        val v = if (kv.isNullAt(1)) null else kv.getStruct(1)
        m.put(k, v)
      }
    }
    val keys = m.keys.toArray
    scala.util.Sorting.stableSort(keys, cpLessThan _)
    sb.append('{')
    var first = true
    keys.foreach { k =>
      if (!first) sb.append(','); first = false
      escapeInto(k, sb)
      sb.append(':')
      anyValueInto(m(k), sb)
    }
    sb.append('}')
  }

  /** Attributes array → canonical JSON object string ("{}" for null/empty). */
  def attrsToJson(kvs: Seq[Row]): String = {
    val sb = new java.lang.StringBuilder(64)
    kvListInto(if (kvs == null) Seq.empty else kvs, sb)
    sb.toString
  }

  /** Attributes array minus the given keys. */
  def attrsToJsonExcluding(kvs: Seq[Row], excluded: Set[String]): String = {
    val kept =
      if (kvs == null) Seq.empty[Row]
      else kvs.filter(kv => kv == null || kv.isNullAt(0) || !excluded.contains(kv.getString(0)))
    attrsToJson(kept)
  }

  /** AnyValue → JSON-encoded string (a plain string body becomes `"..."`),
    * null for an absent body. */
  def anyValueToJson(v: Row): String = {
    if (v == null) return null
    val sb = new java.lang.StringBuilder(32)
    anyValueInto(v, sb)
    sb.toString
  }
}
