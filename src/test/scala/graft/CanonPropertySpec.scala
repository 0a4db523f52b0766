package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JsonCanon, OtlpCodecs}

/** Property tests (ScalaCheck) for the byte-parity-critical pieces:
  * sorted-key JSON canonicalization, double formatting, id codecs
  * (SURVEY §5 rebuild test plan). */
class CanonPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // Rows for JsonCanon must carry a schema (fieldIndex-based access)
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
  import graft.schema.OtlpSchemas

  private val avSchema = OtlpSchemas.anyValueType(OtlpSchemas.MaxAnyValueDepth)
  private val kvSchema = OtlpSchemas.keyValueType(OtlpSchemas.MaxAnyValueDepth)

  private def strValue(s: String): Row =
    new GenericRowWithSchema(Array[Any](s, null, null, null, null, null, null), avSchema)

  private def kv(k: String, v: String): Row =
    new GenericRowWithSchema(Array[Any](k, strValue(v)), kvSchema)

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("attrsToJson: valid JSON, keys sorted by code point, values round-trip") {
    val genKV = for {
      k <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      v <- Gen.asciiPrintableStr
    } yield (k, v)
    check(Prop.forAll(Gen.listOf(genKV)) { pairs =>
      val json = JsonCanon.attrsToJson(pairs.map { case (k, v) => kv(k, v) })
      val node = jsonMapper.readTree(json) // parse must succeed
      val keys = {
        val it = node.fieldNames()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
      val sortedOk = keys == keys.sorted // alphanum keys: codepoint == lexicographic
      // last-wins per duplicate key, values preserved exactly
      val lastWins = pairs.groupBy(_._1).forall { case (k, vs) =>
        node.get(k).asText() == vs.last._2
      }
      sortedOk && lastWins
    })
  }

  test("attrsToJson escaping survives arbitrary unicode strings") {
    check(Prop.forAll(Gen.listOfN(3, Arbitrary.genString)) { vs =>
      val pairs = vs.zipWithIndex.map { case (v, i) => (s"k$i", v) }
      val json = JsonCanon.attrsToJson(pairs.map { case (k, v) => kv(k, v) })
      val node = jsonMapper.readTree(json)
      pairs.forall { case (k, v) => node.get(k).asText() == v }
    })
  }

  private object Arbitrary {
    // strings incl. control chars, quotes, backslashes, non-ASCII
    val genString: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.asciiPrintableChar,
      1 -> Gen.oneOf('"', '\\', '\n', '\t', '', 'é', '中', ' ')
    )).map(_.mkString)
  }

  test("fmtDouble round-trips every finite double") {
    check(Prop.forAll(Gen.chooseNum(Double.MinValue, Double.MaxValue)) { d =>
      java.lang.Double.parseDouble(JsonCanon.fmtDouble(d)) == d
    }, n = 1000)
    // exponent-form values too
    check(Prop.forAll(Gen.chooseNum(-300, 300), Gen.chooseNum(1.0, 9.999)) { (e, m) =>
      val d = m * math.pow(10, e)
      !java.lang.Double.isFinite(d) ||
        java.lang.Double.parseDouble(JsonCanon.fmtDouble(d)) == d
    }, n = 1000)
  }

  test("fmtDouble matches known serde_json (ryu) outputs across magnitudes") {
    // Hand-checked serde_json::to_string outputs; Java's Double.toString would
    // give scientific form for several of these (thresholds |x|>=1e7, <1e-3).
    val golden = Seq(
      12345678.0 -> "12345678.0",
      123456789.0 -> "123456789.0",
      1.0e15 -> "1000000000000000.0",
      9999999999999998.0 -> "9999999999999998.0",
      1.0e16 -> "1e16",
      1.2345678901e7 -> "12345678.901",
      0.0001 -> "0.0001",
      0.00001 -> "0.00001",
      1.01e-5 -> "0.0000101",
      1.0e-6 -> "1e-6",
      9.9e-6 -> "9.9e-6",
      -2.5e-4 -> "-0.00025",
      -12345678.0 -> "-12345678.0",
      1.0 -> "1.0",
      -0.5 -> "-0.5",
      0.0 -> "0.0",
      123456.789 -> "123456.789",
      1.7976931348623157e308 -> "1.7976931348623157e308",
      5e-324 -> "5e-324",
      2.2250738585072014e-308 -> "2.2250738585072014e-308"
    )
    golden.foreach { case (d, want) =>
      assert(JsonCanon.fmtDouble(d) == want, s"fmtDouble($d)")
    }
  }

  test("fmtDouble notation follows ryu's plain-decimal range (property)") {
    // Independent re-derivation: shortest digits from Double.toString, decimal
    // point position kk; ryu prints plain iff kk ∈ (-5, 16], via BigDecimal.
    def expected(d: Double): String = {
      import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
      val a = math.abs(d)
      if (a == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
      // shortest digits via ASCENDING precision search (implementation shrinks
      // from Java's digit count — opposite direction)
      val exact = new JBD(a)
      var p = 1
      var cand: JBD = null
      while (cand == null && p <= 18) {
        val r = exact.round(new MathContext(p, RoundingMode.HALF_EVEN))
        if (r.doubleValue() == a) cand = r
        p += 1
      }
      cand = cand.stripTrailingZeros()
      val digits = cand.unscaledValue().toString
      val exp = digits.length - 1 - cand.scale()
      val kk = exp + 1
      val sign = if (d < 0) "-" else ""
      if (kk > -5 && kk <= 16) {
        val plain = cand.toPlainString
        sign + (if (plain.contains('.')) plain else plain + ".0")
      } else {
        val mant = if (digits.length == 1) digits
          else digits.substring(0, 1) + "." + digits.substring(1)
        sign + mant + "e" + exp
      }
    }
    val genWide = for {
      e <- Gen.chooseNum(-320, 308)
      m <- Gen.chooseNum(1.0, 9.9999999)
      neg <- Gen.oneOf(true, false)
    } yield (if (neg) -m else m) * math.pow(10, e)
    check(Prop.forAll(genWide) { d =>
      !java.lang.Double.isFinite(d) || JsonCanon.fmtDouble(d) == expected(d)
    }, n = 2000)
    // exact decimal-looking values (the fast path's trailing/leading-zero
    // handling) and subnormals
    val genRound = for {
      m <- Gen.chooseNum(1L, 999999L)
      e <- Gen.chooseNum(-10, 10)
    } yield m * math.pow(10, e)
    check(Prop.forAll(genRound) { d =>
      !java.lang.Double.isFinite(d) || JsonCanon.fmtDouble(d) == expected(d)
    }, n = 2000)
    check(Prop.forAll(Gen.chooseNum(1L, 1000000L)) { bits =>
      val d = java.lang.Double.longBitsToDouble(bits) // deep subnormals
      JsonCanon.fmtDouble(d) == expected(d)
    }, n = 500)
  }

  test("decodeId: hex and base64 encodings of the same bytes agree") {
    val genBytes = Gen.containerOfN[Array, Byte](16, Gen.chooseNum(-128, 127).map(_.toByte))
    check(Prop.forAll(genBytes) { bytes =>
      val hex = OtlpCodecs.toHex(bytes)
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
      java.util.Arrays.equals(OtlpCodecs.decodeId(hex, 16), bytes) &&
        java.util.Arrays.equals(OtlpCodecs.decodeId(b64, 16), bytes)
    })
  }

  test("decodeId: wrong-length or garbage input is a hard error") {
    assert(OtlpCodecs.decodeId(null, 8).forall(_ == 0))
    assert(OtlpCodecs.decodeId("", 8).forall(_ == 0))
    intercept[IllegalArgumentException](OtlpCodecs.decodeId("zz!not-an-id", 8))
    intercept[IllegalArgumentException](
      OtlpCodecs.decodeId(java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2)), 8))
  }
}
