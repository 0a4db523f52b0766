package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.io.{OtlpProtobuf, OtlpRead}

/** Wire-format round-trip property test: encode random OTLP log structures
  * with a test-side protobuf encoder (public wire spec), decode with
  * [[OtlpProtobuf]], and check the values land in the right schema slots.
  * Fixture tests pin golden parity; this pins the decoder against arbitrary
  * field values, lengths, and unknown-field skipping. */
class ProtoRoundTripSpec extends SparkTestBase {

  // ---- minimal test-side wire encoder ----
  private class W {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): W = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def fixed64(field: Int, v: Long): W = {
      tag(field, 1)
      var i = 0
      var x = v
      while (i < 8) { out.write((x & 0xff).toInt); x >>>= 8; i += 1 }
      this
    }
    def fixed32(field: Int, v: Int): W = {
      tag(field, 5)
      var i = 0
      var x = v
      while (i < 4) { out.write(x & 0xff); x >>>= 8; i += 1 }
      this
    }
    def bytes(field: Int, b: Array[Byte]): W = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, m: W): W = bytes(field, m.out.toByteArray)
    def vint(field: Int, v: Long): W = { tag(field, 0); varint(v) }
  }

  private def anyValueStr(s: String): W = new W().str(1, s)
  private def kv(k: String, v: String): W =
    new W().str(1, k).msg(2, anyValueStr(v))

  private case class TestLog(timeNs: Long, sevNum: Int, sevText: String,
      body: String, attrs: Seq[(String, String)], traceId: Array[Byte],
      flags: Int)

  private def encode(logs: Seq[TestLog], serviceName: String): Array[Byte] = {
    val scopeLogs = new W().msg(1, new W().str(1, "test-scope").str(2, "1.0"))
    logs.foreach { l =>
      val rec = new W()
        .fixed64(1, l.timeNs)
        .vint(2, l.sevNum)
        .str(3, l.sevText)
        .msg(5, anyValueStr(l.body))
      l.attrs.foreach { case (k, v) => rec.msg(6, kv(k, v)) }
      rec.fixed32(8, l.flags)
      rec.bytes(9, l.traceId)
      // unknown field the decoder must skip (field 99, varint)
      rec.vint(99, 12345L)
      scopeLogs.msg(2, rec)
    }
    val resource = new W().msg(1, kv("service.name", serviceName))
    val resourceLogs = new W().msg(1, resource).msg(2, scopeLogs).str(3, "http://s")
    new W().msg(1, resourceLogs).out.toByteArray
  }

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("decoder round-trips arbitrary log batches (values, ids, unknown-field skip)") {
    val genLog = for {
      t <- Gen.chooseNum(0L, Long.MaxValue)
      sev <- Gen.chooseNum(0, 24)
      st <- Gen.alphaNumStr
      body <- Gen.asciiPrintableStr
      nAttrs <- Gen.chooseNum(0, 4)
      attrs <- Gen.listOfN(nAttrs, Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.asciiPrintableStr))
      tid <- Gen.containerOfN[Array, Byte](16, Gen.chooseNum(-128, 127).map(_.toByte))
      flags <- Gen.oneOf(0, 1)
    } yield TestLog(t, sev, st, body, attrs, tid, flags)

    check(Prop.forAll(Gen.nonEmptyListOf(genLog), Gen.alphaNumStr.suchThat(_.nonEmpty)) {
      (logs, svc) =>
        // decoder rows are positional (schema attaches at the Encoder);
        // field positions follow OtlpSchemas: logRecordType = (time,
        // observed, sevNum, sevText, body, attrs, dropped, flags, traceId,
        // spanId)
        val row = OtlpProtobuf.parseLogsRequestRow(encode(logs, svc))
        val rl = row.getSeq[org.apache.spark.sql.Row](0).head
        val resource = rl.getStruct(0)
        val svcOk = resource.getSeq[org.apache.spark.sql.Row](0)
          .head.getString(0) == "service.name"
        val recs = rl.getSeq[org.apache.spark.sql.Row](1).head
          .getSeq[org.apache.spark.sql.Row](1)
        val allOk = recs.zip(logs).forall { case (r, l) =>
          r.getString(0) == java.lang.Long.toUnsignedString(l.timeNs) &&
            r.getString(2) == l.sevNum.toString &&
            r.getString(3) == l.sevText &&
            r.getString(8) ==
              java.util.Base64.getEncoder.encodeToString(l.traceId) &&
            r.getString(7) == l.flags.toString &&
            (r.getStruct(4) != null)
        }
        svcOk && recs.length == logs.length && allOk
    })
  }

  test("decoded random batches flow through the full flatten transform") {
    import org.apache.spark.sql.Encoders
    val logs = Seq(
      TestLog(1700000000123456789L, 9, "INFO", "hello", Seq("k" -> "v", "a" -> "b"),
        Array.fill[Byte](16)(7), 1),
      TestLog(0L, 0, "", "", Seq.empty, new Array[Byte](16), 0))
    val bytes = encode(logs, "svc-prop")
    val df = spark.createDataset(Seq(bytes))(Encoders.BINARY)
      .map(OtlpProtobuf.parseLogsRequestRow _)(
        Encoders.row(graft.schema.OtlpSchemas.logsRequestType))
    val flat = graft.transform.Otlp.logs(df).collect()
    assert(flat.length == 2)
    val r = flat(0)
    assert(r.getAs[String]("ServiceName") == "svc-prop")
    assert(r.getAs[String]("LogAttributes") == """{"a":"b","k":"v"}""") // sorted
    assert(r.getAs[String]("Body") == "\"hello\"")
    assert(r.getAs[java.sql.Timestamp]("Timestamp").getTime == 1700000000123L)
    // zero-filled trace id for the absent-context record
    assert(flat(1).getAs[Array[Byte]]("TraceId").forall(_ == 0))
  }
}
