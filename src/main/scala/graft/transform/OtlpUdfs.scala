package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.IdDecodeExpr

/** Column helpers used by the OTLP flatten transforms.
  *
  * Everything here is codegen-native: sorted-key JSON canonicalization
  * (to_json does not sort keys) and base64-or-hex id decoding with hard
  * failure run as custom Catalyst expressions; the rest is built-in
  * Column composition. As of round 10 the flatten path plans ZERO
  * ScalaUDF nodes — ingest is the headline throughput number and this
  * was its last interpreted stretch.
  */
object OtlpUdfs {

  /** service.* keys extracted (and removed) for logs/traces — SURVEY §1.3(2). */
  val ServiceKeys: Set[String] =
    Set("service.name", "service.namespace", "service.instance.id")

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
  import graft.functions.{AnyValueToJsonExpr, AttrsToJsonExpr, NestedAttrsToJsonExpr}

  // JSON canonicalization runs as native Catalyst expressions (see
  // AttrsJsonExpressions): the UDF route paid a catalyst→Row conversion of
  // the nested attribute structs per call — the dominant flatten cost.
  def attrsJson(c: Column): Column = toCol(AttrsToJsonExpr(toExpr(c), Set.empty))

  def attrsJsonNoService(c: Column): Column =
    toCol(AttrsToJsonExpr(toExpr(c), ServiceKeys))

  def anyValueJson(c: Column): Column = toCol(AnyValueToJsonExpr(toExpr(c)))

  /** For arrays of structs that carry an `attributes` field (span events /
    * links): one JSON object string per element. */
  def nestedAttrsJson(c: Column): Column = toCol(NestedAttrsToJsonExpr(toExpr(c)))

  // Id decode runs as a native Catalyst expression (IdDecodeExpr): the
  // UDF route paid a ScalaUDF eval fence per id per row, and — because
  // Spark forbids UDF calls inside higher-order-function lambdas — forced
  // the link-id arrays through a whole-row Seq[Row] UDF. The native
  // expression has neither restriction; absent ids decode to the zero id
  // (never NULL), matching the reference's contract.
  def idBytes16(c: Column): Column = toCol(IdDecodeExpr(toExpr(c), 16, "bytes"))
  def idBytes8(c: Column): Column = toCol(IdDecodeExpr(toExpr(c), 8, "bytes"))

  def idHex16(c: Column): Column = toCol(IdDecodeExpr(toExpr(c), 16, "hex"))
  def idHex8(c: Column): Column = toCol(IdDecodeExpr(toExpr(c), 8, "hex"))

  /** null for absent ids (ParentSpanId of root spans stays null). */
  def idHex8OrNull(c: Column): Column =
    toCol(IdDecodeExpr(toExpr(c), 8, "hex_or_null"))

  /** Link id arrays: the scalar hex kernel mapped over the link structs
    * inside the generated `transform` loop. */
  def linkIdsHex(links: Column, nbytes: Int): Column = {
    val field = if (nbytes == 16) "traceId" else "spanId"
    transform(links, l => toCol(IdDecodeExpr(toExpr(l(field)), nbytes, "hex")))
  }

  /** First value of `key` in an OTLP attributes array, as a string column
    * (null when absent — try_element_at tolerates ANSI mode). */
  def attrValue(attrs: Column, key: String): Column =
    try_element_at(filter(attrs, kv => kv("key") === key), lit(1))("value")("stringValue")
}
