package graft.transform

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.functions.{JsonCanon, OtlpCodecs}

/** UDF surface used by the OTLP flatten transforms.
  *
  * These are the only non-codegen expressions in the pipeline — each one
  * exists because the semantics are not expressible with built-ins:
  * sorted-key JSON canonicalization (to_json does not sort keys) and
  * base64-or-hex id decoding with hard failure. Everything else in the
  * transforms is built-in Column expressions. The nested-array variants
  * exist because Spark forbids UDF calls inside higher-order-function
  * lambdas.
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

  val idBytes16: UserDefinedFunction = udf((s: String) => OtlpCodecs.decodeId(s, 16))
  val idBytes8: UserDefinedFunction = udf((s: String) => OtlpCodecs.decodeId(s, 8))

  val idHex16: UserDefinedFunction =
    udf((s: String) => OtlpCodecs.toHex(OtlpCodecs.decodeId(s, 16)))
  val idHex8: UserDefinedFunction =
    udf((s: String) => OtlpCodecs.toHex(OtlpCodecs.decodeId(s, 8)))

  /** null for absent ids (ParentSpanId of root spans stays null). */
  val idHex8OrNull: UserDefinedFunction = udf { (s: String) =>
    if (s == null || s.isEmpty) null
    else OtlpCodecs.toHex(OtlpCodecs.decodeId(s, 8))
  }

  /** Link id arrays (UDF because HOF lambdas cannot call UDFs). */
  def linkIdsHex(nbytes: Int): UserDefinedFunction = udf { (rows: Seq[Row]) =>
    if (rows == null) Seq.empty[String]
    else {
      val field = if (nbytes == 16) "traceId" else "spanId"
      rows.map { r =>
        val i = r.fieldIndex(field)
        OtlpCodecs.toHex(
          OtlpCodecs.decodeId(if (r.isNullAt(i)) null else r.getString(i), nbytes))
      }
    }
  }

  /** First value of `key` in an OTLP attributes array, as a string column
    * (null when absent — try_element_at tolerates ANSI mode). */
  def attrValue(attrs: Column, key: String): Column =
    try_element_at(filter(attrs, kv => kv("key") === key), lit(1))("value")("stringValue")
}
