package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for OTLP attribute → canonical-JSON
  * serialization — the ingest hot path.
  *
  * These replace Scala UDFs because a UDF pays a full
  * catalyst→`GenericRowWithSchema` conversion of the nested attribute
  * structures per call (four calls per log record); operating directly on
  * `InternalRow`/`ArrayData`/`UTF8String` avoids that entirely. Value
  * semantics are identical to [[JsonCanon]] (sorted keys, last-wins
  * duplicates, serde_json escaping and double formatting) — [[JsonCanon]]
  * remains the row-level reference implementation, pinned by golden-parity
  * and property tests; CanonPropertySpec cross-checks the two.
  *
  * `CodegenFallback`: the expression evaluates interpreted inside
  * whole-stage-codegen'd stages. The win here is removing the converter, not
  * codegen of the recursive walk itself.
  */
object CatalystJson {

  /** Field layout of an anyValue struct, resolved once per expression. */
  final class AnyValueLayout(val t: StructType) {
    val iString: Int = t.fieldIndex("stringValue")
    val iBool: Int = t.fieldIndex("boolValue")
    val iInt: Int = t.fieldIndex("intValue")
    val iDouble: Int = t.fieldIndex("doubleValue")
    val iBytes: Int = t.fieldIndex("bytesValue")
    val hasNested: Boolean = t.fieldNames.contains("arrayValue")
    val iArray: Int = if (hasNested) t.fieldIndex("arrayValue") else -1
    val iKvlist: Int = if (hasNested) t.fieldIndex("kvlistValue") else -1
    val numFields: Int = t.length
    // nested element layouts (one level deeper)
    lazy val arrayElem: AnyValueLayout = new AnyValueLayout(
      t(iArray).dataType.asInstanceOf[StructType]("values").dataType
        .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])
    lazy val kvElem: KeyValueLayout = new KeyValueLayout(
      t(iKvlist).dataType.asInstanceOf[StructType]("values").dataType
        .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])
  }

  final class KeyValueLayout(val t: StructType) {
    val value = new AnyValueLayout(t("value").dataType.asInstanceOf[StructType])
    val numFields: Int = t.length
  }

  def anyValueInto(v: InternalRow, l: AnyValueLayout, sb: java.lang.StringBuilder): Unit = {
    if (v == null) { sb.append("null"); return }
    if (!v.isNullAt(l.iString)) {
      JsonCanon.escapeInto(v.getUTF8String(l.iString).toString, sb); return
    }
    if (!v.isNullAt(l.iBool)) { sb.append(v.getBoolean(l.iBool)); return }
    if (!v.isNullAt(l.iInt)) {
      sb.append(java.lang.Long.parseLong(v.getUTF8String(l.iInt).toString.trim)); return
    }
    if (!v.isNullAt(l.iDouble)) { sb.append(JsonCanon.fmtDouble(v.getDouble(l.iDouble))); return }
    if (!v.isNullAt(l.iBytes)) {
      JsonCanon.escapeInto(v.getUTF8String(l.iBytes).toString, sb); return
    }
    if (l.hasNested) {
      if (!v.isNullAt(l.iArray)) {
        val av = v.getStruct(l.iArray, 1)
        sb.append('[')
        if (!av.isNullAt(0)) {
          val vals = av.getArray(0)
          var i = 0
          while (i < vals.numElements()) {
            if (i > 0) sb.append(',')
            anyValueInto(
              if (vals.isNullAt(i)) null else vals.getStruct(i, l.arrayElem.numFields),
              l.arrayElem, sb)
            i += 1
          }
        }
        sb.append(']')
        return
      }
      if (!v.isNullAt(l.iKvlist)) {
        val kvl = v.getStruct(l.iKvlist, 1)
        kvArrayInto(if (kvl.isNullAt(0)) null else kvl.getArray(0), l.kvElem,
          Set.empty, sb)
        return
      }
    }
    sb.append("null")
  }

  /** KeyValue array → sorted-key JSON object (last duplicate wins), with
    * optional key exclusion — mirrors JsonCanon.kvListInto/attrsToJsonExcluding. */
  def kvArrayInto(arr: ArrayData, l: KeyValueLayout, exclude: Set[String],
      sb: java.lang.StringBuilder): Unit = {
    if (arr == null || arr.numElements() == 0) { sb.append("{}"); return }
    val m = new java.util.LinkedHashMap[String, InternalRow]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val kv = arr.getStruct(i, l.numFields)
        val k = if (kv.isNullAt(0)) "" else kv.getUTF8String(0).toString
        if (exclude.isEmpty || !exclude.contains(k))
          m.put(k, if (kv.isNullAt(1)) null else kv.getStruct(1, l.value.numFields))
      }
      i += 1
    }
    if (m.isEmpty) { sb.append("{}"); return }
    val keys = m.keySet().toArray(new Array[String](0))
    scala.util.Sorting.stableSort(keys, JsonCanon.cpLessThan _)
    sb.append('{')
    var first = true
    keys.foreach { k =>
      if (!first) sb.append(','); first = false
      JsonCanon.escapeInto(k, sb)
      sb.append(':')
      anyValueInto(m.get(k), l.value, sb)
    }
    sb.append('}')
  }
}

/** `array<KeyValue>` → canonical JSON object string ("{}" for null/empty),
  * optionally excluding keys (service.* extraction). */
case class AttrsToJsonExpr(child: Expression, exclude: Set[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  @transient private lazy val layout = new CatalystJson.KeyValueLayout(
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val sb = new java.lang.StringBuilder(64)
    CatalystJson.kvArrayInto(v.asInstanceOf[ArrayData], layout, exclude, sb)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): AttrsToJsonExpr =
    copy(child = newChild)
}

/** anyValue struct → JSON-encoded value (string bodies keep their quotes);
  * null in → null out (absent Body stays null). */
case class AnyValueToJsonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  @transient private lazy val layout =
    new CatalystJson.AnyValueLayout(child.dataType.asInstanceOf[StructType])
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sb = new java.lang.StringBuilder(32)
    CatalystJson.anyValueInto(v.asInstanceOf[InternalRow], layout, sb)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): AnyValueToJsonExpr =
    copy(child = newChild)
}

/** `array<struct{…, attributes, …}>` → one JSON object string per element
  * (span events / links). */
case class NestedAttrsToJsonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  @transient private lazy val (attrIdx, elemFields, kvLayout) = {
    val elem = child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val idx = elem.fieldIndex("attributes")
    val kv = new CatalystJson.KeyValueLayout(
      elem(idx).dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType])
    (idx, elem.length, kv)
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      val sb = new java.lang.StringBuilder(32)
      if (arr.isNullAt(i)) sb.append("{}")
      else {
        val row = arr.getStruct(i, elemFields)
        CatalystJson.kvArrayInto(
          if (row.isNullAt(attrIdx)) null else row.getArray(attrIdx),
          kvLayout, Set.empty, sb)
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): NestedAttrsToJsonExpr =
    copy(child = newChild)
}
