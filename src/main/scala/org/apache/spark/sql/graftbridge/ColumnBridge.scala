package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so this
  * library can register custom Catalyst expressions from the public Column
  * API (the conventional extension point for Spark-native libraries; no
  * Spark internals are modified). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst → external row converter for a struct schema (the
    * deserializer half of what `Encoders.row` builds) — lets decoders that
    * produce `InternalRow` natively (the Tungsten fast path) still offer a
    * plain-`Row` API to callers that introspect values driver-side. */
  def toScalaRow(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.catalyst.InternalRow => org.apache.spark.sql.Row =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow => org.apache.spark.sql.Row]

  /** Register an Expression-backed SQL function on a live session (the
    * builder-time route is `spark.sql.extensions` + `injectFunction`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
