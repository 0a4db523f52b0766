package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AnyValueToJsonExpr, AttrsToJsonExpr, CdcChunksExpr, KmvBottomKAgg, KmvBottomKSetAgg, MinhashSigExpr, QsketchBottomKAgg, QsketchBottomKPairsAgg, ShingleHashExpr, VectorDotExpr}

/** The library's Catalyst extension point: registers the custom expressions
  * as SQL functions so `spark.sql` users get them too —
  *
  *   - `vector_dot(a, b)`   — codegen'd array<double> dot product
  *     ([[graft.functions.VectorDotExpr]])
  *   - `attrs_json(kvs)`    — OTLP KeyValue[] → canonical sorted-key JSON
  *     ([[graft.functions.AttrsToJsonExpr]])
  *   - `any_value_json(v)`  — OTLP AnyValue → JSON-encoded string
  *
  * Install either at session build time
  * (`--conf spark.sql.extensions=graft.GraftExtensions`, the deployment
  * route) or on a live session via [[GraftExtensions.register]] (the
  * notebook/test route).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triple per exposed function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two array<double>"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot takes 2 arguments")
        VectorDotExpr(children(0), children(1))
      }),
    (FunctionIdentifier("attrs_json"),
      info("attrs_json", "attrs_json(kvs) - canonical sorted-key JSON of OTLP attributes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "attrs_json takes 1 argument")
        AttrsToJsonExpr(children.head, Set.empty)
      }),
    (FunctionIdentifier("any_value_json"),
      info("any_value_json", "any_value_json(v) - JSON-encoded OTLP AnyValue"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "any_value_json takes 1 argument")
        AnyValueToJsonExpr(children.head)
      }),
    (FunctionIdentifier("kmv_bottomk"),
      info("kmv_bottomk",
        "kmv_bottomk(hash, k) - bottom-k (KMV) distinct sketch: struct(kth_hash, k_n)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "kmv_bottomk takes 2 arguments")
        val kExpr = children(1)
        require(kExpr.foldable, "kmv_bottomk: k must be a literal")
        val k = kExpr.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"kmv_bottomk: k must be an integer literal, got $other")
        }
        // return the bare AggregateFunction — the analyzer wraps it in an
        // AggregateExpression, as with Spark's own registered aggregates
        KmvBottomKAgg(children.head, k)
      }),
    (FunctionIdentifier("kmv_bottomk_set"),
      info("kmv_bottomk_set",
        "kmv_bottomk_set(hash, k) - bottom-k (KMV) sketch as a sorted array<bigint>, for sketch set algebra"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "kmv_bottomk_set takes 2 arguments")
        val kExpr = children(1)
        require(kExpr.foldable, "kmv_bottomk_set: k must be a literal")
        val k = kExpr.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"kmv_bottomk_set: k must be an integer literal, got $other")
        }
        KmvBottomKSetAgg(children.head, k)
      }),
    (FunctionIdentifier("qsketch_bottomk"),
      info("qsketch_bottomk",
        "qsketch_bottomk(hash, value, k) - deterministic bottom-k-by-hash quantile sample: value-sorted array<double>"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "qsketch_bottomk takes 3 arguments")
        val kExpr = children(2)
        require(kExpr.foldable, "qsketch_bottomk: k must be a literal")
        val k = kExpr.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"qsketch_bottomk: k must be an integer literal, got $other")
        }
        QsketchBottomKAgg(children(0), children(1), k)
      }),
    (FunctionIdentifier("qsketch_bottomk_pairs"),
      info("qsketch_bottomk_pairs",
        "qsketch_bottomk_pairs(hash, value, k) - mergeable (hash, value) pair-form quantile sketch: hash-sorted array<struct<h,v>>"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "qsketch_bottomk_pairs takes 3 arguments")
        val kExpr = children(2)
        require(kExpr.foldable, "qsketch_bottomk_pairs: k must be a literal")
        val k = kExpr.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"qsketch_bottomk_pairs: k must be an integer literal, got $other")
        }
        QsketchBottomKPairsAgg(children(0), children(1), k)
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(hashes) - 64-permutation MinHash signature of array<bigint> shingle hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "minhash_sig takes 1 argument")
        MinhashSigExpr(children.head)
      }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text) - distinct 3-gram shingle MD5-63 hashes of a string, first-occurrence order"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "shingle_hashes takes 1 argument")
        ShingleHashExpr(children.head)
      }),
    (FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks",
        "cdc_chunks(tokens, window, modulus) - content-defined chunk boundaries: array<struct<start,len,chunk_hash>>"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "cdc_chunks takes 3 arguments")
        def lit(e: Expression, name: String): Long = {
          require(e.foldable, s"cdc_chunks: $name must be a literal")
          e.eval() match {
            case i: Int => i.toLong
            case l: Long => l
            case other => throw new IllegalArgumentException(
              s"cdc_chunks: $name must be an integer literal, got $other")
          }
        }
        CdcChunksExpr(children.head, lit(children(1), "window").toInt,
          lit(children(2), "modulus"))
      })
  )

  /** Register the functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, ident, inf, builder)
    }
}
