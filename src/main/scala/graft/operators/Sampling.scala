package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import Tables._

/** Dataset-assembly operators for training pipelines over `documents`:
  * deterministic held-out splits and token-budget sequence packing.
  *
  * Scale design (100 TB):
  *   - [[sampleSplit]] is a pure map — the split of a document is a function
  *     of its id alone (salted MD5 bucket), so assignment is stable under
  *     re-runs, repartitioning, and incremental data arrival; no shuffle, no
  *     global state. This is the production-safe way to carve train/val/test.
  *   - [[packSequences]] packs within hash shards: a global pack order would
  *     serialize the whole corpus through one window partition, so documents
  *     are sharded by salted hash (shard count scales with the cluster) and
  *     the cumulative-token window runs per shard in parallel. Chunk identity
  *     is (shard, chunk_id).
  */
object Sampling {

  private val hashUdf = udf { (salt: String, id: Long) =>
    PortableHash.md5Lower63(salt + id.toString)
  }

  /** Deterministic train/val/test assignment: bucket = salted-MD5(doc_id)
    * mod 1000; < 900 train, < 950 val, else test (90/5/5). */
  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        (hashUdf(lit("split:"), col("doc_id")) % 1000).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** Token-budget sequence packing (stream-window form): documents in doc_id
    * order within a hash shard are assigned to the chunk in which their first
    * token falls — chunk_id = floor(cumulative_tokens_before / budget).
    * Documents are never split; a document straddling a boundary belongs to
    * the chunk where it starts. Token count is the BPE-ish regex
    * segmentation shared with [[TextAnalysis.tokens]]. */
  def packSequences(spark: SparkSession, sfDir: String,
      budget: Long = 2048L, nShards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, sfDir)
      .select(col("doc_id"),
        (hashUdf(lit("shard:"), col("doc_id")) % nShards).as("shard"),
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("chunk_id"))
      .orderBy(col("doc_id"))
  }

  // ---- DuckDB oracle SQL ---------------------------------------------------

  /** DuckDB twin of [[sampleSplit]]. */
  def sampleSplitOracleSql: String =
    s"""SELECT doc_id, lang,
       |  CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 AS bucket,
       |  CASE WHEN CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 < 900 THEN 'train'
       |       WHEN CAST(md5_number_lower('split:' || doc_id) & 9223372036854775807 AS BIGINT) % 1000 < 950 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[packSequences]]. */
  def packSequencesOracleSql(budget: Long = 2048L, nShards: Int = 32): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(md5_number_lower('shard:' || doc_id) & 9223372036854775807 AS BIGINT) % $nShards AS shard,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens, (cum - n_tokens) // $budget AS chunk_id
       |FROM c ORDER BY doc_id""".stripMargin
}
