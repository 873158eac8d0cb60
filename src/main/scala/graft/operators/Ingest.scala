package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingestion pipeline — the Spark re-expression of the reference's
  * exec_embed flow (/root/reference/download_dataset/exec_embed.py:
  * read JSONL → min-token filter (:66-69) → global row cap (:44-59,
  * 76-81) → embed via external service → fp16 cast / dim truncate
  * (utils.py:134-139) → 10K-row shards (utils.py:143-200)).
  *
  * The async gRPC embedder (download_dataset/utils.py:17-82) cannot
  * exist in a zero-egress environment; its architectural slot is
  * `mapPartitions` with a per-partition client. Here it is replaced by
  * a DETERMINISTIC synthetic embedder: per (text, dim) seeded xxhash64
  * mapped to [-1, 1) — same signature, stable across partitionings.
  *
  * The reference's ordered re-accumulation + sharding machinery
  * (utils.py:148-200) collapses into
  * `write.option("maxRecordsPerFile", n).partitionBy("category")`.
  */
object Ingest {

  val Dim = 64

  /** Deterministic synthetic embedding: hash text per dimension. */
  def syntheticEmbedding(text: Column, dim: Int = Dim): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(xxhash64(text, j), lit(2000001L)).cast("double") / 1000000.0
        - 1.0).cast("float"))

  /** Engine-portable hash pre-image of the portable embedder: per
    * dimension j, the first 15 hex chars of md5(text || ':' || j) as a
    * positive long, reduced mod 2000001 — identical integers in any
    * engine (no seeded-xxhash dependency), so a SQL oracle reproduces
    * the embedding exactly. Fused Md5PrefixLong (r20): same bits as
    * the conv/substring chain the oracle replays, one digest reuse
    * instead of dim per-row getInstance + hex/conv string trips. */
  def portableHashInts(text: Column, dim: Int = Dim): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => graft.GraftFunctions.md5Prefix(
        concat(text, lit(":"), j.cast("string")), 15) % 2000001L)

  /** Portable synthetic embedding: the md5 pre-image scaled to [-1, 1)
    * with the same arithmetic as `syntheticEmbedding`. */
  def syntheticEmbeddingPortable(text: Column, dim: Int = Dim): Column =
    transform(portableHashInts(text, dim),
      h => (h.cast("double") / 1000000.0 - 1.0).cast("float"))

  /** Min-token filter (P1): whitespace token count >= minTokens. */
  def minTokenFilter(docs: DataFrame, minTokens: Int,
      textCol: String = "text"): DataFrame =
    docs.filter(size(split(col(textCol), " ")) >= minTokens)

  /** Scalable global row number in `idCol` order, 1-based.
    *
    * `row_number().over(Window.orderBy(id))` funnels the whole table
    * through ONE task — the classic scale cliff. Instead: range-
    * partition by id (distributed sort), then zipWithIndex, which
    * computes per-partition counts in one pass and adds partition
    * offsets locally — O(n/P) per task, no single-partition stage. */
  def globalRowNumber(docs: DataFrame, idCol: String,
      outCol: String): DataFrame = {
    val spark = docs.sparkSession
    val sorted = docs.repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
    val schema = sorted.schema.add(outCol, "long", nullable = false)
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Global row cap with deterministic order (P3 — the exact semantics
    * of the reference's cross-category running limit:
    * `row_number over (order by id) <= n`). */
  def globalCap(docs: DataFrame, maxRows: Int,
      idCol: String = "doc_id"): DataFrame =
    globalRowNumber(docs, idCol, "_rn")
      .filter(col("_rn") <= maxRows)
      .drop("_rn")

  /** Shard assignment (W3/S5): cut every `shardSize` rows in id order.
    * The writer-side equivalent is option("maxRecordsPerFile"). */
  def shardIds(docs: DataFrame, shardSize: Int,
      idCol: String = "doc_id"): DataFrame =
    globalRowNumber(docs, idCol, "_rn")
      .withColumn("shard", floor((col("_rn") - 1) / shardSize).cast("long"))
      .drop("_rn")

  /** Full pipeline: filter → cap → embed → dim-truncate (P4). */
  def pipeline(docs: DataFrame, minTokens: Int, maxRows: Int,
      dim: Int = Dim, idCol: String = "doc_id",
      textCol: String = "text",
      embedder: (Column, Int) => Column = syntheticEmbedding): DataFrame =
    globalCap(minTokenFilter(docs, minTokens, textCol), maxRows, idCol)
      .withColumn("embedding",
        slice(embedder(col(textCol), Dim), 1, dim))
}
