package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ingest

/** End-to-end ingestion IO: JSONL source (S1) → pipeline → sharded
  * partitioned parquet sink (S5) → read-back. Mirrors the reference's
  * exec_embed flow (JSONL review files in, 10K-row aligned shards
  * out, download_dataset/utils.py:143-200). */
class IngestIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val reviewSchema = StructType(Seq(
    StructField("text", StringType),
    StructField("rating", DoubleType),
    StructField("category", StringType)))

  test("jsonl -> filter -> embed -> partitioned sharded parquet -> read back") {
    val tmp = Files.createTempDirectory("graft_ingest").toString
    // S1 fixture: one JSON object per line (FIXTURES.md F7)
    val jsonl = (0 until 300).map { i =>
      val toks = (0 to (i % 40) + 5).map(j => s"w${(i + j) % 17}").mkString(" ")
      val cat = Seq("Books", "Baby", "Kindle")(i % 3)
      s"""{"text": "$toks", "rating": ${(i % 6).toDouble}, "category": "$cat"}"""
    }
    Files.write(Paths.get(s"$tmp/reviews.jsonl"), jsonl.mkString("\n").getBytes)

    val raw = spark.read.schema(reviewSchema).json(s"$tmp/reviews.jsonl")
      .withColumn("doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("text")).cast("long"))
    assert(raw.count() == 300)

    val embedded = Ingest.pipeline(raw, minTokens = 20, maxRows = 1000)
    val kept = embedded.count()
    assert(kept > 0 && kept < 300) // min-token filter dropped short rows

    // S5: per-category dirs + bounded shard files
    embedded
      .select($"doc_id", $"category", $"rating", $"text", $"embedding")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 50)
      .partitionBy("category")
      .parquet(s"$tmp/shards")

    val back = spark.read.parquet(s"$tmp/shards")
    assert(back.count() == kept)
    assert(back.select($"category").distinct().count() == 3)
    // every parquet file respects the shard cap
    val files = Files.walk(Paths.get(s"$tmp/shards")).iterator()
    var parquetFiles = 0
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) {
        parquetFiles += 1
        val n = spark.read.parquet(p.toString).count()
        assert(n <= 50, s"shard $p has $n rows")
      }
    }
    assert(parquetFiles >= 3)
    // embeddings survive the round trip intact
    val a = embedded.select($"doc_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = back.select($"doc_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }
}
