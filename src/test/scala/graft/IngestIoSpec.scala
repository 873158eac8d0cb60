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

  test("glob scan derives category from file path (S2)") {
    // reference: per-category JSONL files under raw/review_categories/,
    // category = filename (download_dataset/download_amazon_dataset
    // .py:10-19, exec_embed.py:28-34)
    val tmp = Files.createTempDirectory("graft_glob").toString
    Files.createDirectories(Paths.get(s"$tmp/raw/review_categories"))
    Seq("Books", "Baby", "Kindle").foreach { cat =>
      val lines = (0 until 20).map(i =>
        s"""{"text": "doc $i of $cat", "rating": ${(i % 6).toDouble}}""")
      Files.write(Paths.get(s"$tmp/raw/review_categories/$cat.jsonl"),
        lines.mkString("\n").getBytes)
    }
    val df = spark.read
      .schema(StructType(Seq(StructField("text", StringType),
        StructField("rating", DoubleType))))
      .json(s"$tmp/raw/review_categories/*.jsonl")
      .withColumn("category",
        regexp_extract(input_file_name(), "([^/]+)\\.jsonl$", 1))
    assert(df.count() == 60)
    val cats = df.groupBy($"category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats == Map("Books" -> 20L, "Baby" -> 20L, "Kindle" -> 20L))
    // P2 on top of S2: category membership filter
    assert(df.filter($"category".isin("Books", "Baby")).count() == 40)
  }

  test("fbin typed-binary sink -> sharded read-back (S4)") {
    val tmp = Files.createTempDirectory("graft_fbin").toString
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val n = vecs.count()
    graft.sources.FbinIO.write(vecs, s"$tmp/fbin", dim = 64, numShards = 4)
    val shardFiles = new java.io.File(s"$tmp/fbin")
      .listFiles((_, name) => name.endsWith(".fbin"))
    assert(shardFiles.length == 4)
    // header sanity: rows*dim*4 + 8 == file size
    shardFiles.foreach { f =>
      val hdr = java.nio.ByteBuffer.wrap(
          Files.readAllBytes(f.toPath).take(8))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(f.length == 8L + hdr.getInt(0).toLong * hdr.getInt(4) * 4)
    }
    val back = graft.sources.FbinIO.read(spark, s"$tmp/fbin")
    assert(back.count() == n)
    // ids are consecutive positions in global vec_id order, so row i of
    // the re-read matrix is the i-th smallest original vec_id
    val orig = vecs.orderBy($"vec_id").collect()
      .map(r => r.getSeq[Float](1).toArray)
    val rt = back.orderBy($"vec_id").collect()
      .map(r => r.getSeq[Float](1).toArray)
    assert(orig.length == rt.length)
    orig.zip(rt).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("multi-dtype typed-binary round trips (.hbin/.ibin/.u8bin/.i8bin)") {
    import org.apache.spark.sql.functions._
    import graft.sources.FbinIO
    val tmp = Files.createTempDirectory("graft_dtypes").toString
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    val n = vecs.count()
    // .hbin through the fp16 codec: snap to the 2^-7 grid (binary16-
    // exact) -> round trip must be lossless float equality
    val gridded = vecs.select($"vec_id",
      transform($"embedding", v =>
        (floor(v.cast("double") * 128.0 + 0.5) / 128.0).cast("float"))
        .as("embedding"))
    FbinIO.write(gridded, s"$tmp/h", dim = 64, numShards = 3,
      dtype = FbinIO.F16)
    val hBack = FbinIO.read(spark, s"$tmp/h").orderBy($"vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    val hOrig = gridded.orderBy($"vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    assert(hBack.length == n)
    hOrig.zip(hBack).foreach { case (x, y) => assert(x.sameElements(y)) }
    // integral dtypes: values at the dtype boundaries survive exactly
    val ints = spark.range(7).toDF("vec_id")
      .select($"vec_id", transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64($"vec_id", j), lit(256)) - 128).cast("int"))
        .as("embedding"))
    for ((dt, dir2, fix) <- Seq(
        (FbinIO.I8: FbinIO.Dtype, "i8", identity[Int] _),
        (FbinIO.I32: FbinIO.Dtype, "i32", identity[Int] _),
        (FbinIO.U8: FbinIO.Dtype, "u8", (x: Int) => x & 0xff))) {
      FbinIO.write(ints, s"$tmp/$dir2", dim = 64, numShards = 2, dtype = dt)
      val back = FbinIO.read(spark, s"$tmp/$dir2").orderBy($"vec_id")
        .collect().map(_.getSeq[Int](1).toArray)
      val orig = ints.orderBy($"vec_id").collect()
        .map(_.getSeq[Int](1).toArray.map(fix))
      assert(back.length == 7, dir2)
      orig.zip(back).foreach { case (x, y) =>
        assert(x.sameElements(y), s"$dir2: ${x.take(4).toSeq} vs ${y.take(4).toSeq}")
      }
    }
    // Hadoop FileSystem path handling: an explicit file:// URI reads
    // the same shards (no java.io assumption anywhere in the IO path)
    val viaUri = FbinIO.read(spark, s"file://$tmp/h")
    assert(viaUri.count() == n)
  }
}
