package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the minhash-LSH pipeline (perf triage). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    time("warmup (plain count)")(docs.count())
    time("warmup (split count)")(
      docs.select(size(split(col("text"), " "))).agg(sum("size(split(text,  , -1))")).count())

    val withShDecl = docs.select(col("doc_id"),
      Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles declarative")(withShDecl.count())

    val withSh = docs.select(col("doc_id"),
      Dedup.shinglesOf(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    time("shingles native")(withSh.count())
    val sig = withSh.withColumn("sig",
      Dedup.minhashSignature(col("sh"), 128)).cache()
    time("signatures")(sig.count())
    val r = 2
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(63)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b)))
        .as(Seq("band", "band_hash"))).cache()
    time("banding")(banded.count())
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    val nCand = time("candidate join")(candidates.count())
    println(s"[profile] candidates: $nCand")
    val shSets = withSh.select(col("doc_id"), col("sh"))
    val verified = candidates
      .join(shSets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shSets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
    println("[profile] verified: " + time("verification")(verified.count()))
    spark.stop()
  }
}
