package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ngram-jaccard stage triage at sf0.1. */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pscan] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
      explode(Dedup.shinglesOf(col("text"), 3)).as("sh")).cache()
    time("shingle explode+cache")(sh.count())
    println("[pscan] exploded rows: " + sh.count())
    // shingle frequency skew
    val freq = sh.groupBy("sh").count()
    time("freq")(freq.count())
    println("[pscan] top shingle freqs: " + freq.orderBy(col("count").desc)
      .limit(5).collect().map(_.getLong(1)).mkString(","))
    println("[pscan] sum freq^2 (join rows): " + freq
      .agg(sum(col("count") * col("count"))).head().get(0))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("common-shingle join + pair agg")(inter.count())
    time("full ngramJaccard")(
      Dedup.ngramJaccard(docs, 3, 0.4).count())
    time("full ngramJaccard again")(
      Dedup.ngramJaccard(docs, 3, 0.4).count())
    spark.stop()
  }
}
