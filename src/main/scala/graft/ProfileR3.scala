package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the round-2 bench hot spots:
  * dedup_simhash_pairs (portable path) and dedup_ngram_jaccard. */
object ProfileR3 {
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

    time("warmup count")(docs.count())
    time("simhash portable")(Dedup.simhashPortable(docs).count())
    time("simhash_pairs portable")(
      Dedup.simhashPairsPortable(docs, maxHamming = 3).count())
    time("simhash native")(Dedup.simhashSignatures(docs).count())
    time("simhash_pairs native")(
      Dedup.simhashPairs(docs, maxHamming = 3).count())
    time("jaccard auto")(
      Dedup.ngramJaccardAuto(docs, n = 3, threshold = 0.4).count())
    spark.stop()
  }
}
