package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Round-3 perf triage: cache behavior of the rewritten portable
  * simhash plan. */
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
    val sigs = Dedup.simhashPortable(docs).cache()
    time("sigs cached materialize (new plan)")(sigs.count())
    time("sigs cached re-read")(sigs.count())
    sigs.unpersist()
    time("pairs (uncached sigs, 2x recompute)")(
      Dedup.simhashPairsPortable(docs, maxHamming = 3).count())
    spark.stop()
  }
}
