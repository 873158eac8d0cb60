package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Stage timing of the annShared build (round-3 perf triage). */
object ProfileR3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import SparkEntry._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val data = dataDf(spark, dir).filter(filterLow)
    time("warmup count")(data.count())
    val centroids = time("ivf train (16c, 2 it)")(
      AnnIvf.train(data, numCentroids = 16, iterations = 2))
    val truth = time("exact truth")(
      { val t = Knn.exact(data, queriesDf(spark, dir), K).cache(); t.count(); t })
    val cb = time("pq train (m=8, ksub=16)")(
      Pq.train(data, m = 8, ksub = 16, iterations = 2))
    val found = time("ivf search")(
      AnnIvf.search(AnnIvf.index(data, centroids), centroids,
        queriesDf(spark, dir), K, nprobe = 4))
    time("ivf recall")(Recall.ofRanked(found, truth).count())
    time("2nd ivf train")(AnnIvf.train(data, numCentroids = 16, iterations = 2))
    spark.stop()
  }
}
