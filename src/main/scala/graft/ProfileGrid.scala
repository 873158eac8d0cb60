package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, GridSearch, NswGraph}

/** Stage-level triage for the shared grid sweep (the cost center behind
  * `grid_brackets`, which as the alphabetically-first grid query pays
  * the whole dual sweep): times truth / IVF sweep / NSW quantizer /
  * per-m graph builds / per-ef searches separately.
  * Usage: runMain graft.ProfileGrid [sfDir]
  */
object ProfileGrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pgrid] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[pgrid] --- pass $pass ---")
      val base = Tables.load(spark, dir, "embeddings")
      val totalBase = base.filter(col("vec_id") % 50 =!= 0).count()
      val truth = time("truthSets") {
        val t = GridSearch.truthSetsOf(SparkEntry.dataDf(spark, dir),
          SparkEntry.queriesDf(spark, dir), SparkEntry.filterLow).cache()
        t.count(); t
      }
      val ivf = time("ivf sweep (run)") {
        GridSearch.run(spark, SparkEntry.dataDf(spark, dir),
          SparkEntry.queriesDf(spark, dir), "low", SparkEntry.filterLow,
          totalBase, precomputedTruth = Some(truth)).count()
      }
      val filtered = SparkEntry.dataDf(spark, dir)
        .filter(SparkEntry.filterLow).cache()
      filtered.count()
      val q = SparkEntry.queriesDf(spark, dir).cache(); q.count()
      val centroids = time("nsw quantizer (train+index)") {
        AnnIvf.train(filtered, 8, iterations = 2)
      }
      val indexed = AnnIvf.index(filtered, centroids).cache()
      indexed.count()
      Seq(8, 16).foreach { m =>
        val g = time(s"graph build m=$m") {
          val g0 = NswGraph.buildIndex(indexed, m, efConstruction = 2 * m)
            .cache()
          g0.count(); g0
        }
        Seq(16, 48).foreach { ef =>
          time(s"graph search m=$m ef=$ef") {
            NswGraph.searchIndex(g, centroids, q, 10, 4, ef).count()
          }
        }
        g.unpersist()
      }
      indexed.unpersist(); filtered.unpersist(); q.unpersist()
      truth.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
