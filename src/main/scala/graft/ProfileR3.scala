package graft

import org.apache.spark.sql.SparkSession

/** One-off query driver for round-3 triage: runs named SparkEntry
  * queries and shows their output. */
object ProfileR3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      df.show(5, truncate = 40)
      println(f"[profile] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
