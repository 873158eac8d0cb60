package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-query JIT triage: each iteration builds a FRESH query shape
  * (distinct literal → distinct codegen class) so every run pays the
  * cold-path cost the driver's bench pays. */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pscan] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val li = Tables.load(spark, dir, "lineitem").cache()
    time("cache populate")(li.count())
    for (i <- 1 to 3)
      time(s"q01 fresh-shape iter$i")(
        li.filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp") &&
            col("l_quantity") >= lit(-1000.0 - i))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).as("a"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("b"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,4)")).as("c"),
            count(lit(1))).collect())
    spark.stop()
  }
}
