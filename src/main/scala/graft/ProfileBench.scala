package graft

import org.apache.spark.sql.SparkSession

/** Per-query cold/warm timing triage: runs each named SparkEntry query
  * twice in one session so JIT/codegen warmup is separated from steady
  * state. Usage: runMain graft.ProfileBench [sfDir] [q1 q2 ...]
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries.filter { case (n, _) =>
      wanted.isEmpty || wanted.contains(n)
    }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[pbench] $name%-24s cold=$cold%7.2fs warm=$warm%7.2fs")
    }
    spark.stop()
  }
}
