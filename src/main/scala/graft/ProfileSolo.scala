package graft

import org.apache.spark.sql.SparkSession

/** Solo wall-clock for bench-excluded queries — the regression gate
  * for work too slow for the per-round pack (the full-batch
  * `corpus_classifier`, ~38 s at sf0.1, is excluded from Bench so the
  * pack total can't see it regress; this main records it per round in
  * BENCH_scale). Each named query runs COLD single-shot against the
  * given sf dir — the same convention as the pack — and prints one
  * parseable line per query.
  *
  * usage: runMain graft.ProfileSolo [sfDir] [query ...]
  * (default: /root/testdata/sf0.1 corpus_classifier)
  */
object ProfileSolo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else Seq("corpus_classifier")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[solo] $name: unknown query")
        case Some(q) =>
          val t0 = System.nanoTime()
          val rows = q(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""[solo] {"query":"$name","sec":$sec%.2f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
