package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan of the
  * named queries (or a default set) at the given sf dir. Used to audit
  * pushdown (PushedFilters), column pruning (ReadSchema), broadcast
  * choices, and whole-stage-codegen coverage.
  *
  * usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      // corpus_dsir / pipeline_curate are NOT in the default set:
      // their construction runs training jobs (model collect,
      // localCheckpoint, prefix-sum) and the final plan reads an
      // ExistingRDD — nothing for this tool to audit
      // corpus_classifier joins corpus_dsir in the excluded set:
      // training runs eagerly at construction, the final plan reads
      // collected results
      else Seq("q02_filter_pushdown", "q03_join_revenue", "knn_exact_low",
        "knn_plan_node", "dedup_minhash_lsh", "ann_ivf_topk",
        "text_span_dedup", "text_perplexity", "dedup_semantic",
        "text_bm25", "pipeline_hybrid", "text_cms")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
