package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall evaluation — SURVEY §2.3 J5 / §2.4 A1.
  *
  * Reference: /root/reference/utils_grid_search.py:64-88 — per-query
  * `np.intersect1d(found, gt)` summed, divided by n_queries*k. Here the
  * per-batch alignment becomes an explicit equi join on qid and the
  * intersection is `array_intersect` (scalar, codegen'd).
  */
object Recall {

  /** Both inputs in ranked-row form (qid, rank, neighbor_id). Returns
    * one row: (n_queries, recall). */
  def ofRanked(found: DataFrame, truth: DataFrame): DataFrame = {
    val f = found.groupBy("qid")
      .agg(collect_list("neighbor_id").as("found_ids"))
    val t = truth.groupBy("qid")
      .agg(collect_list("neighbor_id").as("gt_ids"), count("*").as("k"))
    perQuery(f.join(t, "qid"))
  }

  /** Input: (qid, found_ids array, gt_ids array, k). */
  private def perQuery(joined: DataFrame): DataFrame =
    joined
      .select(col("qid"),
        size(array_intersect(col("found_ids"), col("gt_ids")))
          .cast("double").as("hits"),
        col("k").cast("double"))
      .agg(
        count("*").as("n_queries"),
        round(sum(col("hits")) / sum(col("k")), 6).as("recall"))

  /** RANKING-QUALITY metrics beyond plain recall (the reference
    * evaluates recall only, utils_grid_search.py:64-88; a retrieval
    * stack also reports rank-sensitive quality): per ranked-row
    * inputs (qid, rank, neighbor_id), returns one row —
    * (n_queries, recall, mrr, ndcg), averaged over queries, where per
    * query
    *   recall = |found ∩ truth| / k,
    *   MRR    = 1 / (first rank whose id is in truth)   (0 if none),
    *   NDCG@k = Σ_{hits} 1/log2(rank+1)  /  Σ_{i=1..k} 1/log2(i+1)
    * (binary relevance; the ideal DCG assumes a full truth set, which
    * holds for k-NN ground truth).
    *
    * Scale shape: one equi-join of the two ranked tables on
    * (qid, neighbor_id) marks the hits; per-query aggregation is a
    * map-side-combined hash agg; the final average is one row. */
  def rankMetrics(found: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val hitsMarked = found
      .join(truth.select(col("qid"), col("neighbor_id"), lit(1).as("_hit")),
        Seq("qid", "neighbor_id"), "left")
      .select(col("qid"), col("rank"),
        coalesce(col("_hit"), lit(0)).as("hit"))
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    val perQ = hitsMarked
      .groupBy(col("qid"))
      .agg(
        (sum(col("hit")) / k.toDouble).as("q_recall"),
        coalesce(lit(1.0) / min(when(col("hit") === 1, col("rank"))),
          lit(0.0)).as("q_mrr"),
        (sum(when(col("hit") === 1,
          lit(1.0) / (log(col("rank") + 1.0) / lit(math.log(2.0))))
          .otherwise(0.0)) / idcg).as("q_ndcg"))
    // average over TRUTH's query set, not found's: a query the search
    // returned nothing for must score 0, not silently shrink the
    // denominator (answering 1 of 100 queries perfectly is not
    // recall = 1.0)
    truth.select(col("qid")).distinct()
      .join(perQ, Seq("qid"), "left")
      .agg(
        count(lit(1)).as("n_queries"),
        round(avg(coalesce(col("q_recall"), lit(0.0))), 6).as("recall"),
        round(avg(coalesce(col("q_mrr"), lit(0.0))), 6).as("mrr"),
        round(avg(coalesce(col("q_ndcg"), lit(0.0))), 6).as("ndcg"))
  }
}
