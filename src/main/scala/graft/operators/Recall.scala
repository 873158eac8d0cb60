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
}
