package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark-analytics operators over a results table — the engine's
  * re-expression of the reference's plotting/summary layer:
  * Pareto frontier (/root/reference/create_plots.ipynb cell 0
  * `pareto_frontier`), recall brackets (plot_bench.py:41-48), and
  * best-config argmax summaries (all_runs_summary-2.csv columns).
  */
object Analytics {

  /** W2: per-partition Pareto frontier. Rows sorted by ascending cost;
    * a row survives iff its gain strictly exceeds every cheaper row's
    * gain (running-max frame over the preceding rows). */
  def paretoFrontier(df: DataFrame, partCols: Seq[String],
      costCol: String, gainCol: String,
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    val order = (costCol +: tieCols).map(col)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_prev_max", max(col(gainCol)).over(w))
      .filter(col("_prev_max").isNull || col(gainCol) > col("_prev_max"))
      .drop("_prev_max")
  }

  /** A6: bucket a metric into labeled brackets (reference brackets
    * [80,90) [90,95) [95,99) [99,∞), plot_bench.py:44). */
  def recallBracket(recall: Column): Column =
    when(recall < 0.80, "lt80")
      .when(recall < 0.90, "80_90")
      .when(recall < 0.95, "90_95")
      .when(recall < 0.99, "95_99")
      .otherwise("ge99")

  def bracketSummary(results: DataFrame, groupCol: String,
      recallCol: String = "recall",
      knobCol: String = "nprobe"): DataFrame =
    results
      .withColumn("bracket", recallBracket(col(recallCol)))
      .groupBy(col("bracket"), col(groupCol))
      .agg(count(lit(1)).as("n_configs"),
        round(avg(col(knobCol)), 6).as("avg_knob"))

  /** A7: per-group best row by a metric, deterministic tie-break via
    * the full ordering struct (reference `best_recall`/`best_qps`
    * summary columns). */
  def bestBy(results: DataFrame, groupCols: Seq[String],
      metric: String, tieCols: Seq[String]): DataFrame = {
    val ord = struct((metric +: tieCols).map(col): _*)
    results.groupBy(groupCols.map(col): _*)
      .agg(max(col(metric)).as(s"best_$metric"),
        max_by(struct(results.columns.map(col): _*), ord).as("best_row"))
  }
}
