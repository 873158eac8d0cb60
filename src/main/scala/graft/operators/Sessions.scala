package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the classic
  * behavioral-pipeline operator (the reference's events are one-shot
  * benchmark runs, but a training-data pipeline over interaction logs
  * needs session assembly before any per-session feature extraction).
  *
  * Semantics: events are ordered per user by (event time, event_id);
  * a new session starts when the gap to the previous event exceeds
  * `gapSec`. Session ids are per-user 1-based indexes, so they are
  * deterministic and independent of global ordering.
  *
  * Time is handled as INTEGER MICROSECONDS (`unix_micros`) end to end:
  * timestamps in the test corpus carry sub-second precision, and
  * integer math is the only representation a SQL oracle reproduces
  * bit-for-bit (no float epoch, no truncation ambiguity).
  *
  * Scale design (100 TB of events): ONE shuffle, by user; both the
  * lag and the running-count windows are evaluated inside the same
  * user partition with the same sort, so Catalyst plans a single
  * Exchange + one Sort for the whole chain. Per-user event counts
  * bound the window state (no global window, no single-task sort).
  * The summary is a map-side-combinable hash aggregate on
  * (user, session) keys.
  */
object Sessions {

  /** Label every event with its (user-scoped) session index.
    * Output: (user_id, event_id, ts_us, keepCols..., session_idx). */
  def sessionize(events: DataFrame, gapSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      keepCols: Seq[String] = Nil): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive: $gapSec")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(idCol))
    events
      .select((Seq(col(userCol), col(idCol),
        unix_micros(col(tsCol)).as("ts_us")) ++ keepCols.map(col)): _*)
      .withColumn("_prev", lag(col("ts_us"), 1).over(w))
      .withColumn("_brk",
        when(col("_prev").isNull ||
          col("ts_us") - col("_prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_brk")
  }

  /** Per-session rollup: event count, span, and value total (exact
    * DECIMAL accumulation — float sums are order-dependent and would
    * not reproduce across engines).
    * Output: (user_id, session_idx, n_events, start_us, end_us,
    * duration_sec, sum_value). */
  def sessionSummary(events: DataFrame, gapSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    sessionize(events, gapSec, userCol, tsCol, idCol, Seq(valueCol))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        round(sum(col(valueCol).cast("decimal(18,2)")), 2).cast("double")
          .as("sum_value"))
      // integer div, not `/` (double division — same 2^53 hazard as
      // the ns->us conversion in Tables.load)
      .withColumn("duration_sec", expr("(end_us - start_us) div 1000000"))
      .select(col(userCol), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"), col("duration_sec"),
        col("sum_value"))
  }
}
