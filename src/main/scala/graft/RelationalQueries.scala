package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Sessions}

/** Relational operator pack over the TPC-H-ish testdata — exercises the
  * SURVEY §2 inventory that is expressible on these tables: predicate
  * pushdown (P1-P6), equi/semi/anti/broadcast joins (J5/J6), hash aggs
  * with partial aggregation (A1-A7), rank and frame-spec windows
  * (W1/W2), top-N (O4), unions (E2), percentile (A5), argmax (A7),
  * bucketing (A6), JSON extraction (F6).
  *
  * Float-determinism: money sums are accumulated as DECIMAL(18,2/4) so
  * the result is independent of partial-aggregation order (Spark) vs
  * single-pass order (DuckDB); final outputs cast to DOUBLE. Every
  * ranking has a total-order tie-break.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String)(name: String): DataFrame =
    Tables.load(spark, dir, name)

  private val dec2 = "decimal(18,2)"
  private val dec4 = "decimal(18,4)"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A: pricing summary — hash agg with partial/final (TPC-H Q1 shape)
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d)("lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec2)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec2)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec4))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec2)) / count(lit(1))).cast("double").as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // P: filter + projection pushed into the parquet scan
    "q02_filter_pushdown" -> ((s, d) => {
      t(s, d)("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    // J: multi-way join, small dims broadcast — revenue per nation
    "q03_join_revenue" -> ((s, d) => {
      val li = t(s, d)("lineitem")
      val o = t(s, d)("orders")
      val c = t(s, d)("customer")
      val n = t(s, d)("nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec4))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J6-analog: semi join (EXISTS)
    "q04_semi_join" -> ((s, d) => {
      val c = t(s, d)("customer")
      val big = t(s, d)("orders").filter(col("o_totalprice") > 150000)
      c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J6: anti join (NOT EXISTS) — the reference's train/val split shape
    "q05_anti_join" -> ((s, d) => {
      val c = t(s, d)("customer")
      val o = t(s, d)("orders").filter(col("o_totalprice") > 200000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // W1: rank window — top 3 line items per supplier
    "q06_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, d)("lineitem")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("l_suppkey"), col("rank"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"))
    }),

    // W: running-sum frame window per customer
    "q07_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d)("orders")
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(dec2)).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
    }),

    // W2: Pareto frontier — running-max frame, strict improvement
    // (create_plots.ipynb pareto_frontier re-expressed relationally)
    "q08_pareto" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d)("orders")
        .withColumn("prev_max", max(col("o_totalprice")).over(w))
        .filter(col("prev_max").isNull || col("o_totalprice") > col("prev_max"))
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    }),

    // A5: exact percentiles (p99 latency analog)
    "q09_percentiles" -> ((s, d) => {
      t(s, d)("events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
    }),

    // A6: recall-bracket-style bucketing + per-bucket mean
    "q10_brackets" -> ((s, d) => {
      t(s, d)("events")
        .withColumn("bracket",
          when(col("value") < 50, "lt50")
            .when(col("value") < 150, "50_150")
            .when(col("value") < 300, "150_300")
            .otherwise("ge300"))
        .groupBy(col("bracket"), col("event_type"))
        .agg(round(sum(col("value").cast(dec2)) / count(lit(1)), 6)
          .cast("double").as("avg_value"),
          count(lit(1)).as("n"))
    }),

    // A7: argmax — best (value, event_id) row per event_type
    "q11_argmax" -> ((s, d) => {
      t(s, d)("events")
        .groupBy(col("event_type"))
        .agg(
          max(col("value")).as("best_value"),
          max_by(col("user_id"), struct(col("value"), col("event_id")))
            .as("best_user"))
    }),

    // E2/J8: column-harmonized union of two differently-shaped branches
    "q12_union_harmonize" -> ((s, d) => {
      val e = t(s, d)("events")
      val a = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("value").as("score"), lit("cagra").as("algo"))
      val b = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("value").as("score"),
          col("user_id").as("extra_user"), lit("hnsw").as("algo"))
      a.unionByName(b, allowMissingColumns = true)
    }),

    // O4: global top-N → TakeOrderedAndProject
    "q13_top_orders" -> ((s, d) => {
      t(s, d)("orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // A: distinct aggregation
    "q14_distinct" -> ((s, d) => {
      t(s, d)("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // time-window agg (batch shape of the streaming pipeline)
    "q15_event_windows" -> ((s, d) => {
      t(s, d)("events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(dec2)), 2).cast("double").as("sum_value"))
        .select(unix_timestamp(col("hour")).as("hour_epoch"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // Gap-based sessionization of the event stream (6h gap): one
    // shuffle by user, lag + running-count windows under the same
    // sort, DECIMAL value totals so the rollup is engine-exact
    "q17_sessionize" -> ((s, d) =>
      Sessions.sessionSummary(t(s, d)("events"), gapSec = 21600L)),

    // As-of join: each purchase matched to the user's most recent
    // prior-or-equal view (union-and-carry lowering — one shuffle,
    // one sort, no range join); integer-microsecond time base
    "q18_asof_join" -> ((s, d) => {
      val e = t(s, d)("events")
        .withColumn("ts_us", unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("view_event_id"),
          col("ts_us").as("view_ts_us"))
      AsOf.join(purchases, views, "user_id", "ts_us",
          payload = Seq("view_event_id", "view_ts_us"),
          leftKeep = Seq("event_id"), rightTieCol = "view_event_id")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_view_event_id").as("view_event_id"),
          col("asof_view_ts_us").as("view_ts_us"),
          (col("ts_us") - col("asof_view_ts_us")).as("gap_us"))
    }),

    // Deterministic salted join (manual skew mitigation): events'
    // user keys spread over 8 salt buckets against the replicated
    // customer dim — row-identical to the plain join, which is
    // exactly what the oracle checks
    "q19_salted_join" -> ((s, d) => {
      val users = t(s, d)("customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(t(s, d)("events"), users,
          key = "user_id", identityCol = "event_id", factor = 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(dec2)), 2).cast("double")
            .as("sum_value"))
    }),

    // F6: JSON field extraction from the props column
    "q16_json_extract" -> ((s, d) => {
      t(s, d)("events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice * l_discount AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin,
    "q06_window_topk" ->
      """SELECT l_suppkey, CAST(rank AS BIGINT) AS rank, l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
        |  FROM lineitem)
        |WHERE rank <= 3""".stripMargin,
    "q07_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders""".stripMargin,
    "q08_pareto" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    max(o_totalprice) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM orders)
        |WHERE prev_max IS NULL OR o_totalprice > prev_max""".stripMargin,
    "q09_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q10_brackets" ->
      """SELECT CASE WHEN value < 50 THEN 'lt50'
        |    WHEN value < 150 THEN '50_150'
        |    WHEN value < 300 THEN '150_300'
        |    ELSE 'ge300' END AS bracket,
        |  event_type,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))) / count(*), 6) AS DOUBLE) AS avg_value,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_argmax" ->
      """SELECT event_type, max(value) AS best_value,
        |  (SELECT user_id FROM events e2 WHERE e2.event_type = e.event_type
        |   ORDER BY e2.value DESC, e2.event_id DESC LIMIT 1) AS best_user
        |FROM events e GROUP BY event_type""".stripMargin,
    "q12_union_harmonize" ->
      """SELECT event_id, value AS score, NULL AS extra_user, 'cagra' AS algo
        |FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, value AS score, user_id AS extra_user, 'hnsw' AS algo
        |FROM events WHERE event_type = 'view'""".stripMargin,
    "q13_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q14_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_event_windows" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q18_asof_join" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side, event_id,
        |    NULL::BIGINT AS rtie,
        |    NULL::BIGINT AS p_view_event_id, NULL::BIGINT AS p_view_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, epoch_us(ts), 0, NULL::BIGINT, event_id,
        |    event_id, epoch_us(ts)
        |  FROM events WHERE event_type = 'view'
        |), u AS (
        |  SELECT * FROM l UNION ALL SELECT * FROM r
        |), c AS (
        |  SELECT *,
        |    last_value(p_view_event_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, side, rtie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS view_event_id,
        |    last_value(p_view_ts_us IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, side, rtie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS view_ts_us
        |  FROM u
        |)
        |SELECT event_id, user_id, ts_us, view_event_id, view_ts_us,
        |  ts_us - view_ts_us AS gap_us
        |FROM c WHERE side = 1""".stripMargin,
    "q19_salted_join" ->
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n,
        |  CAST(round(sum(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q17_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
        |), l AS (
        |  SELECT *, lag(ts_us) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM e
        |), f AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |      OR ts_us - prev > 21600000000 THEN 1 ELSE 0 END AS brk
        |  FROM l
        |), s AS (
        |  SELECT *, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_sec,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q16_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
