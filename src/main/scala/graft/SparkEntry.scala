package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Knn, Recall}

/** Driver contract — see SURVEY.md §7 + FIXTURES.md.
  *
  * Vector-workload conventions over the driver testdata
  * (`embeddings(vec_id, embedding[64], label)`):
  *  - query split: vec_id % 50 == 0 (the reference's seeded held-out
  *    split, cuvs_bench_grid_search_v3.py:771-779, made deterministic
  *    by predicate instead of RNG state);
  *  - data side: the complement (disjoint, J6 anti-split semantics);
  *  - label plays the role of rating for the filter configs
  *    (filter_config.yaml analogs): low = label<>3 (~88% kept),
  *    high = label IN (0,1) (~19%), mid = label=5 AND vec_id%11=0
  *    (~1% — exercises pre-filter semantics where fewer than k rows
  *    survive).
  */
object SparkEntry {

  val K = 10

  def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("q_embedding"))

  def dataDf(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 =!= 0)

  val filterLow: Column = col("label") =!= 3
  val filterHigh: Column = col("label").isin(0, 1)
  val filterMid: Column = col("label") === 5 && col("vec_id") % 11 === 0

  /** Flagship: filtered exact k-NN on sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    GraftFunctions.register(spark)
    Knn.exact(dataDf(spark, dir).filter(filterLow),
      queriesDf(spark, dir), K)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.all ++ RelationalQueries.all ++ DedupQueries.all ++
      TextQueries.all ++ AnnQueries.all ++ IngestQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    VectorQueries.oracles ++ RelationalQueries.oracles ++
      DedupQueries.oracles ++ TextQueries.oracles ++ AnnQueries.oracles ++
      IngestQueries.oracles
}

/** Vector-search query pack: exact filtered k-NN in each metric —
  * SURVEY §2.3 J1/J4, §2.8 F1-F4. */
object VectorQueries {
  import SparkEntry._

  private def knnWith(filter: Column, metric: String)(
      spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Knn.exact(dataDf(spark, dir).filter(filter),
        queriesDf(spark, dir), K, metric)
      .select(col("qid"), col("rank"), col("neighbor_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_exact_low" -> (knnWith(filterLow, "sqeuclidean") _),
    "knn_exact_high" -> (knnWith(filterHigh, "sqeuclidean") _),
    "knn_exact_mid" -> (knnWith(filterMid, "sqeuclidean") _),
    "knn_cosine" -> (knnWith(filterLow, "cosine") _),
    "knn_dot" -> (knnWith(filterLow, "dot") _),
    "knn_hamming" -> ((spark: SparkSession, dir: String) => {
      GraftFunctions.register(spark)
      Knn.exactHamming(dataDf(spark, dir).filter(filterLow),
          queriesDf(spark, dir), K)
        .select(col("qid"), col("rank"), col("neighbor_id"))
    }),
    "knn_recall_self" -> ((spark: SparkSession, dir: String) => {
      GraftFunctions.register(spark)
      val found = knnWith(filterLow, "sqeuclidean")(spark, dir)
      Recall.ofRanked(found, found)
    })
  )

  /** Shared SQL fragments for the DuckDB oracle. The distance is
    * accumulated in double over the zipped unnest — same element order
    * as the Spark expression's sequential loop, so the doubles are
    * bit-identical and the (dist, id) ordering cannot flap. */
  private def knnOracle(dataPred: String, distExpr: String,
      desc: Boolean = false): String = {
    val dir = if (desc) "DESC" else "ASC"
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id % 50 = 0
       |), d AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  WHERE vec_id % 50 <> 0 AND ($dataPred)
       |), dist AS (
       |  SELECT q.qid, d.vec_id,
       |    (SELECT $distExpr
       |     FROM (SELECT unnest(q.qe) AS a, unnest(d.embedding) AS b) z) AS dst
       |  FROM q CROSS JOIN d
       |)
       |SELECT qid, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY dst $dir, vec_id ASC) AS BIGINT) AS rank,
       |  vec_id AS neighbor_id
       |FROM dist
       |QUALIFY rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  private val sqdist =
    "sum((CAST(z.a AS DOUBLE) - CAST(z.b AS DOUBLE)) * (CAST(z.a AS DOUBLE) - CAST(z.b AS DOUBLE)))"
  private val dot = "sum(CAST(z.a AS DOUBLE) * CAST(z.b AS DOUBLE))"
  private val cosine =
    """sum(CAST(z.a AS DOUBLE) * CAST(z.b AS DOUBLE)) /
      | (sqrt(sum(CAST(z.a AS DOUBLE) * CAST(z.a AS DOUBLE))) *
      |  sqrt(sum(CAST(z.b AS DOUBLE) * CAST(z.b AS DOUBLE))))""".stripMargin
  private val hammingSign =
    "sum(CASE WHEN (z.a > 0) <> (z.b > 0) THEN 1 ELSE 0 END)"

  val oracles: Map[String, String] = Map(
    "knn_exact_low" -> knnOracle("label <> 3", sqdist),
    "knn_exact_high" -> knnOracle("label IN (0, 1)", sqdist),
    "knn_exact_mid" -> knnOracle("label = 5 AND vec_id % 11 = 0", sqdist),
    "knn_cosine" -> knnOracle("label <> 3", cosine, desc = true),
    "knn_dot" -> knnOracle("label <> 3", dot, desc = true),
    "knn_hamming" -> knnOracle("label <> 3", hammingSign),
    "knn_recall_self" ->
      """WITH q AS (SELECT count(*) AS nq FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT nq AS n_queries, 1.0 AS recall FROM q""".stripMargin
  )
}
