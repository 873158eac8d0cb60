package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Exact k-nearest-neighbor search — the engine's oracle operator.
  *
  * Re-expresses the reference's brute-force filtered k-NN
  * (/root/reference/utils_grid_search.py:953-1027 GPU path, :890-951
  * CPU path) as a Spark plan built from three primitives:
  *
  *   1. the FILTER (rating-range analog) applied on the data side
  *      BEFORE the search — pre-filter semantics
  *      (utils_grid_search.py:999-1002 `prefilter=`): at 0.77%
  *      selectivity a post-filter would return fewer than k rows;
  *   2. a broadcast nested-loop join against the (small) query table —
  *      the reference copies the query batch to every GPU thread
  *      (cuvs_bench_grid_search_v3.py:251), we broadcast to every
  *      executor;
  *   3. `graft_topk`, a bounded-heap TypedImperativeAggregate with
  *      map-side PARTIAL aggregation, so the n×q pair stream is
  *      reduced to q×k rows per partition before any shuffle.
  *
  * At 100 TB: the data side streams partition-local; only q×k×P rows
  * shuffle. No all-pairs materialization anywhere.
  */
object Knn {

  /** Distance column for a metric; smaller = nearer for all metrics
    * (similarities are negated, mirroring the reference's descending
    * inner-product branch at utils_grid_search.py:930-939). */
  def distance(metric: String, v: Column, q: Column): Column = metric match {
    case "sqeuclidean" => GraftFunctions.sqDist(v, q)
    case "cosine"      => -GraftFunctions.cosine(v, q)
    case "dot"         => -GraftFunctions.dot(v, q)
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Exact top-k for every query over `data` (already filtered by the
    * caller — pre-filter semantics). Output:
    * (qid, rank, neighbor_id, dist), rank 1-based, deterministic
    * tie-break (dist asc, id asc).
    */
  def exact(
      data: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: String = "sqeuclidean",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qidCol: String = "qid",
      qvecCol: String = "q_embedding"): DataFrame = {
    val pairs = data.crossJoin(broadcast(queries))
    topKFrom(pairs, k, distance(metric, col(vecCol), col(qvecCol)),
      col(idCol), col(qidCol))
  }

  /** groupBy(qid) bounded-heap top-k + explode to ranked rows. */
  def topKFrom(pairs: DataFrame, k: Int, dist: Column, id: Column,
      qid: Column): DataFrame = {
    pairs
      .groupBy(qid.as("qid"))
      .agg(GraftFunctions.topK(k, dist, id.cast("long")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "nn")))
      .select(
        col("qid"),
        (col("pos") + 1).cast("long").as("rank"),
        col("nn.id").as("neighbor_id"),
        col("nn.dist").as("dist"))
  }

  /** Hamming-space exact top-k over sign-binarized vectors
    * (reference binary-quantized path, utils_grid_search.py:433-434,
    * :649-654). Vectors are packed to 8 bytes (64 dims) on the fly;
    * at scale the packed column is precomputed and stored. */
  def exactHamming(
      data: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qidCol: String = "qid",
      qvecCol: String = "q_embedding"): DataFrame = {
    val packedData = data.withColumn("_bits", GraftFunctions.packBits(col(vecCol)))
    val packedQ = queries.withColumn("_qbits", GraftFunctions.packBits(col(qvecCol)))
    val pairs = packedData.crossJoin(broadcast(packedQ))
    topKFrom(pairs, k,
      GraftFunctions.hamming(col("_bits"), col("_qbits")).cast("double"),
      col(idCol), col(qidCol))
  }
}
