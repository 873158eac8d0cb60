package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIvf

/** The exactness argument behind the `ann_nsw_fixed` full oracle: with
  * fixed data-row centroids (vec_id % 31 == 7) every cell is small
  * enough that the NSW build never prunes an adjacency list — a cell
  * of s rows caps degrees at s-1 <= 2m, strictly below the build's
  * prune watermark (lists prune only past 3m) — so the graph stays
  * symmetric and connected, and efSearch >= cell size forces the beam
  * to traverse the whole component — graph search degrades to EXACT
  * in-cell search. These tests pin both the size bound and the
  * resulting equality against the declarative IVF search (the
  * relation the DuckDB oracle expresses). */
class NswFixedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def data =
    SparkEntry.dataDf(spark, sf).filter(SparkEntry.filterLow)

  private def fixedCentroids = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    data.filter(col("vec_id") % 31 === 7)
      .select((row_number().over(w) - 1).as("cid"),
        col("embedding").as("centroid"))
  }

  test("mod-31 fixed cells stay below the no-prune bound (2m+1) and efSearch") {
    val sizes = AnnIvf.assign(data, fixedCentroids)
      .groupBy("cid").count().select("count")
      .collect().map(_.getLong(0))
    val m = 32; val efSearch = 128
    assert(sizes.max <= 2 * m + 1,
      s"max cell ${sizes.max} would let the graph build prune adjacency " +
        "lists, voiding the connectivity argument")
    assert(sizes.max <= efSearch,
      s"max cell ${sizes.max} > efSearch $efSearch: beam could stop early")
  }

  test("graph search at the pinned parameters equals exact in-cell search") {
    val centroids = fixedCentroids
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGraph = tuples(AnnQueries.all("ann_nsw_fixed")(spark, sf))
    val viaExactIvf = tuples(
      AnnIvf.search(AnnIvf.index(data, centroids), centroids,
        SparkEntry.queriesDf(spark, sf), SparkEntry.K, nprobe = 2))
    assert(viaGraph == viaExactIvf)
    assert(viaGraph.nonEmpty)
  }

  // the connectivity/full-traversal argument is metric-independent
  // (the beam visits every reachable node once efSearch >= cell size),
  // but hamming's massive distance ties exercise the (dist, id)
  // tie-break much harder — pin the binary path separately
  test("hamming graph search equals exact in-cell hamming search") {
    val centroids = fixedCentroids
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGraph = tuples(AnnQueries.all("ann_hamming_fixed")(spark, sf))
    val viaExactIvf = tuples(
      AnnIvf.search(AnnIvf.index(data, centroids), centroids,
        SparkEntry.queriesDf(spark, sf), SparkEntry.K, nprobe = 2,
        metric = "hamming"))
    assert(viaGraph == viaExactIvf)
    assert(viaGraph.nonEmpty)
  }
}
