package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameter-grid benchmark runner — the engine's equivalent of the
  * reference's sequential combo loop
  * (/root/reference/cuvs_bench_grid_search_v3.py:639-722): cartesian
  * parameter grid with constraint pruning (:136-138), one index build
  * per build-param combo, per-combo timed search + recall against the
  * exact oracle, one results row per combo (result dict :315-335).
  *
  * The grid itself is driver-side Scala (J7 — the reference also keeps
  * it in the driver); all heavy work is Spark jobs. Timings are wall
  * clock around actions; recall and n_candidates are deterministic, so
  * downstream analytics (Pareto/brackets/argmax) stay reproducible
  * while QPS remains a human-facing measurement.
  */
object GridSearch {

  case class Combo(npartitions: Int, nprobe: Int)

  /** nprobe <= npartitions is the constraint-pruning analog. */
  def defaultGrid: Seq[Combo] =
    for {
      np <- Seq(8, 16)
      p <- Seq(1, 2, 4, 8)
      if p <= np
    } yield Combo(np, p)

  case class ResultRow(
      algo: String, npartitions: Int, nprobe: Int, k: Int,
      filter_name: String, total_vectors: Long, total_queries: Long,
      filtering_percentage: Double, build_time_seconds: Double,
      search_time_seconds: Double, queries_per_second: Double,
      recall: Double, n_candidates: Long,
      error: Option[String] = None)

  def run(spark: SparkSession, data: DataFrame, queries: DataFrame,
      filterName: String, filterCol: Column, totalBase: Long,
      grid: Seq[Combo] = defaultGrid, k: Int = 10): DataFrame = {
    import spark.implicits._
    val filtered = data.filter(filterCol).cache()
    val q = queries.cache()
    val nVec = filtered.count()
    val nQ = q.count()
    val keptPct = 100.0 * nVec / totalBase
    val truth = Knn.exact(filtered, q, k).cache()
    truth.count()

    val rows = grid.groupBy(_.npartitions).toSeq.sortBy(_._1).flatMap {
      case (npart, combos) =>
        val t0 = System.nanoTime()
        val centroids = AnnIvf.train(filtered, npart, iterations = 2).cache()
        val indexed = AnnIvf.index(filtered, centroids).cache()
        indexed.count()
        val buildSec = (System.nanoTime() - t0) / 1e9
        // P9 error-row pass-through: a failing combo yields a row with
        // null metrics + error, never aborts the sweep
        // (cuvs_bench_grid_search_v3.py:706-722)
        def evalCombo(c: Combo): ResultRow =
          scala.util.Try {
            val t1 = System.nanoTime()
            val found = AnnIvf.search(indexed, centroids, q, k, c.nprobe)
            val rec = Recall.ofRanked(found, truth).head()
            val searchSec = (System.nanoTime() - t1) / 1e9
            // deterministic cost metric: candidate rows scanned
            val nCand = AnnIvf.searchCandidates(indexed, centroids, q, c.nprobe)
            ResultRow("ivf", npart, c.nprobe, k, filterName, nVec, nQ,
              keptPct, buildSec, searchSec, nQ / math.max(searchSec, 1e-9),
              rec.getDouble(rec.fieldIndex("recall")), nCand)
          }.recover { case e =>
            ResultRow("ivf", npart, c.nprobe, k, filterName, nVec, nQ,
              keptPct, buildSec, -1.0, -1.0, -1.0, -1L,
              Some(e.toString.take(200)))
          }.get
        // combos of one build evaluated concurrently: independent Spark
        // jobs interleave on the shared executors (wall ~= slowest
        // combo, not the sum); per-combo wall clock still measured
        // around that combo's own actions
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val futures = combos.sortBy(_.nprobe).map { c =>
          scala.concurrent.Future(evalCombo(c))
        }
        val out = futures.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
        pool.shutdown()
        out
    }
    truth.unpersist(); filtered.unpersist(); q.unpersist()
    rows.toDF()
  }
}
