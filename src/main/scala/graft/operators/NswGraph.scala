package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-partition navigable-small-world graph search — the contained
  * in-JVM analog of the reference's HNSW path
  * (/root/reference/utils_grid_search.py:634-686 build, :613-632
  * search, faiss `IndexHNSWFlat`/`efSearch`). SURVEY §7.3: graph
  * builds are sequential by nature, so the engine does NOT distribute
  * one graph; instead each partition builds a local graph over its
  * rows inside `mapPartitions` and searches the broadcast query batch
  * with a bounded beam (`efSearch`); per-partition partial top-k
  * results merge through the same TopKSmallest aggregate as every
  * other k-NN path.
  *
  * Knobs map 1:1 to the reference grid (params_config.yaml:11-15):
  * M (max neighbors per node), efConstruction (build beam),
  * efSearch (query beam — the recall↔QPS dial).
  *
  * At 100 TB: partitions are IVF cells or range buckets; each holds an
  * independently built graph (embarrassingly parallel build — the
  * reference's 54s single-threaded build becomes per-cell minutes
  * fanned across executors), and a query fans to all (or, layered
  * under AnnIvf, only probed) cells.
  */
object NswGraph {

  /** Greedy beam search over an adjacency list. Returns up to ef
    * nearest (dist, id) pairs, deterministic (dist, idx) tie-break. */
  private def beamSearch(
      vecs: Array[Array[Float]], adj: Array[mutable.ArrayBuffer[Int]],
      entry: Int, target: Array[Float], ef: Int,
      metric: String): mutable.PriorityQueue[(Double, Int)] = {
    val visited = new java.util.BitSet(vecs.length)
    // candidates: nearest-first; results: farthest-first (bounded ef)
    val candidates = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), (Double, Int)](identity).reverse)
    val results = mutable.PriorityQueue.empty[(Double, Int)]
    val d0 = Knn.scalarDistance(metric, vecs(entry), target)
    candidates.enqueue((d0, entry)); results.enqueue((d0, entry))
    visited.set(entry)
    while (candidates.nonEmpty) {
      val (cd, c) = candidates.dequeue()
      if (cd > results.head._1 && results.size >= ef) {
        candidates.clear() // beam exhausted
      } else {
        adj(c).foreach { nb =>
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = Knn.scalarDistance(metric, vecs(nb), target)
            if (results.size < ef || d < results.head._1 ||
              (d == results.head._1 && nb < results.head._2)) {
              candidates.enqueue((d, nb))
              results.enqueue((d, nb))
              if (results.size > ef) results.dequeue()
            }
          }
        }
      }
    }
    results
  }

  /** Build a single-layer NSW graph: sequential greedy insert, each
    * node bidirectionally linked to its efConstruction-beam M nearest;
    * neighbor lists pruned to 2M. */
  private def build(vecs: Array[Array[Float]], m: Int, efConstruction: Int,
      metric: String): Array[mutable.ArrayBuffer[Int]] = {
    val n = vecs.length
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    var i = 1
    while (i < n) {
      val near = beamSearch(vecs, adj, 0, vecs(i),
        math.max(m, efConstruction), metric)
        .dequeueAll.sorted.take(m)
      near.foreach { case (_, nb) =>
        adj(i) += nb
        adj(nb) += i
        if (adj(nb).length > 2 * m) {
          // keep the 2M nearest of nb (distance-pruned, deterministic)
          val kept = adj(nb)
            .map(x => (Knn.scalarDistance(metric, vecs(nb), vecs(x)), x))
            .sorted.take(2 * m).map(_._2)
          adj(nb) = kept
        }
      }
      i += 1
    }
    adj
  }

  /** Approximate top-k for every query. Output (qid, rank,
    * neighbor_id, dist); recall rises with efSearch. */
  def search(data: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, efConstruction: Int = 64, efSearch: Int = 32,
      metric: String = "sqeuclidean",
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "q_embedding"): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col(qidCol).cast("long"), col(qvecCol)).as[(Long, Array[Float])]
      .collect()
    val bc = spark.sparkContext.broadcast(qRows)
    val ef = math.max(k, efSearch)
    val (mm, efc, met) = (m, efConstruction, metric)
    val partials = data
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(_._2)
          val adj = build(vecs, mm, efc, met)
          val qs = bc.value
          qs.iterator.flatMap { case (qid, qv) =>
            beamSearch(vecs, adj, 0, qv, ef, met)
              .dequeueAll.sorted.take(k)
              .map { case (d, idx) => (qid, ids(idx), d) }
          }
        }
      }
      .toDF("qid", "_nnid", "_dist")
    Knn.topKFrom(partials, k, col("_dist"), col("_nnid"), col("qid"))
  }
}
