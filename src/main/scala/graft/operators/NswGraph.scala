package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** A materialized per-cell graph: the engine's persistable index
    * artifact (the relational form of the reference's saved HNSW
    * index). One row per IVF cell — ids, vectors, and adjacency lists
    * travel together, so a probe reads exactly its cells' rows
    * (partition pruning when written `partitionBy("cid")`). */
  case class CellGraph(cid: Int, ids: Array[Long],
      vecs: Array[Array[Float]], adj: Array[Array[Int]])

  /** Build the per-cell graphs ONCE (embarrassingly parallel across
    * cells); search many query batches against the result. */
  def buildIndex(indexed: DataFrame, m: Int = 8, efConstruction: Int = 64,
      metric: String = "sqeuclidean",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.Dataset[CellGraph] = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val (mm, efc, met) = (m, efConstruction, metric)
    indexed
      .select(col(idCol).cast("long"), col(vecCol), col("cid"))
      .as[(Long, Array[Float], Int)]
      .repartition(col("cid"))
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.map { case (cid, cellRows) =>
          val vecs = cellRows.map(_._2)
          CellGraph(cid, cellRows.map(_._1), vecs,
            build(vecs, mm, efc, met).map(_.toArray))
        }
      }
  }

  /** Persist / reload the graph index. One parquet partition directory
    * per cell, so `searchIndex` over a reloaded index prunes unprobed
    * cells at the file level — build offline once, serve online. */
  def writeGraphIndex(graphs: org.apache.spark.sql.Dataset[CellGraph],
      path: String): Unit =
    graphs.write.mode("overwrite").partitionBy("cid").parquet(path)

  def readGraphIndex(spark: SparkSession,
      path: String): org.apache.spark.sql.Dataset[CellGraph] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("cid").cast("int"), col("ids"), col("vecs"), col("adj"))
      .as[CellGraph]
  }

  /** Beam-search a prebuilt graph index: each query visits only the
    * graphs of its nprobe probed cells, ~efSearch·M vectors per cell
    * instead of the whole cell. */
  def searchIndex(graphs: org.apache.spark.sql.Dataset[CellGraph],
      centroids: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      efSearch: Int = 64, metric: String = "sqeuclidean",
      qidCol: String = "qid", qvecCol: String = "q_embedding"): DataFrame = {
    val spark = graphs.sparkSession
    import spark.implicits._
    val matrix = graft.operators.AnnIvf.collectCentroids(centroids)
    val probed = queries
      .select(col(qidCol).cast("long"), col(qvecCol),
        graft.GraftFunctions.nearestCells(col(qvecCol), matrix, nprobe))
      .as[(Long, Array[Float], Array[Int])].collect()
    val bc = spark.sparkContext.broadcast(probed)
    val probedCells = probed.flatMap(_._3).toSet
    val (efs, met, kk) = (math.max(k, efSearch), metric, k)
    val partials = graphs
      .filter(col("cid").isin(probedCells.toSeq: _*))
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { g =>
          val adj = g.adj.map(a => mutable.ArrayBuffer.from(a))
          qs.iterator
            .filter(_._3.contains(g.cid))
            .flatMap { case (qid, qv, _) =>
              beamSearch(g.vecs, adj, 0, qv, efs, met)
                .dequeueAll.sorted.take(kk)
                .map { case (d, idx) => (qid, g.ids(idx), d) }
            }
        }
      }
      .toDF("qid", "_nnid", "_dist")
    Knn.topKFrom(partials, kk, col("_dist"), col("_nnid"), col("qid"))
  }

  /** IVF-layered graph search — the HNSW-at-scale composition
    * (SURVEY §7.3 "per-partition graphs layered under AnnIvf"): data
    * is range-partitioned by cell; inside each partition one NSW graph
    * is built PER CELL, and each query beam-searches only the graphs
    * of its `nprobe` probed cells. Per probed cell the beam visits
    * ~efSearch·M vectors instead of the whole cell — the asymptotic
    * win over `AnnIvf.searchFast` once cells outgrow the beam.
    * Same TopKSmallest merge; approximate (graph recall < 1). */
  def searchIvf(indexed: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64,
      metric: String = "sqeuclidean",
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "q_embedding"): DataFrame =
    searchIndex(buildIndex(indexed, m, efConstruction, metric, idCol, vecCol),
      centroids, queries, k, nprobe, efSearch, metric, qidCol, qvecCol)

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
