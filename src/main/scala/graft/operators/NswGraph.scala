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

  /** Primitive binary heap over (dist, idx) pairs, lexicographic
    * (dist, then idx) order — the boxed `PriorityQueue[(Double, Int)]`
    * it replaces allocated a tuple per visited node, which dominated
    * graph-build wall time at 5M-row scale. `max = true` keeps the
    * LARGEST pair on top (the bounded result set), `max = false` the
    * smallest (the candidate frontier). */
  private[graft] final class PairHeap(cap0: Int, max: Boolean) {
    private var ds = new Array[Double](math.max(cap0, 8))
    private var is = new Array[Int](ds.length)
    var size = 0
    def headDist: Double = ds(0)
    def headIdx: Int = is(0)
    // "a should sit above b": lexicographic (dist, idx), flipped by max
    private def above(da: Double, ia: Int, db: Double, ib: Int): Boolean =
      if (max) da > db || (da == db && ia > ib)
      else da < db || (da == db && ia < ib)
    def push(d: Double, i: Int): Unit = {
      if (size == ds.length) {
        ds = java.util.Arrays.copyOf(ds, size * 2)
        is = java.util.Arrays.copyOf(is, size * 2)
      }
      var c = size; size += 1
      while (c > 0 && above(d, i, ds((c - 1) / 2), is((c - 1) / 2))) {
        ds(c) = ds((c - 1) / 2); is(c) = is((c - 1) / 2); c = (c - 1) / 2
      }
      ds(c) = d; is(c) = i
    }
    def pop(): Unit = {
      size -= 1
      val d = ds(size); val i = is(size)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var b = c
        var bd = d; var bi = i
        if (l < size && above(ds(l), is(l), bd, bi)) { b = l; bd = ds(l); bi = is(l) }
        if (r < size && above(ds(r), is(r), bd, bi)) { b = r; bd = ds(r); bi = is(r) }
        if (b == c) done = true
        else { ds(c) = ds(b); is(c) = is(b); c = b }
      }
      ds(c) = d; is(c) = i
    }
    /** Drain into an ascending-(dist, idx) array; heap becomes empty. */
    def drainSortedAsc(): Array[(Double, Int)] = {
      require(max, "drainSortedAsc is for the max-heap result set")
      val out = new Array[(Double, Int)](size)
      var k = size - 1
      while (size > 0) { out(k) = (headDist, headIdx); pop(); k -= 1 }
      out
    }
  }

  /** Greedy beam search over an adjacency list. Returns up to ef
    * nearest (dist, idx) pairs ascending, deterministic (dist, idx)
    * tie-break. */
  private def beamSearch(
      vecs: Array[Array[Float]], adj: Array[mutable.ArrayBuffer[Int]],
      entry: Int, target: Array[Float], ef: Int,
      metric: String): Array[(Double, Int)] = {
    val visited = new java.util.BitSet(vecs.length)
    // candidates: nearest-first; results: farthest-first (bounded ef)
    val candidates = new PairHeap(ef + 1, max = false)
    val results = new PairHeap(ef + 1, max = true)
    val d0 = Knn.scalarDistance(metric, vecs(entry), target)
    candidates.push(d0, entry); results.push(d0, entry)
    visited.set(entry)
    var exhausted = false
    while (!exhausted && candidates.size > 0) {
      val cd = candidates.headDist; val c = candidates.headIdx
      candidates.pop()
      if (cd > results.headDist && results.size >= ef) {
        exhausted = true
      } else {
        val nbs = adj(c)
        var j = 0
        while (j < nbs.length) {
          val nb = nbs(j)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = Knn.scalarDistance(metric, vecs(nb), target)
            if (results.size < ef || d < results.headDist ||
              (d == results.headDist && nb < results.headIdx)) {
              candidates.push(d, nb)
              results.push(d, nb)
              if (results.size > ef) results.pop()
            }
          }
          j += 1
        }
      }
    }
    results.drainSortedAsc()
  }

  /** Diverse-neighbor selection — the published HNSW heuristic
    * (Malkov & Yashunin 2018, Algorithm 4, keepPrunedConnections):
    * walk the candidates nearest-first and keep one iff it is closer
    * to the new node than to every already-kept neighbor (so kept
    * edges span DIFFERENT directions instead of one tight cluster),
    * then fill any remaining slots with the nearest rejects. The
    * nearest candidate is always kept, so every insert still links
    * into the existing component. Deterministic given the ascending
    * (dist, idx) candidate order. */
  private def selectNeighbors(vecs: Array[Array[Float]],
      cands: Array[(Double, Int)], m: Int,
      metric: String): Array[(Double, Int)] = {
    val selected = new mutable.ArrayBuffer[(Double, Int)](m)
    val rejected = new mutable.ArrayBuffer[(Double, Int)]()
    var i = 0
    while (i < cands.length && selected.length < m) {
      val (d, c) = cands(i)
      var ok = true
      var s = 0
      while (ok && s < selected.length) {
        if (Knn.scalarDistance(metric, vecs(c), vecs(selected(s)._2)) < d)
          ok = false
        s += 1
      }
      if (ok) selected += ((d, c)) else rejected += ((d, c))
      i += 1
    }
    var r = 0
    while (selected.length < m && r < rejected.length) {
      selected += rejected(r); r += 1
    }
    selected.toArray
  }

  /** Build a single-layer NSW graph: sequential greedy insert, each
    * node bidirectionally linked to up to M heuristic-selected
    * neighbors from its efConstruction beam; neighbor lists over 2M
    * re-selected with the same heuristic (diversity-pruned). */
  private def build(vecs: Array[Array[Float]], m: Int, efConstruction: Int,
      metric: String): Array[mutable.ArrayBuffer[Int]] = {
    val n = vecs.length
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    var i = 1
    while (i < n) {
      val cands = beamSearch(vecs, adj, 0, vecs(i),
        math.max(m, efConstruction), metric)
      val near = selectNeighbors(vecs, cands, m, metric)
      near.foreach { case (_, nb) =>
        adj(i) += nb
        adj(nb) += i
        if (adj(nb).length > 2 * m) {
          val withD = adj(nb)
            .map(x => (Knn.scalarDistance(metric, vecs(nb), vecs(x)), x))
            .sorted.toArray
          adj(nb) = mutable.ArrayBuffer.from(
            selectNeighbors(vecs, withD, 2 * m, metric).map(_._2))
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

  /** Per-query probe lists for a graph-index search: (qid, vector,
    * probed cell ids). Collected once and broadcast — shareable across
    * every (m, efSearch) combination that probes the same centroids at
    * the same nprobe (the grid sweep re-searches the same probes per
    * level). */
  def probeQueries(centroids: DataFrame, queries: DataFrame, nprobe: Int,
      qidCol: String = "qid",
      qvecCol: String = "q_embedding"): Array[(Long, Array[Float], Array[Int])] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val matrix = graft.operators.AnnIvf.collectCentroids(centroids)
    queries
      .select(col(qidCol).cast("long"), col(qvecCol),
        graft.GraftFunctions.nearestCells(col(qvecCol), matrix, nprobe))
      .as[(Long, Array[Float], Array[Int])].collect()
  }

  /** Beam-search a prebuilt graph index: each query visits only the
    * graphs of its nprobe probed cells, ~efSearch·M vectors per cell
    * instead of the whole cell. */
  def searchIndex(graphs: org.apache.spark.sql.Dataset[CellGraph],
      centroids: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      efSearch: Int = 64, metric: String = "sqeuclidean",
      qidCol: String = "qid", qvecCol: String = "q_embedding"): DataFrame =
    searchIndexProbed(graphs,
      probeQueries(centroids, queries, nprobe, qidCol, qvecCol),
      k, efSearch, metric)

  /** `searchIndex` over precollected probe lists. */
  def searchIndexProbed(graphs: org.apache.spark.sql.Dataset[CellGraph],
      probed: Array[(Long, Array[Float], Array[Int])], k: Int,
      efSearch: Int = 64, metric: String = "sqeuclidean"): DataFrame = {
    val spark = graphs.sparkSession
    import spark.implicits._
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
                .take(kk)
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
              .take(k)
              .map { case (d, idx) => (qid, ids(idx), d) }
          }
        }
      }
      .toDF("qid", "_nnid", "_dist")
    Knn.topKFrom(partials, k, col("_dist"), col("_nnid"), col("qid"))
  }
}
