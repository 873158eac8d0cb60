package graft

/** Kernel microbenchmark: single-thread ns/pair, then aggregate
  * throughput at 1/8/16/32 threads — separates JVM loop speed, VM CPU
  * scaling, and Spark overhead. */
object MicroBench {
  val dim = 64

  def work(data: Array[Array[Float]], queries: Array[Array[Float]]): Long = {
    val heaps = Array.fill(queries.length)(new graft.functions.TopKBuffer(10))
    var i = 0
    while (i < data.length) {
      var j = 0
      while (j < queries.length) {
        heaps(j).insert(
          graft.operators.Knn.scalarDistance("sqeuclidean", data(i), queries(j)),
          i.toLong)
        j += 1
      }
      i += 1
    }
    heaps.length.toLong
  }

  /** Naive full-scan argmin — the pre-pruning assignment kernel, kept
    * as the ratio baseline for `assign` mode. */
  def naiveAssign(data: Array[Array[Float]], cents: Array[Array[Float]]): Long = {
    var hash = 0L
    var r = 0
    while (r < data.length) {
      val x = data(r)
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cen = cents(c)
        var acc = 0.0; var i = 0
        while (i < dim) {
          val d = x(i).toDouble - cen(i).toDouble; acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      hash ^= best.toLong * r
      r += 1
    }
    hash
  }

  /** The shipped kernel (NearestCentroid.nullSafeEval — identical loop
    * to its codegen): blocked early-abandon scan. */
  def prunedAssign(data: Array[Array[Float]], nc: graft.functions.NearestCentroid): Long = {
    var hash = 0L
    var r = 0
    while (r < data.length) {
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        data(r).map(_.asInstanceOf[Any]))
      hash ^= nc.nullSafeEval(ad).asInstanceOf[Int].toLong * r
      r += 1
    }
    hash
  }

  /** `runMain graft.MicroBench assign [nCells]`: the index-build
    * assignment kernel at the ScaleBench shape (clustered mixture,
    * 64-dim, default 2048 cells) — pruned (shipped) vs naive scan. */
  def assignMode(nCells: Int): Unit = {
    val rnd = new java.util.Random(42)
    val nClusters = 1000
    val clusterCenters =
      Array.fill(nClusters)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    def synthRow(): Array[Float] = {
      val c = clusterCenters(rnd.nextInt(nClusters))
      c.map(x => x + (rnd.nextFloat() * 2 - 1) * 0.25f)
    }
    val nVec = 40000
    val data = Array.fill(nVec)(synthRow())
    // centroids as k-means would place them: near cluster centers
    val cents = Array.tabulate(nCells) { i =>
      clusterCenters(i % nClusters).map(x => x + (rnd.nextFloat() * 2 - 1) * 0.05f)
    }
    val nc = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal(1), cents)
    (1 to 2).foreach { _ => naiveAssign(data, cents); prunedAssign(data, nc) }
    Seq(("naive", () => naiveAssign(data, cents)),
        ("pruned", () => prunedAssign(data, nc))).foreach { case (name, f) =>
      Seq(1, 32).foreach { t =>
        val t0 = System.nanoTime()
        val threads = (0 until t).map(_ => new Thread(() => { f(); () }))
        threads.foreach(_.start()); threads.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = nVec.toLong * t
        println(f"[micro-assign] $name%6s threads=$t%2d cells=$nCells " +
          f"${rows / sec / 1e3}%8.1f K rows/s aggregate")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("assign")) {
      assignMode(args.lift(1).map(_.toInt).getOrElse(2048))
      return
    }
    val nVec = 20000
    val q = 64
    val rnd = new java.util.Random(42)
    val data = Array.fill(nVec)(Array.fill(dim)(rnd.nextFloat()))
    val queries = Array.fill(q)(Array.fill(dim)(rnd.nextFloat()))
    (1 to 3).foreach(_ => work(data, queries)) // warmup
    Seq(1, 8, 16, 32).foreach { t =>
      val t0 = System.nanoTime()
      val threads = (0 until t).map { _ =>
        new Thread(() => { work(data, queries); () })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val pairs = nVec.toLong * q * t
      println(f"[micro] threads=$t%2d ${pairs / sec / 1e6}%7.1f M pairs/s " +
        f"aggregate (${sec * 1e9 / (pairs / t)}%.0f ns/pair/thread)")
    }
  }
}
