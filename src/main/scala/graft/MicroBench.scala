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

  def main(args: Array[String]): Unit = {
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
