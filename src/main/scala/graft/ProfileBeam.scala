package graft

import graft.operators.{Knn, NswGraph}

/** Single-threaded microbench of the servable beam kernel — no Spark.
  * Separates: build cost, ns/beam at serving ef, how many nodes a beam
  * actually visits (distance evals), and the raw ns/eval of the same
  * random-access distance pattern. Drives the r12 serving-margin work:
  * the 5M profile shows the beam stage is ~75% of a searchServable
  * call, so this isolates what a beam's microseconds are made of.
  *
  * usage: runMain graft.ProfileBeam [cellRows] [m] [efSearch] [nCells]
  * `nCells > 1` replicates the 5M executor shape: one partition holds
  * ~32 cells (~41 MB of decoded floats), so consecutive beams touch
  * different cells and the flat arrays are NOT cache-resident — the
  * regime where the kernel is DRAM-latency-bound.
  */
object ProfileBeam {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val m = args.lift(1).map(_.toInt).getOrElse(16)
    val ef = args.lift(2).map(_.toInt).getOrElse(32)
    val nCells = args.lift(3).map(_.toInt).getOrElse(1)
    val dim = 64
    var seed = 0x9e3779b97f4a7c15L
    def nextF(): Float = {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      ((seed & 0xffffff).toDouble / 0xffffff - 0.5).toFloat
    }
    // 20 loose clusters, like the scale generator
    val centers = Array.fill(20, dim)(nextF() * 2f)
    val vecs = Array.tabulate(n) { i =>
      val c = centers(i % 20)
      Array.tabulate(dim)(j => c(j) + nextF() * 0.5f)
    }
    val queries = Array.tabulate(2000) { i =>
      val c = centers(i % 20)
      Array.tabulate(dim)(j => c(j) + nextF() * 0.5f)
    }
    def buildCell(cid: Int, rows: Array[Array[Float]])
        : NswGraph.ServableCell = {
      val kern = new NswGraph.CellKernel("sqeuclidean", rows)
      val adj = NswGraph.build(kern, m, 64)
      val nn = rows.length
      val flat = new Array[Float](nn * dim)
      var i = 0
      while (i < nn) {
        System.arraycopy(rows(i), 0, flat, i * dim, dim); i += 1
      }
      val adjOff = new Array[Int](nn + 1)
      i = 0
      while (i < nn) { adjOff(i + 1) = adjOff(i) + adj(i).length; i += 1 }
      val adjFlat = new Array[Int](adjOff(nn))
      i = 0
      while (i < nn) {
        System.arraycopy(adj(i), 0, adjFlat, adjOff(i), adj(i).length)
        i += 1
      }
      NswGraph.ServableCell(cid, Array.tabulate(nn)(_.toLong), dim,
        flat, null, adjFlat, adjOff)
    }
    var t0 = System.nanoTime()
    val cells = Array.tabulate(nCells) { c =>
      if (c == 0) buildCell(0, vecs)
      else buildCell(c, Array.tabulate(n) { i =>
        val base = centers((i + c) % 20)
        Array.tabulate(dim)(j => base(j) + nextF() * 0.5f)
      })
    }
    println(f"[pbeam] build $nCells cells x $n m=$m: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(decoded ~${nCells.toLong * n * dim * 4 / (1 << 20)} MiB)")
    val cell = cells(0)
    val adj = Array.tabulate(n) { i =>
      java.util.Arrays.copyOfRange(cell.adjFlat, cell.adjOff(i),
        cell.adjOff(i + 1))
    }
    val flat = cell.flat
    val stamps = new Array[Int](n)
    var epoch = 0
    val cands = new NswGraph.PairHeap(ef + 1, max = false)
    val res = new NswGraph.PairHeap(ef + 1, max = true)
    val nbuf = new Array[Int](n)
    // beams round-robin across cells: with nCells ~32 the touched
    // flat arrays exceed LLC, reproducing the executor's cold-cache
    // regime per beam
    def beams(rounds: Int): Double = {
      val t = System.nanoTime()
      var r = 0
      while (r < rounds) {
        var q = 0
        while (q < queries.length) {
          epoch += 1
          NswGraph.beamServable(cells((q + r) % nCells), 0, queries(q), ef,
            stamps, epoch, cands, res, nbuf)
          q += 1
        }
        r += 1
      }
      (System.nanoTime() - t).toDouble / (rounds.toLong * queries.length)
    }
    beams(5) // warm
    println(f"[pbeam] beamServable ef=$ef nCells=$nCells: " +
      f"${beams(20)}%.0f ns/beam")
    println(f"[pbeam] beamServable ef=$ef nCells=$nCells (rep): " +
      f"${beams(20)}%.0f ns/beam")

    // counting twin: same visit order, with counters
    var evals = 0L; var pushes = 0L; var visited = 0L; var hops = 0L
    def countBeam(target: Array[Float]): Unit = {
      epoch += 1
      cands.clear(); res.clear()
      def distTo(idx: Int, bound: Double): Double = {
        evals += 1
        Knn.distBoundedFlat(0, cell.flat, idx * dim, dim, target, bound)
      }
      val d0 = distTo(0, Double.PositiveInfinity)
      cands.push(d0, 0); res.push(d0, 0); stamps(0) = epoch
      var exhausted = false
      while (!exhausted && cands.size > 0) {
        val cd = cands.headDist; val c = cands.headIdx
        cands.pop(); hops += 1
        if (cd > res.headDist && res.size >= ef) exhausted = true
        else {
          var j = cell.adjOff(c); val end = cell.adjOff(c + 1)
          while (j < end) {
            val nb = cell.adjFlat(j)
            if (stamps(nb) != epoch) {
              stamps(nb) = epoch
              visited += 1
              val full = res.size >= ef
              val d = distTo(nb,
                if (full) res.headDist else Double.PositiveInfinity)
              if (!full || d < res.headDist ||
                (d == res.headDist && nb < res.headIdx)) {
                cands.push(d, nb); pushes += 1
                res.push(d, nb)
                if (res.size > ef) res.pop()
              }
            }
            j += 1
          }
        }
      }
    }
    queries.foreach(countBeam)
    val nq = queries.length.toDouble
    println(f"[pbeam] per beam: hops=${hops / nq}%.1f visited=${visited / nq}%.1f " +
      f"distEvals=${evals / nq}%.1f heapPushes=${pushes / nq}%.1f " +
      f"avgDegree=${cell.adjFlat.length.toDouble / n}%.1f")

    // raw distance throughput over the SAME random-access pattern:
    // walk a shuffled index sequence, full-width evals
    val order = Array.tabulate(n)(identity)
    var x = 0
    while (x < n) { // Fisher-Yates with the same xorshift
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      val y = (((seed % n) + n) % n).toInt
      val tmp = order(x); order(x) = order(y); order(y) = tmp
      x += 1
    }
    var sink = 0.0
    def rawPass(rounds: Int): Double = {
      val t = System.nanoTime()
      var r = 0
      while (r < rounds) {
        val q = queries(r % queries.length)
        var j = 0
        while (j < n) {
          sink += Knn.distBoundedFlat(0, flat, order(j) * dim, dim, q,
            Double.PositiveInfinity)
          j += 1
        }
        r += 1
      }
      (System.nanoTime() - t).toDouble / (rounds.toLong * n)
    }
    rawPass(20)
    println(f"[pbeam] raw full-width eval (random order): ${rawPass(100)}%.1f ns " +
      f"(sink ${sink != 0.0})")
  }
}
