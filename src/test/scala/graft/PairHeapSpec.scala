package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NswGraph

/** Property tests for the primitive pair heap under the NSW kernel:
  * lexicographic (dist, idx) order with both directions, growth past
  * the initial capacity, duplicate distances (the tie-break path), and
  * the bounded-top-k usage pattern beamSearch relies on. */
class PairHeapSpec extends AnyFunSuite {

  private def randomPairs(seed: Int, n: Int): Seq[(Double, Int)] = {
    val rnd = new scala.util.Random(seed)
    // coarse distances force plenty of exact ties so the idx
    // tie-break actually decides
    Seq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextInt(1000)))
  }

  test("max-heap drainSortedAsc equals full (dist, idx) sort") {
    (1 to 20).foreach { seed =>
      val pairs = randomPairs(seed, 200)
      val h = new NswGraph.PairHeap(4, max = true) // forces growth
      pairs.foreach { case (d, i) => h.push(d, i) }
      assert(h.drainSortedAsc().toSeq == pairs.sorted)
    }
  }

  test("bounded top-k: popping the max past k keeps the k smallest") {
    val k = 16
    (1 to 20).foreach { seed =>
      val pairs = randomPairs(seed + 100, 300)
      val h = new NswGraph.PairHeap(k + 1, max = true)
      pairs.foreach { case (d, i) =>
        h.push(d, i)
        if (h.size > k) h.pop()
      }
      assert(h.drainSortedAsc().toSeq == pairs.sorted.take(k))
    }
  }

  test("min-heap pops in ascending (dist, idx) order") {
    (1 to 20).foreach { seed =>
      val pairs = randomPairs(seed + 200, 150)
      val h = new NswGraph.PairHeap(8, max = false)
      pairs.foreach { case (d, i) => h.push(d, i) }
      val out = Seq.newBuilder[(Double, Int)]
      while (h.size > 0) { out += ((h.headDist, h.headIdx)); h.pop() }
      assert(out.result() == pairs.sorted)
    }
  }
}
