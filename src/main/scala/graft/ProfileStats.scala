package graft

/** Per-batch latency statistics for the closed-loop serving profiles —
  * the reference publishes avg and p99 latency per batch alongside qps
  * (BASELINE.md "HNSW sample latency (avg / p99 per 100-query batch)";
  * results_5010000vecs_low_rated.csv:2), so the scale record mirrors
  * both columns for the local tiers. */
object ProfileStats {

  /** (avgMs, p99Ms) over a closed-loop pass's per-batch seconds.
    * p99 is nearest-rank on the sorted sample: the smallest latency
    * that is >= 99% of batches — the convention that never
    * interpolates past an observed value (a 100-batch pass reports
    * its 99th-smallest batch, a 1000-batch pass its 990th). */
  def latencyMs(batchSecs: Array[Double]): (Double, Double) = {
    require(batchSecs.nonEmpty, "latencyMs needs at least one batch")
    val s = batchSecs.sorted
    val avg = s.sum / s.length * 1000.0
    val idx = math.max(0, math.ceil(0.99 * s.length).toInt - 1)
    (avg, s(idx) * 1000.0)
  }

  /** Run `loop` once per pass, timing every batch; returns the pass
    * with the smallest total wall (best-of, the profiles' standard)
    * as (totalSec, perBatchSecs). `loop` receives a timer that the
    * caller invokes around each batch body. */
  def bestPass(passes: Int)(loop: ((=> Unit) => Unit) => Unit)
      : (Double, Array[Double]) = {
    require(passes >= 1)
    (1 to passes).map { _ =>
      val lats = Array.newBuilder[Double]
      val t0 = System.nanoTime()
      loop { body =>
        val b0 = System.nanoTime()
        body
        lats += (System.nanoTime() - b0) / 1e9
      }
      ((System.nanoTime() - t0) / 1e9, lats.result())
    }.minBy(_._1)
  }

  /** THE closed-loop measurement every serving profile runs: cover
    * the whole query array in `bs`-sized batches, best of `passes`
    * passes, returning (qps, avg batch ms, p99 batch ms) — one
    * definition so the batch-timing convention can never drift
    * between harnesses. */
  def closedLoop(qArr: Array[(Long, Array[Float])], bs: Int,
      passes: Int = 2)(call: Array[(Long, Array[Float])] => Unit)
      : (Double, Double, Double) = {
    val (best, lats) = bestPass(passes) { timeBatch =>
      var off = 0
      while (off < qArr.length) {
        val batch = java.util.Arrays.copyOfRange(qArr, off,
          math.min(off + bs, qArr.length))
        timeBatch { call(batch) }
        off += bs
      }
    }
    val (avgMs, p99Ms) = latencyMs(lats)
    (qArr.length / best, avgMs, p99Ms)
  }
}
