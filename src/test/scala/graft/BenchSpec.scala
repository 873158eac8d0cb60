package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's cross-round calibration arithmetic — pure
  * integer/double logic pinned apart from the (wall-clock) main. */
class BenchSpec extends AnyFunSuite {

  test("calibDrift: odd-length ratio vector takes the middle ratio") {
    // ratios 2.0, 4.0, 3.0 -> sorted (2, 3, 4) -> median 3.0
    assert(Bench.calibDrift(Seq(2.0, 8.0, 3.0), Seq(1.0, 2.0, 1.0),
      -1.0, -1.0) == 3.0)
  }

  test("calibDrift: even-length ratio vector averages the middle " +
      "pair (r15 fix pin — upper-middle would bias the drift high)") {
    // ratios 2.0 and 4.0 -> true median 3.0 (upper-middle says 4.0)
    assert(Bench.calibDrift(Seq(2.0, 8.0), Seq(1.0, 2.0),
      -1.0, -1.0) == 3.0)
    // four components, ratios (1, 2, 4, 8) -> (2 + 4) / 2 = 3.0
    assert(Bench.calibDrift(Seq(1.0, 2.0, 4.0, 8.0),
      Seq(1.0, 1.0, 1.0, 1.0), -1.0, -1.0) == 3.0)
    // a failed probe (<= 0 on either side) drops its component and
    // can leave an even-length vector: (2, -, 4) -> (2 + 4) / 2
    assert(Bench.calibDrift(Seq(2.0, -1.0, 8.0), Seq(1.0, 5.0, 2.0),
      -1.0, -1.0) == 3.0)
    assert(Bench.calibDrift(Seq(2.0, 3.0, 8.0), Seq(1.0, -1.0, 2.0),
      -1.0, -1.0) == 3.0)
  }

  test("calibDrift: falls back to the scalar ratio, then to -1") {
    assert(Bench.calibDrift(Seq(-1.0), Seq(-1.0), 4.0, 2.0) == 2.0)
    assert(Bench.calibDrift(Seq.empty, Seq.empty, 4.0, 2.0) == 2.0)
    assert(Bench.calibDrift(Seq.empty, Seq.empty, 4.0, -1.0) == -1.0)
    assert(Bench.calibDrift(Seq.empty, Seq.empty, -1.0, 2.0) == -1.0)
  }

  test("ProfileStats.latencyMs: avg and nearest-rank p99 (the scale " +
      "record's per-batch latency columns)") {
    // 100 batches of 1ms..100ms: avg 50.5ms, p99 = 99th smallest = 99ms
    val s = (1 to 100).map(_ / 1000.0).toArray
    val (avg, p99) = ProfileStats.latencyMs(s)
    assert(math.abs(avg - 50.5) < 1e-9 && math.abs(p99 - 99.0) < 1e-9)
    // small sample: nearest rank never interpolates past an observed
    // value — 3 batches -> ceil(2.97) = 3rd smallest (the max)
    val (a3, p3) = ProfileStats.latencyMs(Array(0.002, 0.001, 0.004))
    assert(math.abs(a3 - 7.0 / 3) < 1e-9 && math.abs(p3 - 4.0) < 1e-9)
    // one batch: avg == p99 == that batch
    val (a1, p1) = ProfileStats.latencyMs(Array(0.005))
    assert(a1 == 5.0 && p1 == 5.0)
    intercept[IllegalArgumentException] {
      ProfileStats.latencyMs(Array.emptyDoubleArray)
    }
  }

  test("ProfileStats.bestPass: picks the minimum-total pass and " +
      "returns its per-batch samples") {
    var pass = 0
    val (total, lats) = ProfileStats.bestPass(2) { timeBatch =>
      pass += 1
      // both passes run 3 batches; the second pass is "faster"
      // (fewer spins), so bestPass must return ITS samples
      val spins = if (pass == 1) 2000000 else 1
      (1 to 3).foreach { _ =>
        timeBatch { var i = 0; var x = 0L
          while (i < spins) { x += i; i += 1 }
          if (x == -1) println(x) }
      }
    }
    assert(pass == 2 && lats.length == 3)
    assert(math.abs(total - lats.sum) < 0.25) // loop overhead only
  }
}
