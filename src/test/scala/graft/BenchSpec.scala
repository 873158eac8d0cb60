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
}
