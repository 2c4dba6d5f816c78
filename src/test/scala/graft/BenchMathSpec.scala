package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's reporting arithmetic — the statistics the round artifact is
  * built from. These paths only execute under failure/noise conditions in
  * a real bench run, so they are pinned here instead. */
class BenchMathSpec extends AnyFunSuite {

  test("median: odd, even, single") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("medianValid ignores -1 failure markers but keeps the failure flag") {
    // a late-round transient failure must not poison two good runs
    assert(Bench.medianValid(Seq(1.1, 1.2, -1.0)) == 1.15)
    assert(Bench.medianValid(Seq(0.5, -1.0, 0.7)) == 0.6)
    // no valid runs -> the driver-visible -1 flag
    assert(Bench.medianValid(Seq(-1.0)) == -1.0)
    assert(Bench.medianValid(Nil) == -1.0)
  }

  test("highVarianceLine fires only on >4x valid-run dispersion") {
    assert(Bench.highVarianceLine("q", Seq(0.4, 0.42, 0.45)).isEmpty)
    assert(Bench.highVarianceLine("q", Seq(0.4, 0.42, 10.9)).exists(
      l => l.contains("HIGH VARIANCE q") && l.contains("TimeProbe")))
    // exactly the r7 phantom shape: a noise window owning two of three runs
    assert(Bench.highVarianceLine("q30", Seq(1.16, 10.92, 16.10)).isDefined)
    // failure markers are excluded from the ratio, not treated as ~0 floors
    assert(Bench.highVarianceLine("q", Seq(-1.0, 0.5, 0.6)).isEmpty)
    // single valid run: no dispersion to judge
    assert(Bench.highVarianceLine("q", Seq(-1.0, 0.5)).isEmpty)
  }
}
