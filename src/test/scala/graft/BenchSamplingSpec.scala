package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit lock for the Bench stall defense (round 13, VERDICT r12 item 1).
  *
  * The defense only fires on genuinely noisy windows, so these edge cases
  * never run in a normal bench — the spec is where they are pinned. The
  * r12 poisoned profiles are replayed literally: each must trigger
  * re-sampling and, with two floor-priced extra samples, report its floor
  * instead of the stall-contaminated median.
  */
class BenchSamplingSpec extends AnyFunSuite {
  import BenchSampling._

  test("median: odd, even, singleton") {
    assert(median(Seq(3.0)) == 3.0)
    assert(median(Seq(1.0, 9.0, 2.0)) == 2.0)
    assert(median(Seq(1.0, 2.0, 3.0, 10.0)) == 2.5)
  }

  test("stall suspicion needs BOTH >2.5x spread and >1s absolute") {
    // fast-query jitter: 5x spread but 0.4s absolute — must NOT trigger
    assert(!stallSuspected(Seq(0.1, 0.3, 0.5)))
    // slow drift: 2s absolute but <2.5x spread — must NOT trigger
    assert(!stallSuspected(Seq(2.0, 3.0, 4.0)))
    // genuine stall shape: both conditions
    assert(stallSuspected(Seq(1.0, 1.2, 4.0)))
    assert(!stallSuspected(Seq(2.0)))
  }

  test("clean queries keep the plain median (record continuity)") {
    assert(reported(Seq(1.0, 2.0, 3.0), fired = false) == 2.0)
  }

  test("fired defense drops the single worst sample") {
    // 5 samples (3 + 2 extra): drop 10.0, median of [1.0,1.1,1.2,1.3] = 1.15
    assert(reported(Seq(1.0, 10.0, 1.2, 1.1, 1.3), fired = true) == 1.15)
  }

  test("fired defense applies even when every extra execution failed") {
    // The r13 review finding: extras can fail (takeWhile drops them); the
    // flag — not the sample count — must key the drop-max, or the report
    // silently falls back to the exact poisoned median. [0.89, 3.15, 4.36]
    // with no surviving extras: drop 4.36 -> median(0.89, 3.15) = 2.02,
    // not the poisoned 3.15.
    assert(reported(Seq(0.89, 3.15, 4.36), fired = true) == 2.02)
  }

  test("the r12 poisoned profiles re-sample to their floors") {
    val profiles = Seq(
      ("q159", Seq(6.30, 89.30, 7.47), Seq(7.0, 7.2), 7.1),   // drop 89.3 → med(6.3,7.0,7.2,7.47)
      ("q167", Seq(4.23, 12.46, 7.77), Seq(4.0, 4.3), 4.265), // drop 12.46 → med(4.0,4.23,4.3,7.77)
      ("q219", Seq(0.89, 3.15, 4.36), Seq(0.9, 0.92), 0.91))  // drop 4.36 → med(0.89,0.9,0.92,3.15)
    for ((name, first, extra, want) <- profiles) {
      assert(stallSuspected(first), s"$name must trigger the defense")
      val got = reported(first ++ extra, fired = true)
      assert(math.abs(got - want) < 1e-9,
        s"$name: reported $got, want $want")
      // and in every case the defended number is far below the poisoned
      // median-of-3 that reached the r12 driver record
      assert(got < median(first), s"$name: defense must beat the raw median")
    }
  }
}
