package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pair-validity rule (r6): the internal-consistency gate must reject
  * physically impossible pairs — VERDICT r5 "what's wrong" #1: an
  * efficiency-0.115 pair with t_4N 12.25 s vs t_full 6.88 s passed as
  * valid AND clean and dragged every median it touched. */
class ScalePairValiditySpec extends AnyFunSuite {

  private def res(tAlone: Double, t4N: Double, tFull: Double,
                  checksum: Boolean = true) =
    ScalePair.Result(
      nDocsPerSec = 1.0, n4DocsPerSec = 4.0,
      efficiency = tAlone / t4N, strongEfficiency = tFull / (4.0 * t4N),
      checksumMatch = checksum, tAlone = tAlone, t4N = t4N, tFull = tFull)

  test("a normal pair stays valid") {
    assert(res(1.42, 1.62, 9.85).valid) // a real r5 history row (eff 0.878)
  }

  test("the r5 impossible pair (t_4N far above t_full) is rejected") {
    assert(!res(1.41, 12.25, 6.88).valid) // eff 0.115, 'clean' steal markers
  }

  test("the t_4N <= 1.1*t_full boundary") {
    assert(res(1.0, 2.2, 2.0).valid)   // exactly 1.1x — tolerated
    assert(!res(1.0, 2.3, 2.0).valid)  // beyond — impossible as contention
  }

  test("pre-existing gates still apply") {
    assert(!res(2.0, 1.0, 4.0).valid)          // eff 2.0 > 1.05 (steal-hit alone leg)
    assert(!res(1.4, 1.6, 9.0, checksum = false).valid)
  }
}
