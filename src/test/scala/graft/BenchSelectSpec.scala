package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench.ScalingRun

/** The probe-filtered run selection behind the scaling efficiency of
 * record (Bench part 2): a throttled run must never be chosen as the
 * capability estimate while a probe-verified full-speed run exists, even
 * if the throttled run's GTEPS happens to be higher (possible when the
 * throttle hits the probe window but not the run, or vice versa on the
 * other leg). Pure logic — no SparkSession needed. */
class BenchSelectSpec extends AnyFunSuite {

  private val minProbe = 500.0
  private def quietRun(g: Double) = ScalingRun(g, 10.0, 505.0, 510.0)
  private def slowRun(g: Double) = ScalingRun(g, 30.0, 1500.0, 1480.0)

  test("quiet runs are preferred even over faster throttled runs") {
    val (best, nQuiet) = Bench.pickRun(
      Seq(slowRun(0.9), quietRun(0.4), quietRun(0.5)), minProbe)
    assert(best.gteps == 0.5)
    assert(nQuiet == 2)
  }

  test("falls back to unfiltered best when no run is quiet") {
    val (best, nQuiet) = Bench.pickRun(Seq(slowRun(0.2), slowRun(0.3)), minProbe)
    assert(best.gteps == 0.3)
    assert(nQuiet == 0)
  }

  test("a run is throttled if EITHER bracketing probe is slow") {
    val headThrottled = ScalingRun(0.9, 10.0, minProbe * Bench.QuietFactor + 1, 505.0)
    val tailThrottled = ScalingRun(0.8, 10.0, 505.0, minProbe * Bench.QuietFactor + 1)
    val boundary = ScalingRun(0.1, 10.0, minProbe * Bench.QuietFactor, 505.0)
    val (best, nQuiet) = Bench.pickRun(
      Seq(headThrottled, tailThrottled, boundary), minProbe)
    assert(best.gteps == 0.1) // boundary probe (exactly at the floor) counts as quiet
    assert(nQuiet == 1)
  }
}
