package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench.ScalingRun

/** Run selection behind the scaling efficiency of record (Bench part 2):
 * capability per level = the FASTEST run over all runs — host interference
 * can only lower a run's throughput, so a fast run is genuine evidence no
 * matter what its bracketing probes saw (a phase edge can land between a
 * probe and the run it brackets; the round-3 driver session recorded a
 * 9.3 s query as 43.1 s under the old quiet-only rule). Probe-quiet counts
 * are published as the audit trail, and Bench.main's adaptive retries keep
 * measuring a level until it has at least one probe-quiet run, so no
 * level's reading is hostage to a single throttle phase. Pure logic — no
 * SparkSession needed. */
class BenchSelectSpec extends AnyFunSuite {

  private val minProbe = 500.0
  private def quietRun(g: Double) = ScalingRun(g, 10.0, 505.0, 510.0)
  private def slowRun(g: Double) = ScalingRun(g, 30.0, 1500.0, 1480.0)

  test("fastest run wins regardless of its probe state") {
    val (best, nQuiet) = Bench.pickRun(
      Seq(slowRun(0.9), quietRun(0.4), quietRun(0.5)), minProbe)
    assert(best.gteps == 0.9)
    assert(nQuiet == 2)
  }

  test("all-throttled level still reports its best plus a zero quiet count") {
    val (best, nQuiet) = Bench.pickRun(Seq(slowRun(0.2), slowRun(0.3)), minProbe)
    assert(best.gteps == 0.3)
    assert(nQuiet == 0) // the zero is what triggers main()'s adaptive retries
  }

  test("audit: a run counts as quiet only when BOTH bracketing probes pass") {
    val headThrottled = ScalingRun(0.9, 10.0, minProbe * Bench.QuietFactor + 1, 505.0)
    val tailThrottled = ScalingRun(0.8, 10.0, 505.0, minProbe * Bench.QuietFactor + 1)
    val boundary = ScalingRun(0.1, 10.0, minProbe * Bench.QuietFactor, 505.0)
    val (best, nQuiet) = Bench.pickRun(
      Seq(headThrottled, tailThrottled, boundary), minProbe)
    assert(best.gteps == 0.9)
    assert(nQuiet == 1) // only the boundary run (probe exactly at the floor)
  }
}
