package graft

import org.scalatest.funsuite.AnyFunSuite

/** The census-vetted scaling estimator (Bench.officialEstimate) is the
  * OFFICIAL gate evidence — its veto/median behavior is pinned here, not
  * asserted in prose. No SparkSession needed: the estimator is pure.
  */
class BenchEstimatorSpec extends AnyFunSuite {

  private def leg(threads: Int, rep: Int, wall: Double, cpu: Double) =
    Bench.Leg(threads, rep, docs = 600000L, wall = wall, jobs = 33L,
      taskSec = cpu * 1.02, cpuSec = cpu)

  test("quiet legs: min wall per side, no vetoes, median of pairs") {
    val legs = Seq(
      leg(1, 0, 250, 230), leg(4, 0, 80, 260),
      leg(1, 1, 245, 228), leg(4, 1, 78, 255),
      leg(1, 2, 252, 231), leg(4, 2, 82, 262))
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.vetoed.isEmpty)
    assert(e.bestN.wall == 245 && e.best4.wall == 78)
    assert(math.abs(e.efficiency - 245.0 / (4 * 78)) < 1e-12)
    assert(e.pairEffs.size == 3)
    // median of {250/320, 245/312, 252/328} — the middle is rep 0's pair
    assert(math.abs(e.pairMedian - 250.0 / (4 * 80)) < 1e-12)
  }

  test("a cpu-inflated leg is vetoed even when its wall is the minimum") {
    // rep-1 4N leg rode a polluted window: fastest wall by luck of a
    // different bottleneck mix, but 1.4x the quiet CPU — the official
    // pick must use the quiet leg's wall
    val legs = Seq(
      leg(1, 0, 250, 230),
      leg(4, 0, 80, 260),
      leg(4, 1, 76, 370), // inflated: 370 > 1.25 * 260
      leg(4, 2, 84, 266))
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.vetoed == Set((4, 1)))
    assert(e.best4.wall == 80)
  }

  test("min-CPU leg never vetoes itself: each side keeps at least one leg") {
    // every 4N leg polluted, each worse than the last — the least-bad one
    // survives by construction
    val legs = Seq(
      leg(1, 0, 250, 230),
      leg(4, 0, 95, 400), leg(4, 1, 110, 520), leg(4, 2, 120, 600))
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.vetoed == Set((4, 1), (4, 2)))
    assert(e.best4.wall == 95)
  }

  test("pair median ignores a wholly polluted interleaved round") {
    val legs = Seq(
      leg(1, 0, 250, 230), leg(4, 0, 78, 258),   // quiet round: 0.801
      leg(1, 1, 320, 300), leg(4, 1, 130, 480),  // polluted round: 0.615
      leg(1, 2, 248, 229), leg(4, 2, 79, 260))   // quiet round: 0.785
    val e = Bench.officialEstimate(legs, 1, 1.25)
    val quiet = Seq(250.0 / (4 * 78), 248.0 / (4 * 79), 320.0 / (4 * 130)).sorted
    assert(math.abs(e.pairMedian - quiet(1)) < 1e-12)
    // and the polluted round's legs are both vetoed from the official pick
    assert(e.vetoed.contains((1, 1)) && e.vetoed.contains((4, 1)))
    // the VETTED median excludes the polluted pair entirely: mean of the
    // two quiet pairs
    val vetted = Seq(250.0 / (4 * 78), 248.0 / (4 * 79)).sorted
    assert(e.pairEffsVetted.size == 2)
    assert(math.abs(e.pairMedianVetted - (vetted(0) + vetted(1)) / 2.0) < 1e-12)
  }

  test("a single vetoed 4N leg cannot drag the vetted median below the raw one") {
    // the round-4 driver artifact's case: one load-polluted 4N leg (quiet
    // N partner) pulls its pair to ~0.33 and the 3-pair raw median under
    // the gate; the vetted median must ignore exactly that pair
    val legs = Seq(
      leg(1, 0, 250, 230), leg(4, 0, 190, 740),  // polluted 4N: pair 0.33
      leg(1, 1, 245, 228), leg(4, 1, 75, 260),   // quiet: 0.817
      leg(1, 2, 252, 231), leg(4, 2, 77, 262))   // quiet: 0.818
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.vetoed == Set((4, 0)))
    assert(e.pairEffs.size == 3 && e.pairEffsVetted.size == 2)
    assert(e.pairMedianVetted > 0.8, s"vetted median ${e.pairMedianVetted}")
    assert(e.pairMedian < e.pairMedianVetted)
  }

  test("all pairs touched by vetoes: vetted list falls back to the raw pairs") {
    val legs = Seq(
      leg(1, 0, 250, 230), leg(4, 0, 90, 400),
      leg(1, 1, 260, 240), leg(4, 1, 95, 420),
      leg(4, 2, 80, 262)) // the only quiet 4N leg is unpaired
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.pairEffsVetted == e.pairEffs)
    assert(e.best4.wall == 80) // official pick still uses the quiet leg
  }

  test("asymmetric reps: unpaired 4N legs still feed the official pick, not the pairs") {
    val legs = Seq(
      leg(1, 0, 250, 230), leg(4, 0, 85, 262),
      leg(4, 1, 77, 259), leg(4, 2, 88, 270))
    val e = Bench.officialEstimate(legs, 1, 1.25)
    assert(e.pairEffs.size == 1) // only rep 0 is paired
    assert(e.best4.wall == 77)   // but the unpaired quiet leg wins the pick
  }
}
