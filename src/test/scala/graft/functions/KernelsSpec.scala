package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function kernel tests — no Spark (SURVEY.md §5 unit tier). */
class KernelsSpec extends AnyFunSuite {

  test("rbf peaks at the center and is symmetric") {
    assert(Kernels.rbf(0, 0, 1800) > Kernels.rbf(0, 1000, 1800))
    assert(Kernels.rbf(0, 500, 1800) == Kernels.rbf(500, 0, 1800))
  }

  test("sigmoid is odd around 0 and bounded by p1/2") {
    val s = Kernels.sigmoid(5.0, 16, 0.2)
    assert(math.abs(Kernels.sigmoid(0, 16, 0.2)) < 1e-12)
    assert(math.abs(s + Kernels.sigmoid(-5.0, 16, 0.2)) < 1e-12)
    assert(math.abs(s) < 8.0)
  }

  test("haversine: zero for identical points, known Shenzhen-ish distance") {
    assert(Kernels.haversineKm(22.5, 114.0, 22.5, 114.0) == 0.0)
    val d = Kernels.haversineKm(22.543, 114.058, 22.617, 114.123) // ~10.6 km
    assert(d > 9 && d < 12)
  }

  test("isSubsequence: ordered, non-contiguous, boundary cases") {
    assert(Kernels.isSubsequence(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")))
    assert(!Kernels.isSubsequence(Seq("c", "b", "a"), Seq("a", "b")))
    assert(Kernels.isSubsequence(Seq("a"), Seq.empty))
    assert(!Kernels.isSubsequence(Seq.empty, Seq("a")))
  }

  test("kdeCenters finds two well-separated time-of-day habits") {
    // morning ~8h, evening ~18h commute clusters
    val morning = Array.tabulate(20)(i => 8 * 3600.0 + i * 60)
    val evening = Array.tabulate(20)(i => 18 * 3600.0 + i * 60)
    val centers = Kernels.kdeCenters((morning ++ evening).sorted, h = 1800, zThreshold = 1.0)
    assert(centers.length >= 2)
    assert(centers.exists(c => math.abs(c - 8.2 * 3600) < 3600))
    assert(centers.exists(c => math.abs(c - 18.2 * 3600) < 3600))
  }

  test("kdeCenters degenerate inputs") {
    assert(Kernels.kdeCenters(Array.empty).isEmpty)
    assert(Kernels.kdeCenters(Array(42.0)).sameElements(Array(42.0)))
    assert(Kernels.kdeCenters(Array.fill(5)(100.0)).length == 1)
  }

  test("assignToCenters: nearest within dc, else 0") {
    val centers = Array(1000.0, 5000.0)
    assert(Kernels.assignToCenters(1200, centers, dc = 5400) == 1)
    assert(Kernels.assignToCenters(4800, centers, dc = 5400) == 2)
    assert(Kernels.assignToCenters(50000, centers, dc = 5400) == 0)
  }

  test("kdeCenters is deterministic for a fixed (sorted) input") {
    val times = Array(100.0, 200.0, 300.0, 30000.0, 30100.0)
    val a = Kernels.kdeCenters(times)
    val b = Kernels.kdeCenters(times)
    assert(a.sameElements(b))
  }
}
