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

  test("sessionizeOD: gap splits, endpoints tracked in order") {
    val evs = Seq(
      (0L, "a"), (1000L, "b"), (2000L, "c"), // session 1: a→c
      (2000L + 1800001L, "x"), (2000L + 1800001L + 1000L, "y")) // gap > 30 min → session 2
    val s = Kernels.sessionizeOD(evs, 1800000L)
    assert(s.length == 2)
    assert(s(0) == Kernels.SessionOD("a", "c", 0L, 2000L))
    assert(s(1).first == "x" && s(1).last == "y")
    assert(Kernels.sessionizeOD(Seq.empty, 1800000L).isEmpty)
    assert(Kernels.sessionizeOD(Seq((5L, "z")), 1800000L) ==
      Vector(Kernels.SessionOD("z", "z", 5L, 5L)))
  }

  test("modalOD: majority wins, ties break lexicographically") {
    def s(f: String, l: String) = Kernels.SessionOD(f, l, 0, 1)
    assert(Kernels.modalOD(Seq(s("a", "b"), s("a", "b"), s("c", "d"))) == ("a", "b"))
    assert(Kernels.modalOD(Seq(s("c", "d"), s("a", "b"))) == ("a", "b")) // tie → lex
  }

  test("completeTrips: 4 cases — full match, missing head, missing tail, both") {
    def s(f: String, l: String, st: Long, en: Long) = Kernels.SessionOD(f, l, st, en)
    val modal = ("origin", "dest")
    val headI = Kernels.odIntervalMs("origin", "mid") // modal-origin → observed-first
    val tailI = Kernels.odIntervalMs("mid", "dest")   // observed-last → modal-dest
    val out = Kernels.completeTrips(Seq(
      s("origin", "dest", 100, 200), // exact pattern: untouched
      s("mid", "dest", 100, 200),    // missing head
      s("origin", "mid", 100, 200),  // missing tail
      s("mid", "mid", 100, 200)),    // missing both
      modal)
    assert(out(0) == (100L, 200L, false))
    assert(out(1) == (100L - headI, 200L, true))
    assert(out(2) == (100L, 200L + tailI, true))
    assert(out(3) == (100L - headI, 200L + tailI, true))
    // interval dim is deterministic and positive
    assert(headI >= 300000L && headI <= 700000L)
  }

  test("kdeCentersInt agrees structurally with the gaussian spec on separated habits") {
    val morning = Array.tabulate(20)(i => 8L * 3600 + i * 60)
    val evening = Array.tabulate(20)(i => 18L * 3600 + i * 60)
    val times = (morning ++ evening).sorted
    val intC = Kernels.kdeCentersInt(times, h = 1800L, z = 1L)
    val gauC = Kernels.kdeCenters(times.map(_.toDouble), h = 1800.0, zThreshold = 1.0)
    assert(intC.length >= 2)
    // both variants place a center inside each habit window
    for (habit <- Seq(8.2 * 3600, 18.2 * 3600)) {
      assert(intC.exists(c => math.abs(c - habit) < 3600), s"int variant missed $habit")
      assert(gauC.exists(c => math.abs(c - habit) < 3600), s"gaussian spec missed $habit")
    }
  }

  test("kdeCentersInt degenerate inputs mirror the gaussian spec") {
    assert(Kernels.kdeCentersInt(Array.empty).isEmpty)
    assert(Kernels.kdeCentersInt(Array(42L)).sameElements(Array(42L)))
    assert(Kernels.kdeCentersInt(Array.fill(5)(100L)).length == 1)
    // two points, equal density: var=0 path → single argmax-density center
    assert(Kernels.kdeCentersInt(Array(100L, 50000L)).length == 1)
  }

  test("kdeCentersInt span guard fails loud even where the bound product would wrap int64") {
    // span 2e18: z·n·2·span = 1.6e19 wraps NEGATIVE in int64, so a naive
    // product-form require would pass exactly in the regime it must
    // reject; the division-form guard still fires
    intercept[IllegalArgumentException] {
      Kernels.kdeCentersInt(Array(0L, 2000000000000000000L), h = 1800L, z = 2L)
    }
    // and an epoch-millisecond-scale span is rejected without wrapping
    intercept[IllegalArgumentException] {
      Kernels.kdeCentersInt(Array(0L, 1700000000000L), h = 1800L, z = 2L)
    }
  }

  test("assignToCentersInt: nearest center VALUE within dc, ties to larger, -1 outside") {
    val centers = Array(1000L, 5000L)
    assert(Kernels.assignToCentersInt(1200L, centers) == 1000L)
    assert(Kernels.assignToCentersInt(4800L, centers) == 5000L)
    assert(Kernels.assignToCentersInt(3000L, centers) == 5000L) // tie → larger (walk order)
    assert(Kernels.assignToCentersInt(50000L, centers) == -1L)
  }

  test("pattern-conditional completion differs from global-modal completion (W5→W6)") {
    // a user with TWO habits: morning a→b (3 trips), evening c→d (2 trips),
    // plus one PARTIAL evening trip observed c→x.
    // Global modal = (a,b): the partial evening trip would complete toward
    // b. Pattern completion assigns it to the evening KDE cluster, whose
    // modal is (c,d) → completes toward d — a different tail extension.
    val day = 86400000L
    def sess(f: String, l: String, sod: Long, d: Int) =
      Kernels.SessionOD(f, l, d * day + sod * 1000L, d * day + sod * 1000L + 600000L)
    val sessions = Vector(
      sess("a", "b", 8 * 3600, 0), sess("a", "b", 8 * 3600 + 60, 1), sess("a", "b", 8 * 3600 + 120, 2),
      sess("c", "d", 18 * 3600, 0), sess("c", "d", 18 * 3600 + 60, 1),
      sess("c", "x", 18 * 3600 + 120, 2))
    val globalModal = Kernels.modalOD(sessions)
    assert(globalModal == ("a", "b"))
    val sods = sessions.map(s => (s.startMs / 1000L) % 86400L).toArray
    val centers = Kernels.kdeCentersInt(sods.clone().sorted, 1800L, 1L)
    val clusters = sods.map(Kernels.assignToCentersInt(_, centers))
    val partialCluster = clusters(5)
    assert(partialCluster >= 0L, "partial trip must land in the evening cluster")
    val clusterModal = Kernels.modalOD(
      clusters.zip(sessions).filter(_._1 == partialCluster).map(_._2))
    assert(clusterModal == ("c", "d"))
    val global = Kernels.completeTrips(Seq(sessions(5)), globalModal).head
    val pattern = Kernels.completeTrips(Seq(sessions(5)), clusterModal).head
    assert(global != pattern, "the two completion policies must diverge here")
    // pattern completion keeps the head (first == cluster origin c) and
    // extends the tail toward d; global-modal would also move the head
    assert(pattern._1 == sessions(5).startMs && pattern._2 > sessions(5).endMs)
    assert(global._1 < sessions(5).startMs)
  }

  test("kdeCenters is deterministic for a fixed (sorted) input") {
    val times = Array(100.0, 200.0, 300.0, 30000.0, 30100.0)
    val a = Kernels.kdeCenters(times)
    val b = Kernels.kdeCenters(times)
    assert(a.sameElements(b))
  }
}
