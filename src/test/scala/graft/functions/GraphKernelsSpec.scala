package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GraphKernelsSpec extends AnyFunSuite {

  private def E(es: (Int, Int)*): Array[(Int, Int)] = es.toArray

  test("bridges: every edge of a path is a bridge") {
    val br = GraphKernels.bridges(4, E(0 -> 1, 1 -> 2, 2 -> 3))
    assert(br.sorted.toSeq == Seq(0, 1, 2))
  }

  test("bridges: a cycle has none") {
    assert(GraphKernels.bridges(3, E(0 -> 1, 1 -> 2, 2 -> 0)).isEmpty)
  }

  test("bridges: two triangles joined by one edge — exactly that edge") {
    val edges = E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3, 2 -> 3)
    assert(GraphKernels.bridges(6, edges).toSeq == Seq(6))
  }

  test("bridges: a parallel (duplicated) edge is never a bridge") {
    assert(GraphKernels.bridges(2, E(0 -> 1, 0 -> 1)).isEmpty)
    // but a genuinely single edge next to the pair still is
    val br = GraphKernels.bridges(3, E(0 -> 1, 0 -> 1, 1 -> 2))
    assert(br.toSeq == Seq(2))
  }

  test("bridges: found independently per component") {
    val br = GraphKernels.bridges(5, E(0 -> 1, 2 -> 3, 3 -> 4))
    assert(br.sorted.toSeq == Seq(0, 1, 2))
  }

  test("components: labels are the component's min node index; skip respected") {
    val edges = E(0 -> 1, 1 -> 2, 3 -> 4, 2 -> 3)
    assert(GraphKernels.components(5, edges, _ => false).toSeq == Seq(0, 0, 0, 0, 0))
    val split = GraphKernels.components(5, edges, _ == 3) // drop 2-3
    assert(split.toSeq == Seq(0, 0, 0, 3, 3))
  }

  private val twoTriangles = E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3, 2 -> 3)

  test("repair: weak bridge between two triangles is cut; sides re-label by min") {
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.65)
    val r = GraphKernels.weakBridgeRepair(6, twoTriangles, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.toSeq == Seq(6))
    assert(r.labels.toSeq == Seq(0, 0, 0, 3, 3, 3))
  }

  test("repair: a strong bridge is trusted structure — never cut") {
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.80)
    val r = GraphKernels.weakBridgeRepair(6, twoTriangles, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.isEmpty)
    assert(r.labels.forall(_ == 0))
  }

  test("repair: a weak PENDANT edge (one-doc side) is recall, not a merge — kept at minSide 2") {
    val edges = E(0 -> 1, 1 -> 2, 2 -> 0, 2 -> 3)
    val scores = Array(0.9, 0.9, 0.9, 0.62)
    val keep = GraphKernels.weakBridgeRepair(4, edges, scores, strong = 0.75, minSide = 2)
    assert(keep.cutEdges.isEmpty)
    val cut = GraphKernels.weakBridgeRepair(4, edges, scores, strong = 0.75, minSide = 1)
    assert(cut.cutEdges.toSeq == Seq(3))
    assert(cut.labels.toSeq == Seq(0, 0, 0, 3))
  }

  test("repair: greedy cuts weakest first; chained weak bridges all fall when sides stay big enough") {
    // A{0,1,2} -(.61)- B{3,4,5} -(.65)- C{6,7,8}
    val edges = E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3,
      6 -> 7, 7 -> 8, 8 -> 6, 2 -> 3, 5 -> 6)
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.61, 0.65)
    val r = GraphKernels.weakBridgeRepair(9, edges, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.toSeq == Seq(9, 10)) // weakest first
    assert(r.labels.toSeq == Seq(0, 0, 0, 3, 3, 3, 6, 6, 6))
    val capped = GraphKernels.weakBridgeRepair(9, edges, scores, strong = 0.75, minSide = 2,
      maxCuts = 1)
    assert(capped.cutEdges.toSeq == Seq(9))
  }

  test("repair: side-size guard re-evaluates against the surviving graph") {
    // path of pairs: {0,1} -(.6)- {2,3} with pair edges strong; the middle
    // bridge qualifies (2 vs 2); after the cut, nothing else can
    val edges = E(0 -> 1, 2 -> 3, 1 -> 2)
    val scores = Array(0.9, 0.9, 0.6)
    val r = GraphKernels.weakBridgeRepair(4, edges, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.toSeq == Seq(2))
    assert(r.labels.toSeq == Seq(0, 0, 2, 2))
  }

  test("clusterStats: counts, density, weak-bridge census") {
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.65)
    val s = GraphKernels.clusterStats(6, twoTriangles, scores, strong = 0.75)
    assert(s.nDocs == 6 && s.nEdges == 7)
    assert(s.nBridges == 1 && s.nWeakBridges == 1 && s.nWeakBundles == 1)
    assert(s.connected)
    assert(math.abs(s.density - 7.0 / 15.0) < 1e-12)
    assert(math.abs(s.minScore - 0.65) < 1e-12)
    val disconnected = GraphKernels.clusterStats(4, E(0 -> 1, 2 -> 3),
      Array(0.9, 0.9), strong = 0.75)
    assert(!disconnected.connected)
  }

  // two triangles glued by TWO parallel weak edges — each keeps the other's
  // endpoints connected, so single-edge Tarjan sees NO bridge
  private val parallelGlue = E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3,
    2 -> 3, 0 -> 5)
  private val parallelScores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.65, 0.62)

  test("cut repair: parallel weak bridges are invisible to bridge repair, cut as one bundle") {
    val blind = GraphKernels.weakBridgeRepair(6, parallelGlue, parallelScores,
      strong = 0.75, minSide = 2)
    assert(blind.cutEdges.isEmpty, "single-edge bridge repair must be blind here")
    val r = GraphKernels.weakCutRepair(6, parallelGlue, parallelScores,
      strong = 0.75, minSide = 2)
    assert(r.cutEdges.sorted.toSeq == Seq(6, 7))
    assert(r.labels.toSeq == Seq(0, 0, 0, 3, 3, 3))
    // the census sees it too: 0 weak bridges but 1 cuttable weak bundle
    val s = GraphKernels.clusterStats(6, parallelGlue, parallelScores, strong = 0.75)
    assert(s.nBridges == 0 && s.nWeakBridges == 0 && s.nWeakBundles == 1)
  }

  test("cut repair: a bundle containing a STRONG parallel edge is trusted, never cut") {
    // same shape but one of the two glue edges is >= strong: the cores
    // merge through it, so there is no weak bundle between distinct cores
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.80, 0.62)
    val r = GraphKernels.weakCutRepair(6, parallelGlue, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.isEmpty)
    assert(r.labels.forall(_ == 0))
  }

  test("cut repair: a weak-bundle CYCLE of cores has no contracted bridge — kept") {
    // three triangles A{0,1,2} B{3,4,5} C{6,7,8} glued pairwise by weak
    // edges forming a cycle: cutting any one bundle leaves the other two
    // connecting its sides
    val edges = E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3,
      6 -> 7, 7 -> 8, 8 -> 6, 2 -> 3, 5 -> 6, 8 -> 0)
    val scores = Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.65, 0.65, 0.65)
    val r = GraphKernels.weakCutRepair(9, edges, scores, strong = 0.75, minSide = 2)
    assert(r.cutEdges.isEmpty)
  }

  test("cut repair: singleton bundles reproduce bridge repair exactly") {
    for ((edges, scores, n) <- Seq(
      (twoTriangles, Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.65), 6),
      (E(0 -> 1, 1 -> 2, 2 -> 0, 3 -> 4, 4 -> 5, 5 -> 3, 6 -> 7, 7 -> 8, 8 -> 6,
        2 -> 3, 5 -> 6),
        Array(0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.61, 0.65), 9),
      (E(0 -> 1, 2 -> 3, 1 -> 2), Array(0.9, 0.9, 0.6), 4),
      (E(0 -> 1, 1 -> 2, 2 -> 0, 2 -> 3), Array(0.9, 0.9, 0.9, 0.62), 4))) {
      val a = GraphKernels.weakBridgeRepair(n, edges, scores, strong = 0.75, minSide = 2)
      val b = GraphKernels.weakCutRepair(n, edges, scores, strong = 0.75, minSide = 2)
      assert(a.cutEdges.sorted.toSeq == b.cutEdges.sorted.toSeq)
      assert(a.labels.toSeq == b.labels.toSeq)
    }
  }

  test("cut repair: maxCuts skips a bundle it cannot cut whole") {
    val r = GraphKernels.weakCutRepair(6, parallelGlue, parallelScores,
      strong = 0.75, minSide = 2, maxCuts = 1)
    assert(r.cutEdges.isEmpty, "a 2-edge bundle must not be half-cut under maxCuts=1")
    assert(r.labels.forall(_ == 0))
  }

  test("cut repair properties: only weak edges fall, sides respect minSide, fixpoint reached") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strong = 0.75
    val minSide = 2
    // random small graphs: n nodes, random edges with mixed weak/strong scores
    val graphGen = for {
      n <- Gen.chooseNum(2, 14)
      m <- Gen.chooseNum(1, 28)
      es <- Gen.listOfN(m, for {
        u <- Gen.chooseNum(0, n - 1)
        v <- Gen.chooseNum(0, n - 1).suchThat(_ != u)
        s <- Gen.oneOf(Gen.chooseNum(0.60, 0.74), Gen.chooseNum(0.76, 0.99))
      } yield (math.min(u, v), math.max(u, v), s))
    } yield (n, es.map(e => (e._1, e._2)).toArray, es.map(_._3).toArray)
    val prop = Prop.forAll(graphGen) { case (n, edges, scores) =>
      val r = GraphKernels.weakCutRepair(n, edges, scores, strong, minSide)
      val cutSet = r.cutEdges.toSet
      // 1) only sub-strong edges are ever cut
      val onlyWeak = r.cutEdges.forall(e => scores(e) < strong)
      // 2) labels are the post-cut components (internal consistency)
      val comp = GraphKernels.components(n, edges, cutSet)
      val labelsOk = r.labels.sameElements(comp)
      // 3) every surviving component that LOST an edge has >= minSide docs
      //    on each side of every cut (both endpoints' final components are
      //    >= minSide when that component has any node beyond itself)
      val csize = new Array[Int](n)
      comp.foreach(c => csize(c) += 1)
      val sidesOk = r.cutEdges.forall { e =>
        val (u, v) = edges(e)
        // a cut separated u's side from v's side at cut time; afterwards
        // both live in components of size >= minSide (later cuts only
        // split sides that THEMSELVES kept >= minSide per side)
        csize(comp(u)) >= minSide && csize(comp(v)) >= minSide
      }
      // 4) fixpoint: re-running repair on the surviving graph cuts nothing
      val surviving = edges.indices.filterNot(cutSet).toArray
      val r2 = GraphKernels.weakCutRepair(n, surviving.map(edges), surviving.map(scores),
        strong, minSide)
      val fixpoint = r2.cutEdges.isEmpty
      onlyWeak && labelsOk && sidesOk && fixpoint
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("cut repair: weak pendant CORE (one-doc side) kept at minSide 2 even via parallel edges") {
    // triangle {0,1,2} with noisy doc 3 attached by TWO weak edges
    val edges = E(0 -> 1, 1 -> 2, 2 -> 0, 2 -> 3, 0 -> 3)
    val scores = Array(0.9, 0.9, 0.9, 0.62, 0.61)
    val keep = GraphKernels.weakCutRepair(4, edges, scores, strong = 0.75, minSide = 2)
    assert(keep.cutEdges.isEmpty)
    val cut = GraphKernels.weakCutRepair(4, edges, scores, strong = 0.75, minSide = 1)
    assert(cut.cutEdges.sorted.toSeq == Seq(3, 4))
    assert(cut.labels.toSeq == Seq(0, 0, 0, 3))
  }
}
