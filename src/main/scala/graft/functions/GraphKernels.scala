package graft.functions

import scala.collection.mutable

/** Pure single-cluster graph kernels for the post-clustering audit
  * ([[graft.operators.ClusterAudit]]): bridge detection and greedy
  * weak-bridge repair over one cluster's accepted-edge graph.
  *
  * Per-cluster graphs are small by construction — cluster size is bounded
  * by entity size, and inside hot blocks the accepted-pair set is
  * sub-quadratic (refinement + chains) — so these run inside a per-group
  * kernel, the same "typed kernel where the semantics demand it" slot as
  * the KDE pattern miner (SURVEY.md §2.5 W5). Everything here is pure and
  * deterministic (unit-tested off-Spark in GraphKernelsSpec).
  *
  * Reference analogue: the reference never audits its merges — its
  * conflict veto (AMPI.scala:280,293) runs pair-local BEFORE assignment.
  * This kernel is the post-assignment complement: a single accepted
  * cross-entity pair survives the pair-local veto but shows up
  * structurally as a BRIDGE between two otherwise densely-connected
  * subgraphs.
  */
object GraphKernels {

  /** Indices into `edges` of the bridge edges of the undirected graph on
    * nodes 0..n-1 (an edge is a bridge iff removing it disconnects its
    * component). Iterative Tarjan low-link, O(n + m); parallel edges are
    * handled by tracking the parent EDGE id (a duplicated edge is never a
    * bridge — its twin keeps the endpoints connected).
    */
  def bridges(n: Int, edges: Array[(Int, Int)]): Array[Int] = {
    val m = edges.length
    // CSR adjacency of (neighbor, edgeId)
    val off = new Array[Int](n + 1)
    edges.foreach { case (u, v) => off(u + 1) += 1; off(v + 1) += 1 }
    var i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val adjN = new Array[Int](2 * m)
    val adjE = new Array[Int](2 * m)
    val pos = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) {
      val (u, v) = edges(i)
      adjN(pos(u)) = v; adjE(pos(u)) = i; pos(u) += 1
      adjN(pos(v)) = u; adjE(pos(v)) = i; pos(v) += 1
      i += 1
    }
    val disc = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val parentEdge = Array.fill(n)(-1)
    val ptr = new Array[Int](n)
    val stack = new Array[Int](n)
    val out = mutable.ArrayBuffer.empty[Int]
    var timer = 0
    var root = 0
    while (root < n) {
      if (disc(root) == -1) {
        var top = 0
        stack(0) = root
        disc(root) = timer; low(root) = timer; timer += 1
        ptr(root) = off(root)
        while (top >= 0) {
          val u = stack(top)
          if (ptr(u) < off(u + 1)) {
            val k = ptr(u); ptr(u) += 1
            val v = adjN(k); val e = adjE(k)
            if (e != parentEdge(u)) {
              if (disc(v) == -1) {
                disc(v) = timer; low(v) = timer; timer += 1
                parentEdge(v) = e
                ptr(v) = off(v)
                top += 1; stack(top) = v
              } else if (disc(v) < low(u)) low(u) = disc(v)
            }
          } else {
            top -= 1
            if (top >= 0) {
              val p = stack(top)
              if (low(u) < low(p)) low(p) = low(u)
              if (low(u) > disc(p)) out += parentEdge(u)
            }
          }
        }
      }
      root += 1
    }
    out.toArray
  }

  /** Component label per node — the label is the SMALLEST node index of
    * the component (union-find with union-by-min + path compression), so
    * labels are deterministic and order-isomorphic to the engine's
    * cluster_id = min doc_id semantic once indices sort like doc_ids.
    * Edges with `skip(edgeId)` are ignored.
    */
  def components(n: Int, edges: Array[(Int, Int)], skip: Int => Boolean): Array[Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    var i = 0
    while (i < edges.length) {
      if (!skip(i)) {
        val (u, v) = edges(i)
        val ru = find(u); val rv = find(v)
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      i += 1
    }
    Array.tabulate(n)(find)
  }

  /** Size of `start`'s side when edge `cutEdge` is removed from the graph
    * of active edges (BFS; `cutEdge` must be active).
    */
  private def sideSize(n: Int, edges: Array[(Int, Int)], active: Array[Boolean],
                       cutEdge: Int, start: Int): Int = {
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < edges.length) {
      if (active(i) && i != cutEdge) {
        val (u, v) = edges(i)
        adj(u) += v; adj(v) += u
      }
      i += 1
    }
    val seen = new Array[Boolean](n)
    val queue = mutable.ArrayDeque(start)
    seen(start) = true
    var size = 0
    while (queue.nonEmpty) {
      val u = queue.removeHead()
      size += 1
      adj(u).foreach { v => if (!seen(v)) { seen(v) = true; queue += v } }
    }
    size
  }

  /** Result of [[weakBridgeRepair]]: indices (into the input `edges`) of
    * the cut edges, and the final component label per node (min node index
    * of the component after the cuts).
    */
  final case class RepairOutcome(cutEdges: Array[Int], labels: Array[Int])

  /** Greedy weak-bridge repair: repeatedly cut the single weakest bridge
    * with score < `strong` whose removal leaves BOTH sides with at least
    * `minSide` nodes; stop when no bridge qualifies (or after `maxCuts`).
    *
    * SUPERSEDED as the production kernel by [[weakCutRepair]] (which also
    * cuts PARALLEL weak bridges this single-edge detector cannot see) —
    * kept as the independent test oracle for the singleton-bundle
    * equivalence property (GraphKernelsSpec). Do not wire back into
    * [[graft.operators.ClusterAudit]].
    *
    * The two guards encode the two failure modes they separate:
    *  - `score < strong`: a high-confidence bridge is legitimate sparse
    *    structure (chain/refinement recovery inside capped hot blocks is
    *    bridge-shaped BY DESIGN and its same-entity edges score high);
    *  - both sides ≥ `minSide`: a weak edge attaching a SINGLE noisy doc
    *    to its own entity is recall, not a false merge — cutting it would
    *    re-split the entity the scorer barely held together.
    * A false merge — two multi-doc entities glued by one near-threshold
    * cross-entity pair — passes both guards and is exactly what gets cut.
    *
    * Deterministic: candidates order by (score, endpoint indices); cutting
    * a bridge never creates or destroys other bridges (each side keeps its
    * 2-edge-connected structure), but side SIZES shrink, so bridges are
    * re-derived per round against the surviving graph.
    */
  def weakBridgeRepair(n: Int, edges: Array[(Int, Int)], scores: Array[Double],
                       strong: Double, minSide: Int,
                       maxCuts: Int = Int.MaxValue): RepairOutcome = {
    require(edges.length == scores.length, "edges and scores must align")
    val active = Array.fill(edges.length)(true)
    val cuts = mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done && cuts.length < maxCuts) {
      val liveIdx = edges.indices.filter(active).toArray
      val live = liveIdx.map(edges)
      val cands = bridges(n, live).map(liveIdx)
        .filter(e => scores(e) < strong)
        .sortBy(e => (scores(e), edges(e)._1, edges(e)._2))
      val comp = components(n, edges, i => !active(i))
      val csize = new Array[Int](n)
      comp.foreach(c => csize(c) += 1)
      cands.find { e =>
        val u = edges(e)._1
        val s = sideSize(n, edges, active, e, u)
        s >= minSide && csize(comp(u)) - s >= minSide
      } match {
        case Some(e) => active(e) = false; cuts += e
        case None => done = true
      }
    }
    RepairOutcome(cuts.toArray, components(n, edges, i => !active(i)))
  }

  /** Generalized weak-CUT repair: contract the ≥`strong` edges into CORES
    * (strong-connected doc groups), BUNDLE the surviving weak edges between
    * each pair of distinct cores, and repeatedly cut the bundle that is a
    * bridge of the contracted core graph — weakest bundle first (ordered by
    * its strongest member's score) — provided both resulting sides keep at
    * least `minSide` docs. `maxCuts` counts cut EDGES (a bundle whose size
    * would exceed the remaining budget is skipped, loudly leaving the merge
    * in place rather than half-cutting it).
    *
    * The singleton-bundle case is exactly [[weakBridgeRepair]] (a weak
    * full-graph bridge between two cores IS a one-edge bundle bridging the
    * contracted graph, and intra-core weak edges can never be bridges —
    * their endpoints stay strong-connected). Bundles of size k ≥ 2
    * additionally repair false merges glued by PARALLEL near-threshold
    * pairs, which defeat single-edge bridge detection: each parallel edge
    * keeps the other's endpoints connected, so Tarjan sees no bridge, yet
    * the merge is still held ONLY by sub-`strong` evidence.
    */
  def weakCutRepair(n: Int, edges: Array[(Int, Int)], scores: Array[Double],
                    strong: Double, minSide: Int,
                    maxCuts: Int = Int.MaxValue): RepairOutcome = {
    require(edges.length == scores.length, "edges and scores must align")
    val active = Array.fill(edges.length)(true)
    val cuts = mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done && cuts.length < maxCuts) {
      // cut candidates against the SURVIVING graph (strong edges are never
      // cut, but sides shrink as bundles fall — recompute per round); side
      // doc-counts are precomputed by the candidate DFS, so a round is
      // O(n + m) regardless of how many candidates fail the guard
      val cands = weakCutCandidates(n, edges, scores, strong, i => active(i))
      cands.find(c => cuts.length + c.edges.length <= maxCuts &&
        c.sideA >= minSide && c.sideB >= minSide) match {
        case Some(c) =>
          c.edges.foreach(e => active(e) = false)
          cuts ++= c.edges
        case None => done = true
      }
    }
    RepairOutcome(cuts.toArray, components(n, edges, i => !active(i)))
  }

  /** One cut candidate of [[weakCutRepair]]: the bundle's edge indices and
    * the DOC counts of the two sides its removal separates.
    */
  private final case class CutCandidate(edges: Array[Int], sideA: Int, sideB: Int)

  /** Bundles of active weak (< `strong`) edges between DISTINCT strong-cores
    * that are bridges of the contracted core graph, each with its two side
    * doc-counts — ordered weakest-glue-first by (strongest member's score,
    * bundle size, core key). Strong active edges are intra-core by
    * construction, so the bundles are the contracted graph's ONLY edges,
    * and contracted connectivity equals full-graph connectivity; ONE
    * low-link DFS over the contracted graph therefore yields every
    * candidate's sides (child-subtree doc weight vs component rest) in
    * O(n + m) total — no per-candidate re-traversal of the full graph.
    */
  private def weakCutCandidates(n: Int, edges: Array[(Int, Int)], scores: Array[Double],
                                strong: Double, active: Int => Boolean): Array[CutCandidate] = {
    val core = components(n, edges, i => !active(i) || scores(i) < strong)
    val bundles = mutable.LinkedHashMap.empty[(Int, Int), mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < edges.length) {
      if (active(i) && scores(i) < strong) {
        val cu = core(edges(i)._1); val cv = core(edges(i)._2)
        if (cu != cv) {
          val key = if (cu < cv) (cu, cv) else (cv, cu)
          bundles.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += i
        }
      }
      i += 1
    }
    if (bundles.isEmpty) return Array.empty
    val coreIds = core.distinct.sorted
    val cidx = coreIds.zipWithIndex.toMap
    val k = coreIds.length
    // doc weight per contracted node
    val weight = new Array[Long](k)
    i = 0
    while (i < n) { weight(cidx(core(i))) += 1L; i += 1 }
    val keys = bundles.keys.toArray
    val m = keys.length
    val cEdges = keys.map { case (a, b) => (cidx(a), cidx(b)) }
    // CSR adjacency of the contracted simple graph
    val off = new Array[Int](k + 1)
    cEdges.foreach { case (u, v) => off(u + 1) += 1; off(v + 1) += 1 }
    i = 0
    while (i < k) { off(i + 1) += off(i); i += 1 }
    val adjN = new Array[Int](2 * m)
    val adjE = new Array[Int](2 * m)
    val pos = java.util.Arrays.copyOf(off, k)
    i = 0
    while (i < m) {
      val (u, v) = cEdges(i)
      adjN(pos(u)) = v; adjE(pos(u)) = i; pos(u) += 1
      adjN(pos(v)) = u; adjE(pos(v)) = i; pos(v) += 1
      i += 1
    }
    // iterative low-link DFS carrying subtree doc weights: a contracted
    // edge is a bridge iff low(child) > disc(parent); its child side holds
    // sub(child) docs and the other side total − sub(child)
    val disc = Array.fill(k)(-1)
    val low = new Array[Int](k)
    val parentEdge = Array.fill(k)(-1)
    val ptr = new Array[Int](k)
    val stack = new Array[Int](k)
    val sub = new Array[Long](k)
    val out = mutable.ArrayBuffer.empty[(Int, Long, Long)] // (cEdge, childDocs, totalDocs)
    var timer = 0
    var root = 0
    while (root < k) {
      if (disc(root) == -1) {
        val compBridges = mutable.ArrayBuffer.empty[(Int, Long)]
        var top = 0
        stack(0) = root
        disc(root) = timer; low(root) = timer; timer += 1
        ptr(root) = off(root); sub(root) = weight(root)
        while (top >= 0) {
          val u = stack(top)
          if (ptr(u) < off(u + 1)) {
            val kk = ptr(u); ptr(u) += 1
            val v = adjN(kk); val e = adjE(kk)
            if (e != parentEdge(u)) {
              if (disc(v) == -1) {
                disc(v) = timer; low(v) = timer; timer += 1
                parentEdge(v) = e; ptr(v) = off(v); sub(v) = weight(v)
                top += 1; stack(top) = v
              } else if (disc(v) < low(u)) low(u) = disc(v)
            }
          } else {
            top -= 1
            if (top >= 0) {
              val p = stack(top)
              if (low(u) < low(p)) low(p) = low(u)
              sub(p) += sub(u)
              if (low(u) > disc(p)) compBridges += ((parentEdge(u), sub(u)))
            }
          }
        }
        val total = sub(root)
        compBridges.foreach { case (e, cw) => out += ((e, cw, total)) }
      }
      root += 1
    }
    out.toArray
      .sortBy { case (e, _, _) =>
        val key = keys(e); val es = bundles(key)
        (es.map(scores).max, es.length, key._1, key._2)
      }
      .map { case (e, cw, total) =>
        CutCandidate(bundles(keys(e)).toArray, cw.toInt, (total - cw).toInt)
      }
  }

  /** Cohesion statistics of one cluster's accepted-edge graph (the audit
    * census row): bridge counts separate "dense merge-proof cluster"
    * (nBridges = 0) from "held together by single edges"; nWeakBridges
    * counts the single weak bridges (structural screen, no side-size
    * guard — the existing loose semantic), while nWeakBundles counts the
    * contracted-graph bridge BUNDLES [[weakCutRepair]] would actually cut
    * in its first round (side-size guard APPLIED — pendant-core bundles,
    * ubiquitous in healthy clusters whose weakest doc scores sub-strong
    * against a dense core, read 0 here, so a nonzero census is an
    * actionable repair signal, parallel weak bridges included).
    */
  final case class ClusterStats(nDocs: Int, nEdges: Int, minScore: Double, avgScore: Double,
                                density: Double, nBridges: Int, nWeakBridges: Int,
                                nWeakBundles: Int, connected: Boolean)

  def clusterStats(n: Int, edges: Array[(Int, Int)], scores: Array[Double],
                   strong: Double, minSide: Int = 2): ClusterStats = {
    val br = bridges(n, edges)
    val comp = components(n, edges, _ => false)
    val connected = n == 0 || comp.forall(_ == comp(0))
    val minS = if (scores.isEmpty) 0.0 else scores.min
    val avgS = if (scores.isEmpty) 0.0 else scores.sum / scores.length
    val density = if (n < 2) 1.0 else 2.0 * edges.length / (n.toLong * (n - 1))
    val cuttable = weakCutCandidates(n, edges, scores, strong, _ => true)
      .count(c => c.sideA >= minSide && c.sideB >= minSide)
    ClusterStats(n, edges.length, minS, avgS, density,
      br.length, br.count(e => scores(e) < strong), cuttable, connected)
  }
}
