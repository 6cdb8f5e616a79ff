package graft.functions

/** Pure per-group kernels and scalar functions from the reference's
  * semantic core — unit-testable off-Spark (SURVEY.md §5), invoked from
  * typed `mapGroups`/`mapPartitions` stages.
  */
object Kernels {

  /** Gaussian kernel (reference `RBF`, Model.scala:573-575). */
  def rbf(l: Double, x: Double, h: Double): Double =
    math.exp(-math.pow(l - x, 2) / (2 * h * h)) / math.sqrt(2 * math.Pi)

  /** Shifted sigmoid (reference `sigmoidFunction`, SIG.scala:189-192). */
  def sigmoid(v: Double, p1: Double, p2: Double): Double =
    p1 / (1 + math.exp(-v * p2)) - p1 / 2

  /** Haversine great-circle distance in km (reference `getDistance`,
    * SIG.scala:195-204).
    */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * r * math.asin(math.sqrt(a))
  }

  /** Ordered-subsequence test (reference W4 path validation,
    * SplitAPData.scala:110-136): is `pattern` an ordered (not necessarily
    * contiguous) subsequence of `seq`? Two pointers, O(|seq|).
    */
  def isSubsequence[T](seq: Seq[T], pattern: Seq[T]): Boolean = {
    if (pattern.isEmpty) return true
    var pi = 0
    val it = seq.iterator
    while (it.hasNext && pi < pattern.length) {
      if (it.next() == pattern(pi)) pi += 1
    }
    pi == pattern.length
  }

  /** KDE peak-pick pattern mining (reference W5, Model.scala:93-189):
    * given a user's event times-of-day (seconds), compute for each point
    * the gaussian kernel density (bandwidth h) over all points, then the
    * monotonic "relative distance" to the nearest higher-density point
    * (reference `compute_dist`); centers are points whose distance z-score
    * ≥ `zThreshold` (reference `z_score`, z ≥ 3). Returns the center
    * values (deduplicated, sorted). O(n²) in the user's event count — per
    * reference, n per user is tiny, so this stays a per-group kernel.
    */
  def kdeCenters(times: Array[Double], h: Double = 1800.0, zThreshold: Double = 3.0): Array[Double] = {
    val n = times.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(times(0))
    val density = Array.tabulate(n) { i =>
      var s = 0.0; var j = 0
      while (j < n) { s += rbf(times(j), times(i), h); j += 1 }
      s
    }
    // distance to nearest strictly-higher-density point; the global max
    // gets the max pairwise distance (it is always a center candidate)
    val dist = Array.tabulate(n) { i =>
      var best = Double.MaxValue; var j = 0
      while (j < n) {
        if (density(j) > density(i)) {
          val d = math.abs(times(j) - times(i))
          if (d < best) best = d
        }
        j += 1
      }
      best
    }
    val maxFinite = dist.filter(_ != Double.MaxValue) match {
      case a if a.nonEmpty => a.max
      case _ => 1.0
    }
    var i = 0
    while (i < n) { if (dist(i) == Double.MaxValue) dist(i) = math.max(maxFinite, 1.0) * 2; i += 1 }
    val mean = dist.sum / n
    val sd = math.sqrt(dist.map(d => (d - mean) * (d - mean)).sum / n)
    val centers =
      if (sd == 0.0) Array(times(density.indexOf(density.max)))
      else times.indices.collect { case i if (dist(i) - mean) / sd >= zThreshold => times(i) }.toArray
    val out = if (centers.isEmpty) Array(times(density.indexOf(density.max))) else centers
    out.distinct.sorted
  }

  /** INTEGER-EXACT KDE peak-pick (the oracle-facing twin of `kdeCenters`):
    * same peak-pick structure as the reference (density → distance to
    * nearest higher-density point → z-score cut, Model.scala:93-189) but
    * with the Epanechnikov-style kernel max(0, h² − d²) instead of the
    * gaussian — every intermediate is an exact int64, so a SQL oracle
    * reproduces it bit-for-bit (gaussian exp() sums are last-ulp
    * engine-dependent and the peak-pick branches on comparisons of them;
    * see CorpusExpr header for the cross-engine determinism rules).
    *
    * The z-score cut is evaluated WITHOUT division or sqrt:
    *   (dist_i − mean)/sd ≥ z  ⟺  L ≥ 0 ∧ L² ≥ z²·(n·Σd² − S²)
    * where L = n·dist_i − S, S = Σ dist. sd = 0 (all dists equal) and
    * no-center fallbacks mirror kdeCenters: the min time among argmax
    * density. Overflow-safe for n·max(dist) < 3e9 — i.e. n ≤ ~8000 events
    * per user at day-scale times (the per-user kernel contract; the
    * reference's per-user trip counts are tiny).
    *
    * Input must be sorted ascending. Returns distinct sorted centers.
    */
  def kdeCentersInt(times: Array[Long], h: Long = 1800L, z: Long = 2L): Array[Long] = {
    val n = times.length
    // overflow guard (see scaladoc): L² with L ≤ n·2·span must stay in
    // int64 — fail loud rather than silently wrap (a user with more than
    // ~8k events is outside the per-user-kernel contract anyway)
    require(n <= 8000, s"kdeCentersInt: $n events exceed the int64-exact bound (~8000)")
    // the bound also needs day-scale time MAGNITUDES, not just small n:
    // every dist ≤ 2·span (the NoHigher fallback is 2·maxFinite), so the
    // z-cut's z²·varNum ≤ z²·(n·2·span)² stays in int64 iff
    // z·n·2·span < 3e9 — a caller passing epoch-millisecond times must
    // fail loud here, not branch on wrapped values
    if (n >= 2) {
      val span = math.max(times(n - 1) - times(0), 1L)
      // the bound product itself must not wrap (a nanosecond-epoch span
      // can overflow z·n·2·span and sneak PAST the require): compare by
      // division instead of forming the product
      require(span < 3000000000L / (z * n.toLong * 2L),
        s"kdeCentersInt: z·n·2·span ≥ 3e9, the int64-exact bound " +
          s"(n=$n, span=$span, z=$z) — rescale times to day-scale units")
    }
    if (n == 0) return Array.empty
    if (n == 1) return Array(times(0))
    val h2 = h * h
    val density = Array.tabulate(n) { i =>
      var s = 0L; var j = 0
      while (j < n) {
        val d = times(j) - times(i)
        val k = h2 - d * d
        if (k > 0) s += k
        j += 1
      }
      s
    }
    val NoHigher = -1L
    val dist = Array.tabulate(n) { i =>
      var best = NoHigher; var j = 0
      while (j < n) {
        if (density(j) > density(i)) {
          val d = math.abs(times(j) - times(i))
          if (best == NoHigher || d < best) best = d
        }
        j += 1
      }
      best
    }
    var maxFinite = 0L
    var i = 0
    while (i < n) { if (dist(i) != NoHigher && dist(i) > maxFinite) maxFinite = dist(i); i += 1 }
    i = 0
    while (i < n) { if (dist(i) == NoHigher) dist(i) = math.max(maxFinite, 1L) * 2; i += 1 }
    var s = 0L; var q = 0L
    i = 0
    while (i < n) { s += dist(i); q += dist(i) * dist(i); i += 1 }
    val varNum = n * q - s * s // n² · variance, exact
    def argmaxDensityTime: Long = {
      var bi = 0; var j = 1
      while (j < n) { if (density(j) > density(bi)) bi = j; j += 1 }
      times(bi) // times sorted => first argmax = min time among argmax
    }
    val centers =
      if (varNum == 0L) Array(argmaxDensityTime)
      else {
        val c = times.indices.collect {
          case i if {
            val l = n * dist(i) - s
            l >= 0 && l * l >= z * z * varNum
          } => times(i)
        }.toArray
        if (c.isEmpty) Array(argmaxDensityTime) else c
      }
    centers.distinct.sorted
  }

  /** Nearest-center assignment over Long times: center value within `dc`,
    * ties to the LARGER center (matches assignToCenters' walk order);
    * NoCenter (-1) when none is in range.
    */
  def assignToCentersInt(t: Long, centers: Array[Long], dc: Long = 5400L): Long = {
    var best = -1L; var bestD = dc
    var i = 0
    while (i < centers.length) {
      val d = math.abs(t - centers(i))
      if (d <= bestD) { bestD = d; best = centers(i) }
      i += 1
    }
    best
  }

  /** One observed trip/session with its endpoint types and time bounds. */
  final case class SessionOD(first: String, last: String, startMs: Long, endMs: Long)

  /** Sessionize a user's time-sorted (ms, type) events with a fixed gap
    * (reference trip segmentation W3, SplitAPData.scala:62-108 in its
    * simple-threshold form, DivisionAndSampling.scala:33-62).
    * Input MUST be sorted ascending; emits sessions in order.
    */
  def sessionizeOD(events: Seq[(Long, String)], gapMs: Long): Vector[SessionOD] = {
    if (events.isEmpty) return Vector.empty
    val out = Vector.newBuilder[SessionOD]
    var first = events.head._2
    var last = events.head._2
    var start = events.head._1
    var end = events.head._1
    var i = 1
    while (i < events.length) {
      val (ms, tp) = events(i)
      if (ms - end > gapMs) {
        out += SessionOD(first, last, start, end)
        first = tp; start = ms
      }
      last = tp; end = ms
      i += 1
    }
    out += SessionOD(first, last, start, end)
    out.result()
  }

  /** The user's modal OD (most frequent (first,last) endpoint pair across
    * sessions; ties broken lexicographically) — the reference's travel
    * PATTERN the completion step extends observations toward
    * (AFCPattern.scala:108-130).
    */
  def modalOD(sessions: Seq[SessionOD]): (String, String) = {
    require(sessions.nonEmpty)
    sessions.groupBy(s => (s.first, s.last)).toSeq
      .map { case (od, ss) => (od, ss.size) }
      .minBy { case ((f, l), n) => (-n, f, l) }._1
  }

  /** Deterministic synthetic OD travel interval (stands in for the
    * reference's measured OD time-interval dimension,
    * ODTimeInterval.scala:25-39): ms to travel from endpoint type x to y.
    */
  def odIntervalMs(x: String, y: String): Long =
    300000L + 100000L * ((x.length * 7 + y.length) % 5)

  /** W6 trip completion (reference APCompletion.scala:213-261 /
    * Model.scala:363-415): a session whose observed OD is a PARTIAL view of
    * the user's modal pattern is extended to the pattern's full extent
    * using OD-interval arithmetic — missing head: start moves earlier by
    * the modal-origin→observed-origin interval; missing tail: end moves
    * later by the observed-destination→modal-destination interval.
    * Returns (completedStartMs, completedEndMs, wasCompleted) per session,
    * in session order.
    */
  def completeTrips(sessions: Seq[SessionOD], modal: (String, String)): Seq[(Long, Long, Boolean)] = {
    val (mf, ml) = modal
    sessions.map { s =>
      val headExt = if (s.first != mf) odIntervalMs(mf, s.first) else 0L
      val tailExt = if (s.last != ml) odIntervalMs(s.last, ml) else 0L
      (s.startMs - headExt, s.endMs + tailExt, headExt != 0L || tailExt != 0L)
    }
  }

  /** Assign each time to the nearest center within `dc` seconds, else
    * cluster 0 (reference pattern assignment, Model.scala:140-160).
    * Returns 1-based center index or 0.
    */
  def assignToCenters(t: Double, centers: Array[Double], dc: Double = 5400.0): Int = {
    var best = -1; var bestD = dc
    var i = 0
    while (i < centers.length) {
      val d = math.abs(t - centers(i))
      if (d <= bestD) { bestD = d; best = i }
      i += 1
    }
    best + 1
  }
}
