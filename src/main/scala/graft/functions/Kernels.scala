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
