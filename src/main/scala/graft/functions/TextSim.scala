package graft.functions

/** Pure (Spark-free) similarity kernels — unit/property tested off-Spark.
  *
  * These are the scoring primitives the pairwise kernel uses (reference
  * analogue: the ol_1/ol_2 channel scores of AMPI.scala:298-306 and the
  * inverse-flow co-occurrence weighting of SIG.scala:46-55).
  */
object TextSim {

  /** Classic Levenshtein distance, O(|a|·|b|), two-row DP. */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(b.length)
  }

  /** Levenshtein similarity in [0,1]: 1 - dist / max(len). Both empty => 1. */
  def levenshteinRatio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 1.0 else 1.0 - levenshtein(a, b).toDouble / m
  }

  /** Jaro similarity in [0,1] (standard definition). */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aMatched = new Array[Boolean](a.length)
    val bMatched = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare matched chars in order
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2) / m) / 3.0
  }

  /** Length of the LONGEST COMMON SUBSEQUENCE of two token sequences —
    * the in-order alignment count Q of the reference's merge-scan trip
    * alignment (AMPI.scala:240-279 classifies each trip as co-occurring Q,
    * afc-only P, or ap-only R; here Q = LCS, P = |a|−Q, R = |b|−Q).
    * O(|a|·|b|) two-row DP over interned-comparison strings.
    */
  def tokenLcs(a: Seq[String], b: Seq[String]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val bArr = b.toArray
    var prev = new Array[Int](bArr.length + 1)
    var curr = new Array[Int](bArr.length + 1)
    val it = a.iterator
    while (it.hasNext) {
      val ai = it.next()
      var j = 1
      while (j <= bArr.length) {
        curr(j) =
          if (ai == bArr(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      java.util.Arrays.fill(curr, 0)
    }
    prev(bArr.length)
  }

  /** LCS length over 64-bit token ids — the hot-path twin of tokenLcs:
    * round 3 hash-encodes scoring tokens to longs before the pair shuffle
    * (PairScoring.features), so the O(|a|·|b|) DP compares primitives
    * instead of strings. Semantics identical to tokenLcs under the hashing
    * (collision prob ~2^-64 per token pair; property-tested equal in
    * PairScoringSpec).
    */
  def tokenLcsLong(a: Array[Long], b: Array[Long]): Int = {
    if (a.length == 0 || b.length == 0) return 0
    var prev = new Array[Int](b.length + 1)
    var curr = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      val ai = a(i)
      var j = 1
      while (j <= b.length) {
        curr(j) =
          if (ai == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      java.util.Arrays.fill(curr, 0)
      i += 1
    }
    prev(b.length)
  }

  /** Jaro-Winkler: boost by shared prefix (<=4 chars), scaling p=0.1.
    * NOTE: the prefix bonus is applied unconditionally (RapidFuzz-style);
    * classic Winkler (and DuckDB) gate it behind jaro > 0.7 — one reason JW
    * values are never oracle-compared across engines (the other: integer
    * vs fractional half-transposition counts).
    */
  def jaroWinkler(a: String, b: String, p: Double = 0.1, maxPrefix: Int = 4): Double = {
    val j = jaro(a, b)
    var l = 0
    val lim = math.min(maxPrefix, math.min(a.length, b.length))
    while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
    j + l * p * (1.0 - j)
  }

  /** Weighted Jaccard over two token SETS with a per-token weight function
    * (weight = idf; reference analogue: inverse station-flow rank score,
    * SIG.scala:46-55). Both empty => 0.
    */
  def weightedJaccard(a: Set[String], b: Set[String], w: String => Double): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var inter = 0.0
    var union = 0.0
    (a ++ b).foreach { t =>
      val wt = w(t)
      union += wt
      if (a.contains(t) && b.contains(t)) inter += wt
    }
    if (union == 0.0) 0.0 else inter / union
  }

  /** Normalize a token: lowercase, strip non-alphanumeric. */
  def normalizeToken(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(Character.toLowerCase(c))
      i += 1
    }
    sb.toString
  }

  /** k-shingles (contiguous k-grams) of a token sequence, joined by space.
    * Shorter-than-k sequences yield the whole sequence as one shingle.
    */
  def shingles(tokens: Seq[String], k: Int): Seq[String] = {
    if (tokens.isEmpty) Seq.empty
    else if (tokens.length <= k) Seq(tokens.mkString(" "))
    else tokens.sliding(k).map(_.mkString(" ")).toSeq
  }
}
