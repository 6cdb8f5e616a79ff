package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-6 kernel fast paths (common-prefix/suffix trimming in
  * Levenshtein/LCS, the matched-prefix scan pointer + equality
  * short-circuit in Jaro) are VALUE-PRESERVING optimizations — this spec
  * pins them against the untrimmed naive implementations on random
  * inputs, biased toward the near-duplicate shapes the scoring kernel
  * actually sees (shared heads/tails, small edits), plus adversarial
  * repeats where trimming theorems classically go wrong.
  */
class TextSimFastPathSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  /** The pre-round-6 reference implementations, verbatim. */
  private def levNaive(a: String, b: String): Int = {
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

  private def jaroNaive(a: String, b: String): Double = {
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

  private def lcsNaive(a: Array[Long], b: Array[Long]): Int = {
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

  // small alphabet so shared prefixes/suffixes and repeats arise constantly
  private val tinyStr: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  // near-duplicate pair: shared head + independent middles + shared tail
  private val nearDupPair: Gen[(String, String)] = for {
    head <- tinyStr; tail <- tinyStr
    ma <- Gen.chooseNum(0, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'x')))
    mb <- Gen.chooseNum(0, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'y')))
  } yield (head + ma + tail, head + mb + tail)
  private val anyPair: Gen[(String, String)] =
    Gen.oneOf(Gen.zip(tinyStr, tinyStr), nearDupPair,
      tinyStr.map(s => (s, s)))

  test("levenshtein trim == naive DP on random and near-dup pairs") {
    check(Prop.forAll(anyPair) { case (a, b) =>
      TextSim.levenshtein(a, b) == levNaive(a, b)
    })
  }

  test("jaro pointer scan == naive scan (bit-equal doubles)") {
    check(Prop.forAll(anyPair) { case (a, b) =>
      java.lang.Double.compare(TextSim.jaro(a, b), jaroNaive(a, b)) == 0
    })
  }

  test("tokenLcsLong trim == naive DP on random and repeat-heavy arrays") {
    val arr: Gen[Array[Long]] =
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 3L)).map(_.toArray))
    check(Prop.forAll(Gen.zip(arr, arr)) { case (a, b) =>
      TextSim.tokenLcsLong(a, b) == lcsNaive(a, b) &&
        TextSim.tokenLcs(a.map(_.toString).toSeq, b.map(_.toString).toSeq) == lcsNaive(a, b)
    })
  }

  test("known values survive the fast paths") {
    assert(TextSim.levenshtein("kitten", "sitting") == 3)
    assert(TextSim.levenshtein("abcdef", "abcdef") == 0)
    assert(TextSim.levenshtein("aaaa", "aa") == 2)
    assert(TextSim.jaro("abc", "abc") == 1.0)
    assert(TextSim.jaroWinkler("abc", "abc") == 1.0)
    assert(TextSim.tokenLcsLong(Array(1L, 2L, 1L), Array(1L, 1L)) == 2)
    assert(TextSim.tokenLcsLong(Array(1L), Array(1L, 1L)) == 1)
    assert(TextSim.tokenLcsLong(Array(1L, 1L), Array(1L, 1L, 1L)) == 2)
  }
}
