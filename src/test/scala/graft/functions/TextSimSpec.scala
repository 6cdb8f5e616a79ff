package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TextSimSpec extends AnyFunSuite {

  /** Run a scalacheck property with a fixed seed (deterministic). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("levenshtein known values") {
    assert(TextSim.levenshtein("kitten", "sitting") == 3)
    assert(TextSim.levenshtein("", "abc") == 3)
    assert(TextSim.levenshtein("abc", "") == 3)
    assert(TextSim.levenshtein("abc", "abc") == 0)
    assert(TextSim.levenshtein("flaw", "lawn") == 2)
    assert(TextSim.levenshtein("深圳地铁", "深圳铁") == 1) // CJK
  }

  test("jaro / jaro-winkler known values") {
    assert(math.abs(TextSim.jaro("MARTHA", "MARHTA") - 0.944444) < 1e-5)
    assert(math.abs(TextSim.jaroWinkler("MARTHA", "MARHTA") - 0.961111) < 1e-5)
    assert(math.abs(TextSim.jaro("DWAYNE", "DUANE") - 0.822222) < 1e-5)
    assert(math.abs(TextSim.jaroWinkler("DWAYNE", "DUANE") - 0.84) < 1e-5)
    assert(math.abs(TextSim.jaro("DIXON", "DICKSONX") - 0.766667) < 1e-5)
    assert(TextSim.jaro("", "") == 1.0)
    assert(TextSim.jaro("a", "") == 0.0)
    assert(TextSim.jaro("abc", "xyz") == 0.0)
  }

  test("weighted jaccard hand-computed") {
    val w = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0).withDefaultValue(1.0)
    // inter={b}, union={a,b,c}: 2/(1+2+3)
    assert(math.abs(TextSim.weightedJaccard(Set("a", "b"), Set("b", "c"), w) - 2.0 / 6.0) < 1e-12)
    assert(TextSim.weightedJaccard(Set.empty, Set.empty, w) == 0.0)
    assert(TextSim.weightedJaccard(Set("a"), Set("a"), w) == 1.0)
    assert(TextSim.weightedJaccard(Set("a"), Set("b"), w) == 0.0)
  }

  private val asciiStr = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  test("property: levenshtein symmetry, bounds, identity") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      val d = TextSim.levenshtein(a, b)
      d == TextSim.levenshtein(b, a) &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length) &&
        TextSim.levenshtein(a, a) == 0
    })
  }

  test("property: jaro-winkler symmetry and [0,1] bounds") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      val s = TextSim.jaroWinkler(a, b)
      s >= 0.0 && s <= 1.0 &&
        math.abs(s - TextSim.jaroWinkler(b, a)) < 1e-12 &&
        TextSim.jaroWinkler(a, a) == 1.0
    })
  }

  test("property: weighted jaccard symmetry and bounds") {
    val gset = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.toSet)
    check(Prop.forAll(gset, gset) { (a, b) =>
      val w: String => Double = t => 1.0 + t.hashCode.abs % 5
      val s = TextSim.weightedJaccard(a, b, w)
      s >= 0.0 && s <= 1.0 && math.abs(s - TextSim.weightedJaccard(b, a, w)) < 1e-12
    })
  }

  test("shingles") {
    assert(TextSim.shingles(Seq("a", "b", "c", "d"), 3) == Seq("a b c", "b c d"))
    assert(TextSim.shingles(Seq("a", "b"), 3) == Seq("a b"))
    assert(TextSim.shingles(Seq.empty, 3) == Seq.empty)
  }
}
