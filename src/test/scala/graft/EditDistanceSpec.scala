package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.llm.EditDistance

/** The banded kernel must agree with the classical full-table DP on
  * EVERY input — x29's oracle hash is pinned to the built-in
  * `levenshtein` semantics, so the optimization is only admissible if
  * it is value-identical. Property-checked over adversarial generators
  * (near-identical strings with small random edits — the band-doubling
  * sweet spot — plus unrelated strings, empties, repeats, unicode). */
class EditDistanceSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  /** Reference: textbook full-table DP over code points. */
  private def ref(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(x.length + 1)(i => i)
    for (j <- 1 to y.length) {
      var diag = dp(0)
      dp(0) = j
      for (i <- 1 to x.length) {
        val tmp = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          diag + (if (x(i - 1) == y(j - 1)) 0 else 1))
        diag = tmp
      }
    }
    dp(x.length)
  }

  test("fixed cases") {
    assert(EditDistance.exact("", "") == 0)
    assert(EditDistance.exact("", "abc") == 3)
    assert(EditDistance.exact("abc", "") == 3)
    assert(EditDistance.exact("kitten", "sitting") == 3)
    assert(EditDistance.exact("flaw", "lawn") == 2)
    assert(EditDistance.exact("abcdef", "abcdef") == 0)
    // shared prefix+suffix, differing middle
    assert(EditDistance.exact("prefix MIDDLE suffix", "prefix CENTER suffix")
      == ref("prefix MIDDLE suffix", "prefix CENTER suffix"))
    // surrogate pairs: code-point semantics, like the built-in
    assert(EditDistance.exact("a😀b", "ab") == 1)
  }

  private val token = Gen.oneOf("the", "quick", "brown", "fox", "x", "yz")
  private val doc = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.listOfN(n, token).map(_.mkString(" ")))

  /** A near-duplicate: the same doc with a few random point edits. */
  private val nearPair: Gen[(String, String)] = for {
    d <- doc
    nEdits <- Gen.chooseNum(0, 4)
    edited <- (0 until nEdits).foldLeft(Gen.const(d)) { (g, _) =>
      g.flatMap { s =>
        if (s.isEmpty) Gen.const(s + "Z")
        else Gen.chooseNum(0, s.length - 1).flatMap(p =>
          Gen.oneOf(
            s.substring(0, p) + "Q" + s.substring(p + 1), // substitute
            s.substring(0, p) + s.substring(p + 1),       // delete
            s.substring(0, p) + "W" + s.substring(p)))    // insert
      }
    }
  } yield (d, edited)

  test("property: near-duplicate pairs agree with the full DP") {
    check(Prop.forAll(nearPair) { case (a, b) =>
      EditDistance.exact(a, b) == ref(a, b)
    })
  }

  test("property: unrelated pairs agree with the full DP") {
    check(Prop.forAll(doc, doc) { (a, b) =>
      EditDistance.exact(a, b) == ref(a, b)
    })
  }

  test("property: arbitrary unicode-ish strings agree") {
    val s = Gen.listOf(Gen.oneOf('a', 'b', 'é', '中', ' '))
      .map(_.mkString)
    check(Prop.forAll(s, s) { (a, b) =>
      EditDistance.exact(a, b) == ref(a, b)
    })
  }
}
