package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The scale-fixture generator's workload-preserving invariants (the
  * BASELINE.md round-9 decade table rests on them): word-multiset
  * invariance, per-(doc, replica) determinism, actual reordering, and
  * the sign-flip's norm preservation.
  */
class ScaleGenSpec extends AnyFunSuite {

  test("shuffleWords preserves the word multiset, is deterministic per " +
      "(doc, replica), and differs across replicas") {
    val text = "the quick brown fox jumps over the lazy dog the end"
    val s1 = ScaleGen.shuffleWords(text, 42L, 1)
    val s1b = ScaleGen.shuffleWords(text, 42L, 1)
    val s2 = ScaleGen.shuffleWords(text, 42L, 2)
    val o1 = ScaleGen.shuffleWords(text, 43L, 1)
    assert(s1 == s1b, "same (doc, replica) must be byte-identical")
    def ms(s: String) = s.split(" ").toSeq.sorted
    assert(ms(s1) == ms(text) && ms(s2) == ms(text) && ms(o1) == ms(text))
    assert(s1 != text && s1 != s2 && s1 != o1,
      "different replicas/docs must land different orders on an 11-word doc")
  }

  test("shuffleWords edge cases: null, empty, single word; whitespace " +
      "runs stay in place so the CHAR multiset is invariant") {
    assert(ScaleGen.shuffleWords(null, 1L, 1) == null)
    assert(ScaleGen.shuffleWords("", 1L, 1) == "")
    assert(ScaleGen.shuffleWords("solo", 1L, 3) == "solo")
    val in = " a  b\tcc\n"
    val got = ScaleGen.shuffleWords(in, 7L, 1)
    assert(got.length == in.length, "length must be preserved")
    assert(got.toSeq.sorted == in.toSeq.sorted,
      s"char multiset must be invariant: '$got'")
    assert(got.split("\\s+").filter(_.nonEmpty).sorted.toSeq ==
      Seq("a", "b", "cc"))
    // whitespace runs are positionally fixed
    assert(got.startsWith(" ") && got.endsWith("\n") && got.contains("  "))
  }

  test("signFlip is ±1, deterministic, and non-constant across dims and " +
      "replicas (norm preservation is then algebraic)") {
    val vals = for (r <- 1 to 4; j <- 0 until 64) yield ScaleGen.signFlip(r, j)
    assert(vals.forall(v => v == 1.0f || v == -1.0f))
    assert(vals.toSet.size == 2, "both signs must occur")
    val row1 = (0 until 64).map(ScaleGen.signFlip(1, _))
    val row2 = (0 until 64).map(ScaleGen.signFlip(2, _))
    assert(row1 != row2, "replicas must get different patterns")
    assert((0 until 64).map(ScaleGen.signFlip(1, _)) == row1, "deterministic")
  }
}
