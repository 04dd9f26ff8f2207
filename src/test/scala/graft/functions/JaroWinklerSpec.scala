package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().head

  test("golden values probed from DuckDB jaro_winkler_similarity") {
    // (a, b, expected) — the classic Winkler examples plus the edge
    // cases that pin the implementation variant choices
    val cases = Seq(
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      // jaro 0.5556 < 0.7: NO prefix boost despite the 'ab' prefix
      ("abcdef", "abzzzz", 0.5555555555555555),
      // jaro 0.7333 > 0.7 but zero common prefix: unchanged
      ("CRATE", "TRACE", 0.7333333333333334),
      // 3-cycle alignment: INTEGER transposition halving (floor(3/2)=1)
      // gives 0.9444; float halving would give 0.9167
      ("abcxxx", "bcaxxx", 0.9444444444444445),
      ("ab", "ab", 1.0),
      // window max(2,2)/2-1 = 0: no off-position matches
      ("ab", "ba", 0.0),
      ("a", "", 0.0),
      ("", "", 0.0))
    cases.foreach { case (a, b, want) =>
      val got = jw(a, b)
      assert(got == want, s"jw($a, $b) = $got, want $want")
    }
  }

  test("symmetry, null propagation, and identity") {
    assert(jw("Customer#000000010", "Customer#000000100") ==
      jw("Customer#000000100", "Customer#000000010"))
    assert(jw("same-string", "same-string") == 1.0)
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0), "null input yields null, not a score")
  }
}
