package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** rrfFuse / sampleExactKStratified / hardNegatives contracts (part-8
  * additions). Engine-vs-DuckDB parity is pinned by q77-q79.
  */
class RrfHardNegSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------- rrfFuse

  test("rrfFuse sums reciprocal ranks; docs in both lists outrank single-list docs") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val out = SearchOps.rrfFuse(Seq(a, b), "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val m = out.map(t => t._1 -> t._2).toMap
    def rr(ranks: Long*): Double =
      math.rint(ranks.map(r => 1.0 / (60.0 + r)).sum * 1e6) / 1e6
    assert(m(10L) == rr(1, 2) && m(20L) == rr(2, 1))
    assert(m(30L) == rr(3) && m(40L) == rr(3))
    // 10 and 20 tie exactly (symmetric ranks) -> id ascending
    assert(out.map(_._1).take(2).sameElements(Array(10L, 20L)))
    assert(out.map(t => t._1 -> t._3).toMap ==
      Map(10L -> 2L, 20L -> 2L, 30L -> 1L, 40L -> 1L))
  }

  // --------------------------------------------- sampleExactKStratified

  test("sampleExactKStratified: per-stratum exact size == per-group sampleExactK") {
    val df = (1 to 300).map(i => (i.toLong, s"L${i % 3}")).toDF("doc_id", "lang")
    val strat = SplitOps.sampleExactKStratified(df, "doc_id", "lang", 25, seed = 9L)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(strat.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("L0" -> 25, "L1" -> 25, "L2" -> 25))
    // equivalence: stratified == sampleExactK run on each stratum alone
    (0 to 2).foreach { l =>
      val alone = SplitOps.sampleExactK(
          df.filter(col("lang") === s"L$l"), "doc_id", 25, seed = 9L)
        .select("doc_id").as[Long].collect().toSet
      assert(strat.filter(_._2 == s"L$l").map(_._1).toSet == alone)
    }
    // k > stratum size keeps the whole stratum
    assert(SplitOps.sampleExactKStratified(df, "doc_id", "lang", 500).count() == 300)
  }

  // ----------------------------------------------------- hardNegatives

  private val Dim = 8
  private def axis(a: Int, wobble: Float = 0f): Seq[Float] = {
    val v = Array.fill(Dim)(0.0f)
    v(a) = 1.0f
    if (wobble != 0f) v((a + 1) % Dim) = wobble
    v.toSeq
  }

  test("hardNegativesBrute excludes same-label twins, ranks closest other-label first") {
    // anchor 1 (label A) has an exact same-label twin (2) and two
    // other-label docs at decreasing similarity (3 close, 4 orthogonal)
    val df = Seq(
      (1L, axis(0), "A"),
      (2L, axis(0), "A"),          // same label: never a negative
      (3L, axis(0, 0.3f), "B"),    // close other-label: THE hard negative
      (4L, axis(4), "B")           // orthogonal other-label
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.hardNegativesBrute(
        df.filter(col("vec_id") === 1), df, k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(!out.contains(2L), "same-label twin must be excluded")
    assert(out(3L) == 1 && out(4L) == 2)
  }

  test("hardNegativesLsh agrees with brute on separated clusters") {
    // two tight angular clusters with mixed labels inside each: the
    // hard negative of every doc is inside its own cluster
    val rows = (0 until 10).map { i =>
      val cl = i % 2
      (i.toLong, axis(cl * 4, 0.01f * (i / 2)), if (i < 5) "X" else "Y")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val brute = SimilarityOps.hardNegativesBrute(df, df, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val lsh = SimilarityOps.hardNegativesLsh(df, k = 1, dim = Dim)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // LSH may miss cross-bucket pairs by contract, but on two tight
    // clusters every query that surfaces must pick brute's answer
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n) => assert(brute(q) == n, s"query $q") }
  }
}
