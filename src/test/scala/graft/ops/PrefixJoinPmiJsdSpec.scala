package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-7 extension operators: prefix-filtered exact Jaccard join,
  * directed containment join, Jensen–Shannon drift, windowed PMI.
  */
class PrefixJoinPmiJsdSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the lazy cat"),
    (4L, "completely different words here nothing shared"),
    (5L, "quick fox")
  ).toDF("doc_id", "text")

  // ---------------------------------------------------- prefixJaccardPairs

  test("prefixJaccardPairs matches the all-pairs formulation bit-for-bit " +
      "on the sf0.001 corpus at three thresholds (recall-1.0 proof)") {
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val exact = DedupOps.jaccardPairs(corpus, "text", "doc_id", t)
        .as[(Long, Long, Double)].collect().toSet
      val prefix = DedupOps.prefixJaccardPairs(corpus, "text", "doc_id", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == exact, s"threshold $t: prefix join must equal all-pairs")
      assert(exact.nonEmpty, s"threshold $t fixture must exercise the join")
    }
  }

  test("prefixJaccardPairs finds the planted duplicates and nothing else") {
    val pairs = DedupOps.prefixJaccardPairs(docs, "text", "doc_id", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "short doc fails the length filter at 0.6 (2 vs 8 tokens)")
  }

  // ------------------------------------------------------ containmentPairs

  test("containmentPairs is directed: a quote is contained in its source") {
    // doc 5's tokens {quick, fox} are all inside docs 1/2/3.
    val c = DedupOps.containmentPairs(docs, "text", "doc_id", 0.9)
      .as[(Long, Long, Double)].collect()
    val fromQuote = c.filter(_._1 == 5L).map(r => (r._2, r._3)).toMap
    assert(Set(1L, 2L, 3L).subsetOf(fromQuote.keySet))
    assert(fromQuote.values.forall(_ == 1.0))
    // The reverse direction (big doc contained in the 2-token quote) fails.
    assert(!c.exists(r => r._2 == 5L && r._1 != 5L))
  }

  test("containmentPairs matches a naive intersect-over-|A| computation") {
    val t = docs.select(col("doc_id").as("id"),
      DedupOps.tokenSet(col("text")).as("toks"))
    val a = t.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("id").as("id_b"), col("toks").as("toks_b"))
    val naive = a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(col("toks_a"))).as("containment"))
      .filter(col("containment") >= 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val got = DedupOps.containmentPairs(docs, "text", "doc_id", 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == naive)
  }

  test("containmentPairs posting cap: exact when dfs <= cap, bounded on " +
      "a planted hot posting") {
    // all dfs <= 5 here: capped == uncapped
    val exact = DedupOps.containmentPairs(docs, "text", "doc_id", 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val capped = DedupOps.containmentPairs(docs, "text", "doc_id", 0.7,
      maxPosting = 8).as[(Long, Long, Double)].collect().toSet
    assert(capped == exact)

    // hot posting: 40 containers share the probe's only token
    val hot = ((1L to 40L).map(i => (i, s"shared extra$i filler$i")) :+
      (99L, "shared")).toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(hot, "text", "doc_id", 0.9,
      maxPosting = 8)
      .filter(col("id_a") === 99L).count()
    assert(got <= 8L, s"cap must bound the hot-posting fanout, got $got")
    assert(got > 0L, "capped index must still surface containers")
  }

  // --------------------------------------------------------- jsDivergence

  test("jsDivergence: identical mixes give 0; disjoint mixes give ln 2") {
    val a = Seq("en", "en", "de").toDF("lang")
    val same = DriftOps.jsDivergence(a, a, "lang")
      .select("jsd_total").as[Double].head()
    assert(math.abs(same) < 1e-12)

    val b = Seq("fr", "fr", "es").toDF("lang")
    val disjoint = DriftOps.jsDivergence(a, b, "lang")
      .select("jsd_total").as[Double].head()
    assert(math.abs(disjoint - math.log(2.0)) < 1e-9,
      s"disjoint supports must hit the ln2 bound, got $disjoint")
  }

  test("jsDivergence matches the closed form on a hand-checked shift") {
    // old: 3/4 en, 1/4 de; new: 1/2 en, 1/2 de.
    val oldDf = Seq("en", "en", "en", "de").toDF("lang")
    val newDf = Seq("en", "de").toDF("lang")
    def half(p: Double, q: Double): Double =
      (if (p == 0) 0.0 else 0.5 * p * math.log(p / ((p + q) / 2))) +
      (if (q == 0) 0.0 else 0.5 * q * math.log(q / ((p + q) / 2)))
    val expected = half(0.75, 0.5) + half(0.25, 0.5)
    val got = DriftOps.jsDivergence(oldDf, newDf, "lang")
      .select("jsd_total").as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
    // per-category rows carry the union grid
    assert(DriftOps.jsDivergence(oldDf, newDf, "lang").count() == 2)
  }

  // ------------------------------------------------------------- pmiPairs

  test("pmiPairs: hand-checked counts and PMI on a 2-doc corpus") {
    val tiny = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiPairs(tiny, "text", window = 1, minCount = 1L)
      .select("x", "y", "c_xy", "c_x", "c_y", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // window-1 pairs: (a,b) from pos 1-2, (a,b) from pos 2-3, (b,c).
    assert(rows.keySet == Set(("a", "b"), ("b", "c")))
    val ab = rows(("a", "b"))
    assert(ab._3 == 2 && ab._4 == 2 && ab._5 == 2)
    // T_pairs = 3, T_tok = 5: pmi = ln((2/3) / ((2/5)*(2/5)))
    val expAb = math.log((2.0 / 3.0) / ((2.0 / 5.0) * (2.0 / 5.0)))
    assert(math.abs(ab._6 - expAb) < 1e-12)
    val bc = rows(("b", "c"))
    assert(bc._3 == 1 && bc._4 == 2 && bc._5 == 1)
  }

  test("pmiPairs canonicalizes unordered pairs and honors minCount") {
    // "b a" emits (a, b) — least/greatest, not positional order.
    val tiny = Seq((1L, "b a")).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiPairs(tiny, "text", window = 3, minCount = 1L)
      .select("x", "y").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("a", "b")))
    val filtered = TextAnalysis.pmiPairs(tiny, "text", window = 3, minCount = 2L)
    assert(filtered.count() == 0)
  }

  test("pmiPairs fused pair stream matches the composable HOF " +
      "formulation on the sf0.001 corpus") {
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val hofPairs = corpus.select(explode(flatten(transform(
        when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
          .otherwise(array().cast("array<int>")),
        i => transform(slice(toks, i + 1, lit(2)),
          y => concat_ws(" ",
            least(element_at(toks, i), y),
            greatest(element_at(toks, i), y)))))).as("pk"))
      .groupBy("pk").count()
      .as[(String, Long)].collect().toMap
    val fused = TextAnalysis.pmiPairs(corpus, "text", window = 2)
      .select(concat_ws(" ", col("x"), col("y")).as("pk"), col("c_xy"))
      .as[(String, Long)].collect().toMap
    assert(fused == hofPairs)
    assert(fused.nonEmpty)
  }

  test("pmiPairs: single-token and empty docs contribute no pairs " +
      "(Spark sequence(1,0) descends — regression)") {
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiPairs(tiny, "text", window = 2, minCount = 1L)
      .select("x", "y").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("x", "y")))
  }
}
