package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Unigram-LM induction contracts: the Viterbi expression against an
  * independent plain-Scala DP, the seeding statistic by hand, the
  * hard-EM objective, and the encode round-trip.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Independent DP (shares no code with the expression): max score,
    * longer-piece-wins ties, single-char UNK floor.
    */
  private def viterbiModel(w: String, model: Map[String, Double],
      maxLen: Int, unk: Double = -25.0): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (e <- 1 to n; l <- 1 to math.min(maxLen, e)) {
      if (best(e - l) != Double.NegativeInfinity) {
        val piece = w.substring(e - l, e)
        val s = model.get(piece).map(best(e - l) + _)
          .orElse(if (l == 1) Some(best(e - 1) + unk) else None)
        s.foreach { sc =>
          if (sc >= best(e)) { best(e) = sc; back(e) = l }
        }
      }
    }
    var pos = n
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { out += w.substring(pos - back(pos), pos); pos -= back(pos) }
    out.reverse.toSeq
  }

  test("UnigramViterbi: hand cases — best path, tie to longer, UNK floor") {
    val model = Seq("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5, "abc" -> -3.0)
    def seg(w: String) = Seq(Tuple1(w)).toDF("w")
      .select(graft.functions.UnigramViterbi.unigramViterbi(
        col("w"), model, 3).as("p")).as[Seq[String]].head()
    assert(seg("abab") == Seq("ab", "ab")) // -5 beats a+b+a+b = -6
    assert(seg("abc") == Seq("abc"))
    // tie: "aa" via {a:-1, aa:-2}: single piece wins the tie
    val tie = Seq(Tuple1("aa")).toDF("w")
      .select(graft.functions.UnigramViterbi.unigramViterbi(
        col("w"), Seq("a" -> -1.0, "aa" -> -2.0), 2).as("p"))
      .as[Seq[String]].head()
    assert(tie == Seq("aa"))
    // unknown char segments alone at the floor
    assert(seg("abz") == Seq("ab", "z"))
    assert(seg("") == Seq())
  }

  test("UnigramViterbi matches the independent DP on random words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    val pieces = (Seq("a", "b", "c", "d") ++
      (0 until 30).map(_ => (0 until (1 + rnd.nextInt(3)))
        .map(_ => alphabet(rnd.nextInt(4))).mkString))
      .distinct.map(p => p -> -(1.0 + rnd.nextDouble() * 5))
    val model = pieces.toMap
    val words = (0 until 80).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val got = words.map(Tuple1(_)).toDF("w")
      .select(col("w"), graft.functions.UnigramViterbi.unigramViterbi(
        col("w"), pieces, 4).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == viterbiModel(w, model, 4), s"word $w")
      assert(got(w).mkString == w, "pieces must concatenate back")
    }
  }

  test("seedVocab: hand corpus statistic with deterministic cutoff") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val words = UnigramLmOps.wordCounts(docs, "text")
    // substrings: a->2, b->3, ab->2; top-2 cutoff (weight desc, piece
    // asc) = b(3), a(2); chars union re-adds nothing new
    val got = UnigramLmOps.seedVocab(words, maxPieceLen = 2, seedSize = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 3L))
    // larger seed keeps the multi-char piece
    val got3 = UnigramLmOps.seedVocab(words, 2, 3)
      .as[(String, Long)].collect().toMap
    assert(got3 == Map("a" -> 2L, "b" -> 3L, "ab" -> 2L))
  }

  test("unigramTrain: vocab bounded, chars covered, weights positive; encode round-trips") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the rat"),
      (3L, "a cat and a rat sat")).toDF("doc_id", "text")
    val model = UnigramLmOps.unigramTrain(docs, "text",
      vocabSize = 30, maxPieceLen = 4, seedSize = 100, rounds = 3)
    assert(model.size <= 30)
    val pieces = model.map(_._1).toSet
    val corpusChars = "thecatsonmaterand".toSet.map((c: Char) => c.toString)
    assert(corpusChars.subsetOf(pieces), s"missing chars: ${corpusChars -- pieces}")
    assert(model.forall(_._2 < 0.0), "log-probs are negative")
    // the frequent word should surface as a whole piece
    assert(pieces.contains("the") || pieces.contains("cat"))
    val enc = UnigramLmOps.unigramEncode(docs, "text", "doc_id", model, 4)
      .as[(Long, Seq[String])].collect().toMap
    val orig = Map(
      1L -> "thecatsatonthemat", 2L -> "thecatatetherat", 3L -> "acatandaratsat")
    orig.foreach { case (id, s) =>
      assert(enc(id).mkString == s, s"doc $id must round-trip")
    }
  }

  test("hard-EM round never decreases the Viterbi objective (no pruning)") {
    val docs = Seq((1L, "aab aab ab b aab ab")).toDF("doc_id", "text")
    val words = UnigramLmOps.wordCounts(docs, "text").localCheckpoint()
    val wordWeights = words.as[(String, Long)].collect().toMap
    def objective(pieces: Seq[(String, Long)]): Double = {
      val total = pieces.map(_._2).sum.toDouble
      val m = pieces.map { case (p, w) => p -> math.log(w / total) }.toMap
      wordWeights.map { case (w, n) =>
        n * viterbiModel(w, m, 3).map(m(_)).sum
      }.sum
    }
    var pieces = UnigramLmOps.seedVocab(words, 3, 50)
      .as[(String, Long)].collect().toSeq
    var prev = objective(pieces)
    (0 until 3).foreach { _ =>
      val counted = UnigramLmOps.emRound(words, pieces, 3)
        .as[(String, Long)].collect().toMap
      pieces = pieces.map { case (p, _) => p -> counted.getOrElse(p, 0L) }
        .filter(_._2 > 0L)
      val cur = objective(pieces)
      assert(cur >= prev - 1e-9, s"objective fell: $prev -> $cur")
      prev = cur
    }
  }
}
