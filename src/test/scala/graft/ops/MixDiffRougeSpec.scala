package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** temperatureSample / snapshotDiff / rougeN contracts (part-9
  * additions). Engine-vs-DuckDB parity is pinned by q80-q82.
  */
class MixDiffRougeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ------------------------------------------------- temperatureSample

  test("temperatureMixWeights: sqrt flattening, q sums to 1, rate caps at 1") {
    // 900 'big' vs 100 'small': natural shares .9/.1, sqrt shares .75/.25
    val df = (1 to 1000).map(i => (i.toLong, if (i <= 900) "big" else "small"))
      .toDF("doc_id", "lang")
    val w = MixOps.temperatureMixWeights(df, "lang", budget = 400)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(w("big")._1 == 900L && w("small")._1 == 100L)
    assert(math.abs(w("big")._2 - 0.75) < 1e-12)
    assert(math.abs(w("small")._2 - 0.25) < 1e-12)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-12)
    // big: 400*.75/900 = 1/3; small: 400*.25/100 = 1 (capped)
    assert(math.abs(w("big")._3 - 400.0 * 0.75 / 900.0) < 1e-12)
    assert(w("small")._3 == 1.0)
  }

  test("temperatureSample is deterministic, stratum-balanced toward the budget") {
    val df = (1 to 2000).map(i => (i.toLong, if (i <= 1800) "big" else "small"))
      .toDF("doc_id", "lang")
    val s1 = MixOps.temperatureSample(df, "lang", "doc_id", budget = 500, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = MixOps.temperatureSample(df, "lang", "doc_id", budget = 500, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    val byLang = MixOps.temperatureSample(df, "lang", "doc_id", budget = 500, seed = 7L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // small stratum (200 docs) is over-represented vs its natural 10%:
    // expected ~ 500*.25 = 125 of 200; big ~ 375 of 1800. Bernoulli
    // noise is ~±3 sigma bounded below.
    assert(byLang("small") > 80, s"small stratum undersampled: $byLang")
    assert(byLang("big") < 500, s"big stratum not thinned: $byLang")
  }

  test("importanceWeights: uniform target weights, Kish ESS exact") {
    // a: 3 rows, b: 1 -> w_a = 2/3, w_b = 2; ESS = 16/(3*4/9 + 4) = 3
    val df = (Seq.fill(3)("a") ++ Seq("b")).map(Tuple1(_)).toDF("src")
    val r = MixOps.importanceWeights(df, "src")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a")._2 == 3L && math.abs(r("a")._3 - 0.75) < 1e-12)
    assert(math.abs(r("a")._4 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r("b")._4 - 2.0) < 1e-12)
    r.values.foreach(x => assert(math.abs(x._5 - 3.0) < 1e-9,
      s"ESS must be 3, got ${x._5}"))
  }

  test("epochPlan: weights sum to 1, targets sum to the budget, τ<1 " +
      "upweights the small domain, τ=1 is proportional") {
    val df = Seq(("big", 900L), ("big", 100L), ("small", 100L))
      .toDF("src", "toks")
    val plan = MixOps.epochPlan(df, "src", "toks",
        targetTokens = 1000L, temperature = 0.7)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(plan("big")._2 == 1000L && plan("small")._2 == 100L)
    assert(math.abs(plan.values.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(plan.values.map(_._4).sum - 1000.0) < 1e-3)
    assert(plan("small")._3 > 0.1,
      "temperature 0.7 must give the 10% domain more than its 10% share")
    // epochs = target / n
    plan.values.foreach(x =>
      assert(math.abs(x._5 - x._4 / x._2) < 1e-6, s"epochs wrong: $x"))
    val flat = MixOps.epochPlan(df, "src", "toks", 1000L, temperature = 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(x => x._1 -> x._3).toMap
    assert(math.abs(flat("big") - 1000.0 / 1100.0) < 1e-6)
    assert(math.abs(flat("small") - 100.0 / 1100.0) < 1e-6)
  }

  test("epochPlanApply: integral epochs repeat exactly, fractional epochs " +
      "stochastically round, deterministic under repartition") {
    // one domain, budget = 3x tokens -> epochs exactly 3.0 (tau=1):
    // every doc appears exactly 3 times, copies 0,1,2
    val solo = (1L to 20L).map((_, "d", 10L)).toDF("id", "dom", "toks")
    val exact = MixOps.epochPlanApply(solo, "dom", "toks", "id",
        targetTokens = 600L, temperature = 1.0)
      .as[(Long, String, Int)].collect()
    assert(exact.length == 60)
    assert(exact.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(0, 1, 2)))
    // fractional: epochs = 1.5 -> every doc at least once (copy 0),
    // extra copy-1 rows only ever copy 1, total strictly between n and 2n
    val frac = MixOps.epochPlanApply(solo, "dom", "toks", "id",
        targetTokens = 300L, temperature = 1.0)
      .as[(Long, String, Int)].collect()
    assert(frac.count(_._3 == 0) == 20, "copy 0 always survives")
    assert(frac.forall(_._3 <= 1))
    assert(frac.length > 20 && frac.length < 40,
      s"stochastic rounding of epochs=1.5 must land strictly between, got ${frac.length}")
    // repartition-proof
    val re = MixOps.epochPlanApply(solo.repartition(5, col("id")),
        "dom", "toks", "id", targetTokens = 300L, temperature = 1.0)
      .as[(Long, String, Int)].collect()
    assert(re.sortBy(r => (r._1, r._3)).toSeq ==
      frac.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("doremiStep: exp tilt toward high-loss domains, normalized, " +
      "hand values") {
    val loss = Seq(("a", 2.0), ("b", 1.0), ("c", 0.0)).toDF("d", "l")
    val got = MixOps.doremiStep(loss, "d", "l", eta = 1.0)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val raw = Map("a" -> math.exp(2.0) / 3.0, "b" -> math.exp(1.0) / 3.0,
      "c" -> 1.0 / 3.0)
    val tot = raw("a") + raw("b") + raw("c") // sorted domain order a,b,c
    Seq("a", "b", "c").foreach { d =>
      assert(got(d)._3 == 1.0 / 3.0)
      assert(math.abs(got(d)._4 - raw(d) / tot) < 1e-12,
        s"$d: ${got(d)._4} vs ${raw(d) / tot}")
    }
    assert(got("a")._4 > got("b")._4 && got("b")._4 > got("c")._4,
      "hard domains gain weight")
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-12, "normalized")
  }

  // ------------------------------------------------------ snapshotDiff

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "CHANGED", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val out = DiffOps.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: null-safe compare (null==null unchanged, null->value changed)") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val out = DiffOps.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed"))
  }

  test("snapshotDiff honors an explicit compareCols subset") {
    val old = Seq((1L, "same", 1.0)).toDF("k", "s", "v")
    val neu = Seq((1L, "same", 2.0)).toDF("k", "s", "v")
    assert(DiffOps.snapshotDiff(old, neu, Seq("k"), Seq("s")).count() == 0)
    assert(DiffOps.snapshotDiff(old, neu, Seq("k"), Seq("v")).count() == 1)
  }

  // ------------------------------------------------------------ rougeN

  test("rougeN clipped bigram overlap matches the hand-computed value") {
    // ref  : "the cat sat on the mat"  -> 5 bigrams
    // cand : "the cat the cat sat"     -> 4 bigrams
    // clipped overlap: "the cat" min(1,2)=1, "cat the" min(0,1)=0,
    //                  "cat sat" min(1,1)=1 -> 2
    val df = Seq(("the cat sat on the mat", "the cat the cat sat"))
      .toDF("ref", "cand")
    val r = EvalMetrics.rougeN(df, "ref", "cand", 2)
      .select("overlap", "ref_n", "cand_n", "rouge_p", "rouge_r").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.4)
  }

  test("rougeN: identical texts score P=R=F1=1; short/empty sides go null") {
    val df = Seq(
      ("a b c", "a b c"),   // identical
      ("a", "a b"),         // ref shorter than n -> ref_n=0 -> recall null
      ("", "")              // both empty
    ).toDF("ref", "cand")
    val rs = EvalMetrics.rougeN(df, "ref", "cand", 2)
      .select("rouge_p", "rouge_r", "rouge_f1").collect()
    assert(rs(0).getDouble(0) == 1.0 && rs(0).getDouble(1) == 1.0 &&
      rs(0).getDouble(2) == 1.0)
    assert(rs(1).isNullAt(1) && rs(1).isNullAt(2))
    assert(rs(2).isNullAt(0) && rs(2).isNullAt(1) && rs(2).isNullAt(2))
  }

  test("rougeN-1 equals token-level clipped overlap") {
    val df = Seq(("x y z", "x x y w")).toDF("ref", "cand")
    val r = EvalMetrics.rougeN(df, "ref", "cand", 1)
      .select("overlap", "ref_n", "cand_n").head()
    // clipped: x min(1,2)=1, y min(1,1)=1, w 0 -> 2 of cand 4 / ref 3
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 4L)
  }

  test("rougeNFused is bit-equal to the HOF form (differential, n=1 and n=2)") {
    // repetition-heavy pairs exercise the clipping; plus the edge rows
    // (identical, sub-n, empty, multi-space) the HOF form pins above
    val texts = Seq(
      ("the cat sat on the mat the cat", "the cat the cat sat on a mat"),
      ("a b a b a b a", "b a b a b"),
      ("x y z", "x x y w"),
      ("a b c", "a b c"),
      ("a", "a b"),
      ("", ""),
      ("one  two   three", "one two two three"),
      ("repeat repeat repeat repeat", "repeat repeat"))
    val df = texts.toDF("ref", "cand")
    for (n <- Seq(1, 2)) {
      val cols = Seq("ref", "cand", "overlap", "ref_n", "cand_n",
        "rouge_p", "rouge_r", "rouge_f1").map(col)
      val hof = EvalMetrics.rougeN(df, "ref", "cand", n)
        .select(cols: _*).orderBy("ref", "cand").collect()
      val fused = EvalMetrics.rougeNFused(df, "ref", "cand", n)
        .select(cols: _*).orderBy("ref", "cand").collect()
      assert(hof.sameElements(fused), s"n=$n: fused ROUGE diverged from the HOF oracle form")
    }
  }

  // ------------------------------------------------------------- BLEU

  test("bleuCorpus: perfect match = 1, length penalty, zero-match floor") {
    val perfect = Seq(("a b c d e", "a b c d e")).toDF("ref", "cand")
    val r1 = EvalMetrics.bleuCorpus(perfect, "ref", "cand", maxN = 4,
      fused = false).select("bleu").as[Double].head()
    assert(math.abs(r1 - 1.0) < 1e-12)
    // short candidate, perfect precision at maxN=2: BLEU = BP = exp(1 - 3/2)
    val short = Seq(("the cat sat", "the cat")).toDF("ref", "cand")
    val r2 = EvalMetrics.bleuCorpus(short, "ref", "cand", maxN = 2,
      fused = false).select("bleu").as[Double].head()
    assert(math.abs(r2 - math.exp(1.0 - 3.0 / 2.0)) < 1e-12)
    // no 4-gram match anywhere -> strict 0
    val r3 = EvalMetrics.bleuCorpus(short, "ref", "cand", maxN = 4,
      fused = false).select("bleu").as[Double].head()
    assert(r3 == 0.0)
  }

  test("bleuCorpus: clipping caps repeated-token credit; fused == exact") {
    // the classic clipping example: cand is all 'the'; ref has two
    val df = Seq(("the cat the hat", "the the the the")).toDF("ref", "cand")
    val r = EvalMetrics.bleuCorpus(df, "ref", "cand", maxN = 1, fused = false)
      .select("m_1", "t_1", "bleu").as[(Long, Long, Double)].head()
    assert(r._1 == 2L && r._2 == 4L, "clip at the ref count of 'the'")
    assert(math.abs(r._3 - 0.5) < 1e-12) // BP = 1 (equal lengths), p1 = 1/2
    // fused production twin equals the string-exact form corpus-wide
    val rnd = new scala.util.Random(71)
    val corpus = (0 until 50).map { i =>
      val toks = Seq.fill(5 + rnd.nextInt(30))(s"w${rnd.nextInt(12)}")
      val cand = toks.map(t => if (rnd.nextDouble() < 0.15) "xx" else t)
      (toks.mkString(" "), cand.mkString(" "))
    }.toDF("ref", "cand")
    val exact = EvalMetrics.bleuCorpus(corpus, "ref", "cand", 4, fused = false)
      .collect().head
    val fused = EvalMetrics.bleuCorpus(corpus, "ref", "cand", 4, fused = true)
      .collect().head
    assert(exact == fused, "fused BLEU must equal the string-exact twin")
  }

  test("scd2FromChangeLog collapses no-op upserts into validity intervals") {
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"), // no-op upsert collapses
      (1L, 30L, "silver"), (1L, 40L, "gold"),
      (2L, 15L, "gold")
    ).toDF("uid", "ts", "tier")
    val dim = DiffOps.scd2FromChangeLog(log, "uid", "ts", Seq("tier"))
      .select("uid", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    assert(dim.toSeq == Seq(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "gold", 15L, None, true)))
  }

  test("scd2FromChangeLog: null-safe attr compare and repartition-proof") {
    val log = Seq(
      (1L, 10L, Option("a")), (1L, 20L, Option.empty[String]),
      (1L, 30L, Option.empty[String]), // null==null collapses
      (1L, 40L, Option("a"))
    ).toDF("uid", "ts", "tier")
    val dim = DiffOps.scd2FromChangeLog(log, "uid", "ts", Seq("tier"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(_._3)
    assert(dim.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((Some("a"), 10L, Some(20L)), (None, 20L, Some(40L)),
        (Some("a"), 40L, None)),
      "null opens and closes versions like any other value")
    val re = DiffOps.scd2FromChangeLog(
        log.repartition(5), "uid", "ts", Seq("tier"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(_._3)
    assert(re.toSeq == dim.toSeq, "result is partitioning-independent")
  }

  test("applyChanges: upsert/delete/insert/no-op, latest wins, idempotent") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, 100L, "U", "a1", 11.0), (1L, 200L, "U", "a2", 12.0), // latest wins
      (2L, 100L, "D", "x", 0.0), // delete
      (9L, 100L, "U", "new", 99.0), // upsert of an absent key inserts
      (8L, 100L, "D", "x", 0.0) // delete of an absent key: no-op
    ).toDF("k", "ts", "op", "name", "bal")
    val got = DiffOps.applyChanges(base, changes, "k", "ts", "op",
        Seq("name", "bal"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a2", 12.0), (3L, "c", 30.0),
      (9L, "new", 99.0)))
    // applying an EMPTY log is the identity; re-applying the same log
    // to the result only re-asserts the same facts (idempotent)
    val again = DiffOps.applyChanges(
        got.toSeq.toDF("k", "name", "bal"), changes, "k", "ts", "op",
        Seq("name", "bal"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
    val re = DiffOps.applyChanges(base.repartition(5),
        changes.repartition(3), "k", "ts", "op", Seq("name", "bal"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq, "partitioning-independent")
  }
}
