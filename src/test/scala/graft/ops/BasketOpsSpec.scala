package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class BasketOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("associationRules: hand-checked support/confidence/lift; in-basket dups count once") {
    // baskets: b1={x,y}, b2={x,y}, b3={x}, b4={y,z} — x appears twice
    // in b1 to check the distinct rule
    val df = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "y"), (4L, "z")
    ).toDF("basket", "item")
    val got = BasketOps.associationRules(df, Seq("basket"), "item")
      .select("item_a", "item_b", "n_ab", "support", "confidence", "lift")
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    // n(x)=3, n(y)=3, n(z)=1, baskets=4, n(x,y)=2
    val xy = got(("x", "y"))
    assert(xy._3 == 2L)
    assert(xy._4 == 2.0 / 4.0, "support = n_ab / baskets")
    assert(xy._5 == 2.0 / 3.0, "confidence = n_ab / n_a")
    assert(xy._6 == (2.0 * 4.0) / (3.0 * 3.0), "lift")
    val yz = got(("y", "z"))
    assert(yz._3 == 1L && yz._5 == 1.0 / 3.0)
    assert(got(("z", "y"))._5 == 1.0, "z always co-occurs with y")
    assert(!got.contains(("x", "z")), "never co-occurring pairs are absent")
    // directed: both directions present with mirrored counts
    assert(got(("y", "x"))._3 == 2L)
  }

  test("rules are repartition-invariant") {
    val rows = (0 until 300).map(i => (i.toLong % 40, s"i${i % 7}"))
    val a = BasketOps.associationRules(
      rows.toDF("basket", "item"), Seq("basket"), "item")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    val b = BasketOps.associationRules(
      rows.toDF("basket", "item").repartition(13), Seq("basket"), "item")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("itemNeighbors: cosine scores, deterministic tiebreak, k cut") {
    // baskets: {a,b,c}, {a,b}, {a,c}: n(a)=3 n(b)=2 n(c)=2,
    // n(ab)=2 n(ac)=2 n(bc)=1
    val rows = Seq(
      ("b1", "a"), ("b1", "b"), ("b1", "c"),
      ("b2", "a"), ("b2", "b"),
      ("b3", "a"), ("b3", "c"))
    val got = BasketOps.itemNeighbors(
        rows.toDF("basket", "item"), Seq("basket"), "item", k = 1)
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    // a: b and c tie at 2/sqrt(3*2); tiebreak picks b
    assert(got("a")._1 == "b")
    assert(math.abs(got("a")._2 - 2.0 / math.sqrt(6.0)) < 1e-12)
    // b: a scores 2/sqrt(2*3) > c 1/sqrt(2*2)
    assert(got("b")._1 == "a")
    assert(got("c")._1 == "a")
    val k2 = BasketOps.itemNeighbors(
        rows.toDF("basket", "item"), Seq("basket"), "item", k = 2)
      .as[(String, String, Long, Double, Int)].collect()
    assert(k2.count(_._1 == "a") == 2 && k2.map(_._5).forall(r => r == 1 || r == 2))
  }

  test("recommendItems: owned items excluded, scores sum over sources") {
    // u1{A,B} u2{A,C} u3{B,C}: every pair co-occurs once, all item
    // counts 2 -> every neighbor cosine = 1/2. u1's candidates: C via
    // A (0.5) + C via B (0.5) -> score 1.0 from 2 sources; A and B
    // are owned and must not appear
    val df = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "C"),
      ("u3", "B"), ("u3", "C")).toDF("u", "item")
    val r = BasketOps.recommendItems(df, "u", Seq("u"), "item",
        kNeighbors = 2, topN = 1)
      .as[(String, String, Long, Double, Int)].collect().sortBy(_._1).toSeq
    assert(r.map(x => (x._1, x._2)) ==
      Seq(("u1", "C"), ("u2", "B"), ("u3", "A")), s"got $r")
    r.foreach { x =>
      assert(x._3 == 2L && math.abs(x._4 - 1.0) < 1e-9 && x._5 == 1)
    }

    // a user owning everything gets no recommendations
    val full = df.union(Seq(("u4", "A"), ("u4", "B"), ("u4", "C"))
      .toDF("u", "item"))
    assert(BasketOps.recommendItems(full, "u", Seq("u"), "item", 2, 3)
      .filter($"u" === "u4").count() == 0L)
  }
}
