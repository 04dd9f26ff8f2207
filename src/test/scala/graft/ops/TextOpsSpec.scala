package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Differential tests for the cut_min / combine_text truncation algebra
  * (reference `src/data_helper.py:41-86`): the Column implementation is
  * checked against a direct Scala re-statement of the Python semantics
  * over generated cases covering every branch.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Direct port of the reference `cut_min` semantics for oracle use. */
  private def cutMinRef(s: Vector[String], need: Int, minLen: Int): (Vector[String], Int) =
    if (need < s.length - minLen) {
      val mid = (s.length - need) / 2
      (s.take(mid) ++ s.takeRight(mid), -1)
    } else {
      val mid = minLen / 2
      (s.take(mid) ++ s.takeRight(mid), need - (s.length - minLen))
    }

  /** Direct port of the reference `combine_text` control flow. */
  private def assembleRef(
      a: Vector[String], b: Vector[String], c: Vector[String],
      budget: Int, minA: Int, minB: Int, minC: Int): Vector[String] = {
    var (sa, sb, sc) = (a, b, c)
    var need = a.length + b.length + c.length - budget
    if (need > 0 && sb.length > minB) { val r = cutMinRef(sb, need, minB); sb = r._1; need = r._2 }
    if (need > 0 && sc.length > minC) { val r = cutMinRef(sc, need, minC); sc = r._1; need = r._2 }
    if (need > 0 && sa.length > minA) { val r = cutMinRef(sa, need, minA); sa = r._1; need = r._2 }
    sa ++ sb ++ sc
  }

  private def toks(n: Int, prefix: String): Vector[String] =
    (0 until n).map(i => s"$prefix$i").toVector

  test("budgetedAssemble matches the reference algebra on every branch") {
    // lengths covering: no cut; second-only; second+third; all three;
    // exactly-at-budget; one-over; fields at/below floors; empties.
    val cases = for {
      la <- Seq(0, 2, 4, 5, 8, 20)
      lb <- Seq(0, 3, 5, 6, 10, 30)
      lc <- Seq(0, 2, 5, 7, 12, 25)
    } yield (toks(la, "a"), toks(lb, "b"), toks(lc, "c"))

    val df = cases.toDF("a", "b", "c")
    val got = df.select(
      TextOps.budgetedAssemble(col("a"), col("b"), col("c"), 16, 4, 5, 5).as("out"))
      .as[Seq[String]].collect()

    cases.zip(got).foreach { case ((a, b, c), actual) =>
      val expected = assembleRef(a, b, c, 16, 4, 5, 5)
      assert(actual == expected,
        s"lengths (${a.length},${b.length},${c.length}): got $actual, want $expected")
    }
  }

  test("assembled length never exceeds budget when cuts can satisfy it") {
    val cases = for {
      la <- 5 to 30 by 5; lb <- 6 to 36 by 6; lc <- 6 to 30 by 6
    } yield (toks(la, "a"), toks(lb, "b"), toks(lc, "c"))
    val df = cases.toDF("a", "b", "c")
    val got = df.select(size(
      TextOps.budgetedAssemble(col("a"), col("b"), col("c"), 16, 4, 5, 5)).as("n"))
      .as[Int].collect()
    cases.zip(got).foreach { case ((a, b, c), n) =>
      val ref = assembleRef(a, b, c, 16, 4, 5, 5)
      assert(n == ref.length)
      // the reference algebra may undershoot (floor halving) but the
      // result is never longer than the uncut total
      assert(n <= a.length + b.length + c.length)
    }
  }

  test("flattenOcr concatenates text fields in order") {
    val df = Seq(
      (Seq((1.0, "he"), (2.0, "llo")), "hello"),
      (Seq.empty[(Double, String)], "")
    ).toDF("raw", "want")
      .select(col("want"), expr("transform(raw, x -> struct(x._1 as time, x._2 as text))").as("ocr"))
    val got = df.select(TextOps.flattenOcr(col("ocr")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w) }
  }

  test("whitespaceTokenize drops empty tokens; padTo/attentionMask invariants") {
    val df = Seq("a  b c", "", "  ", "x").toDF("t")
    val got = df.select(TextOps.whitespaceTokenize(col("t")).as("toks")).as[Seq[String]].collect()
    assert(got.toSeq == Seq(Seq("a", "b", "c"), Seq(), Seq(), Seq("x")))

    val ids = Seq(Seq(1, 2, 3), Seq.empty[Int], (1 to 10).toSeq).toDF("ids")
    val padded = ids.select(
      TextOps.padTo(col("ids"), 5).as("p"),
      TextOps.attentionMask(col("ids"), 5).as("m")).as[(Seq[Int], Seq[Int])].collect()
    padded.foreach { case (p, m) =>
      assert(p.length == 5 && m.length == 5)
      assert(m.sum == math.min(m.count(_ == 1), 5))
    }
    assert(padded(0)._1 == Seq(1, 2, 3, 0, 0))
    assert(padded(2)._1 == (1 to 5).toSeq) // truncation keeps head
  }

  test("stripSpaces removes exactly ASCII spaces (OP-13 reference semantics)") {
    val got = Seq("a b  c", " x ", "", "tab\tkeeps", "nb sp")
      .toDF("s").select(TextOps.stripSpaces(col("s"))).as[String].collect().toSeq
    // the reference strips ' ' only — tabs and NBSP survive
    assert(got == Seq("abc", "x", "", "tab\tkeeps", "nb sp"))
  }
}
