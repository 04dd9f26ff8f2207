package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TopNgramFracSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ref(toks: Seq[String], n: Int): Double = {
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    if (grams.isEmpty) 0.0
    else grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size
  }

  test("matches a scala sliding-window reference on random token arrays (n=2,3)") {
    val r = new scala.util.Random(17)
    val cases = (0 until 200).map { _ =>
      Seq.fill(r.nextInt(50))(s"w${r.nextInt(6)}")
    }
    for (n <- Seq(2, 3)) {
      val got = cases.toDF("toks")
        .select(TopNgramFrac.topNgramFrac(col("toks"), n)).as[Double].collect()
      got.zip(cases.map(ref(_, n))).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-15)
      }
    }
  }

  test("edges: fewer tokens than n is 0.0; all-same is 1.0; null token = empty string") {
    val got = Seq(
      Seq.empty[Option[String]],
      Seq(Some("solo")),
      Seq(Some("a"), Some("a"), Some("a")),
      Seq(Some("a"), None, Some("a"), None)   // grams: "a ", " a", "a " -> 2/3
    ).toDF("toks")
      .select(TopNgramFrac.topNgramFrac(col("toks"), 2)).as[Double].collect().toSeq
    assert(got(0) == 0.0 && got(1) == 0.0 && got(2) == 1.0)
    assert(math.abs(got(3) - 2.0 / 3) < 1e-15)
  }
}
