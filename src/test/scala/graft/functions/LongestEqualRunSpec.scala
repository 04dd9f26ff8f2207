package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class LongestEqualRunSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("matches a scala fold on random sorted arrays") {
    val r = new scala.util.Random(13)
    val cases = (0 until 200).map { _ =>
      Seq.fill(r.nextInt(60))(s"w${r.nextInt(8)}").sorted
    }
    def ref(a: Seq[String]): Int = {
      var best = 0; var run = 0; var prev: String = null
      a.foreach { v =>
        run = if (v == prev) run + 1 else 1
        if (run > best) best = run
        prev = v
      }
      best
    }
    val got = cases.toDF("a")
      .select(LongestEqualRun.longestEqualRun(col("a"))).as[Int].collect()
    got.zip(cases.map(ref)).foreach { case (g, w) => assert(g == w) }
  }

  test("edges: empty array is 0, singleton is 1, null elements break runs") {
    val got = Seq(
      Seq.empty[Option[String]],
      Seq(Some("x")),
      Seq(Some("x"), None, Some("x")),          // run broken by null
      Seq(Some("x"), Some("x"), None, Some("x"))
    ).toDF("a").select(LongestEqualRun.longestEqualRun(col("a")))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 1, 1, 2))
  }
}
