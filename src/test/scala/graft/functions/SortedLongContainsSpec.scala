package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SortedLongContainsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("matches array_contains on random sorted arrays (hits and misses)") {
    val r = new scala.util.Random(11)
    val cases = (0 until 200).map { _ =>
      val arr = Seq.fill(r.nextInt(50))(r.nextInt(80).toLong).distinct.sorted
      (arr, r.nextInt(80).toLong)
    }
    val got = cases.toDF("a", "k").select(
      SortedLongContains.sortedLongContains(col("a"), col("k")).as("fast"),
      array_contains(col("a"), col("k")).as("ref"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("edges: empty array, first/last element, singleton, absent key") {
    val df = Seq(
      (Seq.empty[Long], 5L, false),
      (Seq(1L, 3L, 7L, 9L), 1L, true),   // first
      (Seq(1L, 3L, 7L, 9L), 9L, true),   // last
      (Seq(1L, 3L, 7L, 9L), 4L, false),  // between elements
      (Seq(5L), 5L, true),
      (Seq(5L), 6L, false),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Long.MaxValue, true)
    ).toDF("a", "k", "want")
    df.select(SortedLongContains.sortedLongContains(col("a"), col("k")), col("want"))
      .as[(Boolean, Boolean)].collect()
      .foreach { case (got, want) => assert(got == want) }
  }

  test("null array or null key yields null (nullSafeEval contract)") {
    val got = Seq(
      (Some(Seq(1L, 2L)), None: Option[Long]),
      (None: Option[Seq[Long]], Some(1L))
    ).toDF("a", "k")
      .select(SortedLongContains.sortedLongContains(col("a"), col("k")))
      .collect().map(_.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
  }
}
