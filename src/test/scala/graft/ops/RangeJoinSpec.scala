package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** rangeJoinBucketed is differential-tested against the naive
  * (quadratic-per-key) formulation Spark would plan for the raw range
  * predicate — same rows, every cellWidth, including the half-open
  * boundary, negative coordinates, and empty/inverted intervals.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points.join(intervals, Seq("k"))
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private def bucketed(points: DataFrame, intervals: DataFrame, w: Long): Set[(Long, Long)] =
    JoinOps.rangeJoinBucketed(points, intervals, "k", "pt", "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches the naive range join for every cell width") {
    val rnd = new scala.util.Random(7)
    val points = (0 until 400).map { i =>
      (i.toLong, i.toLong % 5, rnd.nextLong(2000) - 1000)
    }.toDF("pid", "k", "pt")
    val intervals = (0 until 150).map { i =>
      val lo = rnd.nextLong(2000) - 1000
      (i.toLong, i.toLong % 5, lo, lo + rnd.nextLong(300))
    }.toDF("iid", "k", "lo", "hi")

    val want = naive(points, intervals)
    assert(want.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 7L, 100L, 250L, 10000L)) {
      assert(bucketed(points, intervals, w) == want, s"cellWidth=$w diverged")
    }
  }

  test("half-open boundaries: lo matches, hi does not; emitted exactly once") {
    val points = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 15L))
      .toDF("pid", "k", "pt")
    val intervals = Seq((100L, 0L, 10L, 20L)).toDF("iid", "k", "lo", "hi")
    val got = JoinOps.rangeJoinBucketed(
        points, intervals, "k", "pt", "lo", "hi", cellWidth = 3L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.toSet == Set((1L, 100L), (3L, 100L)))
    assert(got.length == 2, "each qualifying pair must be emitted exactly once")
  }

  test("empty and inverted intervals match nothing; other keys don't leak") {
    val points = Seq((1L, 0L, 5L), (2L, 1L, 5L)).toDF("pid", "k", "pt")
    val intervals = Seq(
      (10L, 0L, 5L, 5L),   // empty
      (11L, 0L, 9L, 3L),   // inverted
      (12L, 1L, 0L, 10L)   // valid, key 1 only
    ).toDF("iid", "k", "lo", "hi")
    assert(bucketed(points, intervals, 4L) == Set((2L, 12L)))
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    val points = Seq((1L, 0L, -7L), (2L, 0L, -1L), (3L, 0L, 0L))
      .toDF("pid", "k", "pt")
    val intervals = Seq((9L, 0L, -8L, 0L)).toDF("iid", "k", "lo", "hi")
    for (w <- Seq(3L, 5L, 8L))
      assert(bucketed(points, intervals, w) == Set((1L, 9L), (2L, 9L)), s"w=$w")
  }
}
