package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("matches size(array_intersect) on random sorted distinct long arrays") {
    val r = new scala.util.Random(7)
    val cases = (0 until 100).map { _ =>
      val a = Seq.fill(r.nextInt(40))(r.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(r.nextInt(40))(r.nextInt(50).toLong).distinct.sorted
      (a, b)
    }
    val got = cases.toDF("a", "b").select(
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .as[(Int, Int)].collect()
    got.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("empty and disjoint arrays") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))
    ).toDF("a", "b")
    val got = df.select(
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 3))
  }
}
