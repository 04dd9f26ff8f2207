package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ProfileOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("profile counts nulls, distincts, and min/max per column in one frame") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("c"), None),
      (4L, Some("a"), Some(10))
    ).toDF("id", "s", "v")
    val got = ProfileOps.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") == (("s", 4L, 1L, 2L, Some("a"), Some("c"))))
    assert(got("v") == (("v", 4L, 1L, 2L, Some("10"), Some("30"))))
  }

  test("all-null column: zero distincts, null min/max") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val got = ProfileOps.profile(df, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    assert(got == (("s", 2L, 2L, 0L, None, None)))
  }
}
