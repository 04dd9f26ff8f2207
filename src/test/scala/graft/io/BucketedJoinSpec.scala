package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Bucketing is only worth its write cost if the downstream join
  * actually skips its shuffles — assert that on the physical plan, and
  * that results are identical to the plain-parquet join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("equal-bucket join of two bucketed tables plans with zero shuffle exchanges") {
    val left = (0L until 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 2000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Sources.writeBucketed(left, "bkt_left", 8, Seq("k"), Seq("k"))
    Sources.writeBucketed(right, "bkt_right", 8, Seq("k"), Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and the co-located join returns exactly the plain join's rows
      val got = joined.select(col("k"), col("lv"), col("rv"))
        .as[(Long, String, Double)].collect().toSet
      val expected = left.join(right, "k")
        .as[(Long, String, Double)].collect().toSet
      assert(got == expected && got.size == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val df = (0L until 1000L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    Sources.writeBucketed(df, "bkt_agg", 4, Seq("k"))
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$plan")
      val total = agg.select(sum("s")).as[Double].head()
      assert(total == (0L until 1000L).map(_.toDouble).sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_agg")
    }
  }
}
