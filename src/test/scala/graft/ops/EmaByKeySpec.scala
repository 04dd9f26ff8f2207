package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** OP-33 scale path: [[VectorOps.emaByKey]] (linear sequential pass)
  * must agree with the windowed closed form on small data and handle a
  * long sequence the O(n²) window form cannot.
  */
class EmaByKeySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("emaByKey matches the windowed ema on multi-key data") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("a", 4, 40.0),
      ("b", 1, 100.0), ("b", 2, 0.0),
      ("c", 1, -3.5)
    ).toDF("k", "t", "x")
    val w = Window.partitionBy("k").orderBy("t")
    val win = df.withColumn("ema", VectorOps.ema(col("x"), 0.9, w))
      .select("k", "t", "ema").as[(String, Int, Double)].collect().toMap2
    val lin = VectorOps.emaByKey(df, "k", "t", "x", 0.9)
      .select("k", "t", "ema").as[(String, Int, Double)].collect().toMap2
    assert(lin.keySet == win.keySet)
    lin.foreach { case (kt, v) => assert(math.abs(v - win(kt)) < 1e-12, s"$kt") }
  }

  implicit private class Pairs(rows: Array[(String, Int, Double)]) {
    def toMap2: Map[(String, Int), Double] = rows.map { case (k, t, v) => (k, t) -> v }.toMap
  }

  test("null values emit null and leave the running state unchanged") {
    val df = Seq(("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, Some(20.0)))
      .toDF("k", "t", "x")
    val got = VectorOps.emaByKey(df, "k", "t", "x", 0.5)
      .orderBy("t").select("ema").collect()
    assert(got(0).getDouble(0) == 10.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 15.0, "state carried over the null row")
  }

  test("windowed ema agrees with emaByKey ON NULL ROWS too (null → null, state carries)") {
    // leading null, mid-run null, and a key that is ALL nulls
    val df = Seq(
      ("a", 1, None), ("a", 2, Some(10.0)), ("a", 3, None), ("a", 4, Some(20.0)),
      ("b", 1, None), ("b", 2, None)
    ).toDF("k", "t", "x")
    val w = Window.partitionBy("k").orderBy("t")
    val win = df.withColumn("ema", VectorOps.ema(col("x"), 0.5, w))
      .orderBy("k", "t").select("ema").collect()
    val lin = VectorOps.emaByKey(df, "k", "t", "x", 0.5)
      .orderBy("k", "t").select("ema").collect()
    (win zip lin).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.isNullAt(0) == b.isNullAt(0), s"row $i null parity")
      if (!a.isNullAt(0)) assert(a.getDouble(0) == b.getDouble(0), s"row $i value")
    }
    assert(win(0).isNullAt(0) && win(2).isNullAt(0), "null rows emit null")
    assert(win(3).getDouble(0) == 15.0, "state carried across the null row")
  }

  test("10k-element sequence matches a sequential fold (the linear-time contract)") {
    val n = 10000
    val xs = (0 until n).map(i => ((i * 2654435761L) % 1000).toDouble / 10.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i, x) }.toDF("k", "t", "x")
    val got = VectorOps.emaByKey(df, "k", "t", "x", 0.99)
      .orderBy("t").select("ema").as[Double].collect()
    // plain sequential reference fold
    val expect = xs.tail.scanLeft(xs.head)((e, x) => e * 0.99 + x * 0.01)
    assert(got.length == n)
    var i = 0
    while (i < n) {
      assert(math.abs(got(i) - expect(i)) < 1e-9, s"position $i")
      i += 1
    }
  }
}
