package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.DedupOps

/** The fused single-pass MinHash band-hash expression
  * ([[MinHashBandHashes]]) — the production LSH bucketing primitive.
  */
class MinHashBandHashesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def bh(xs: Seq[Long], bands: Int = 16, rpb: Int = 4): Seq[Long] = {
    val a = MinHashBandHashes.bandHashes(
      new GenericArrayData(xs.toArray), bands, rpb)
    (0 until a.numElements()).map(a.getLong)
  }

  test("pure function of the element SET: order/duplicates don't matter") {
    val base = bh(Seq(7L, 42L, -3L, 99L))
    assert(bh(Seq(99L, -3L, 42L, 7L)) == base)
    assert(bh(Seq(7L, 7L, 42L, -3L, 99L, 42L)) == base,
      "duplicate elements cannot change any min")
    assert(bh(Seq(7L, 42L, -3L)) != base)
  }

  test("matches a plain-Scala reference MinHash over the same constants") {
    // re-derive: band b hash = splitmix fold over mins of A_i*h+B_i
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val (bands, rpb) = (4, 3)
    val n = bands * rpb
    val as = (0 until n).map(i => mix(2L * i) | 1L)
    val bs = (0 until n).map(i => mix(2L * i + 1))
    val xs = Seq(5L, -17L, 123456789L)
    val mins = (0 until n).map(i => xs.map(h => as(i) * h + bs(i)).min)
    val expect = (0 until bands).map { b =>
      (0 until rpb).foldLeft(mix(b.toLong))((acc, r) => mix(acc ^ mins(b * rpb + r)))
    }
    assert(bh(xs, bands, rpb) == expect)
  }

  test("empty and null-element arrays are well-defined and equal") {
    val e1 = bh(Seq.empty)
    assert(e1.length == 16)
    val withNull = MinHashBandHashes.bandHashes(
      new GenericArrayData(Array[Any](null, null)), 16, 4)
    assert((0 until 16).map(withNull.getLong) == e1,
      "null elements are skipped, same buckets as empty")
  }

  test("banding statistics: near-identical sets collide, disjoint sets don't") {
    val xs = (1L to 200L).map(x => x * 0x9e3779b97f4a7c15L)
    val near = xs.drop(2) // J = 198/200
    val far = (1001L to 1200L).map(x => x * 0x517cc1b727220a95L)
    val b0 = bh(xs); val bNear = bh(near); val bFar = bh(far)
    assert(b0.zip(bNear).count { case (x, y) => x == y } >= 1,
      "J=0.99 should agree on at least one of 16 bands (p_miss ~ (1-.99^4)^16 ~ 1e-23)")
    assert(b0.zip(bFar).forall { case (x, y) => x != y },
      "disjoint sets should collide on no band")
  }

  test("codegen column path agrees with the eval path and buckets dups together") {
    val df = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "zz yy xx ww vv")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        MinHashBandHashes.minHashBandHashes(
          DedupOps.hashedTokenSet(col("text")), 16, 4).as("bh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == out(2L), "identical token sets share every band hash")
    assert(out(1L) != out(3L))
    assert(out(1L).length == 16)
  }
}
