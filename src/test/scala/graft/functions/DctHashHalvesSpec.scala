package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** pHash: DCT correctness vs a naive independent reference,
  * orthonormality, the exact contrast-invariance property, null
  * contracts, and near-dup retrieval through the shared banding.
  */
class DctHashHalvesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def grid(seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextDouble() * 255.0)
  }

  test("dct2d8 matches the naive O(N^4) direct form and preserves energy " +
      "(orthonormal basis)") {
    val b = DctHashHalves.basis8
    for (seed <- 1 to 5) {
      val g = grid(seed)
      val c = DctHashHalves.dct2d8(g)
      // naive direct 2-D DCT-II, independent summation order
      for (u <- 0 until 8; v <- 0 until 8) {
        var acc = 0.0
        for (x <- 0 until 8; y <- 0 until 8)
          acc += b(u * 8 + x) * b(v * 8 + y) * g(x * 8 + y)
        assert(math.abs(acc - c(u * 8 + v)) < 1e-9,
          s"coefficient ($u,$v) differs: $acc vs ${c(u * 8 + v)}")
      }
      val eg = g.map(x => x * x).sum
      val ec = c.map(x => x * x).sum
      assert(math.abs(eg - ec) / eg < 1e-12, "Parseval violated")
    }
  }

  test("contrast scaling by a power of two is hash-EXACT; identical grids " +
      "hash identically") {
    val g = grid(42).map(_.toFloat).toSeq
    val doubled = g.map(x => x * 2f)
    val rows = Seq((1L, g), (2L, g), (3L, doubled)).toDF("id", "v")
      .select(col("id"), DctHashHalves.dctHashHalves(col("v")).as("h"))
      .select(col("id"), col("h.hi"), col("h.lo"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) == rows(3L),
      "×2 contrast scales every coefficient and the median exactly — bits identical")
  }

  test("null contracts: wrong length or a null cell hashes to NULL") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq.fill(63)(1.0f)),
      Row(2L, (Seq.fill(63)(1.0f) :+ null).asInstanceOf[Seq[Any]]),
      Row(3L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = df.select(DctHashHalves.dctHashHalves(col("v"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("imageNearDupsDct finds a planted exact duplicate at Hamming 0 and " +
      "keeps unrelated random grids apart") {
    val dup = grid(7).map(_.toFloat).toSeq
    val rows = (10 until 40).map(i => (i.toLong, grid(i).map(_.toFloat).toSeq)) ++
      Seq((100L, dup), (101L, dup))
    val pairs = graft.ops.MultimodalOps.imageNearDupsDct(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((100L, 101L, 0)), s"planted dup missing: $pairs")
    assert(pairs.forall { case (a, b, _) => a == 100L && b == 101L },
      s"random grids must not collide at Hamming <= 3: $pairs")
  }
}
