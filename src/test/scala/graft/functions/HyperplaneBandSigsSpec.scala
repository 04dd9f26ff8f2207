package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.SimilarityOps

/** The fused hyperplane band signatures must be bit-identical to the
  * composable HOF construction they replace in `lshCosineTopK`.
  */
class HyperplaneBandSigsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fused expression is bit-identical to the composable formulation") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    val vecs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val both = vecs.select(
      HyperplaneBandSigs.hyperplaneBandSigs(col("embedding"), 8, 8, dim).as("fused"),
      SimilarityOps.composableBandSigs(col("embedding"), 8, 8, dim).as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).count() == 0)
    // signatures are discriminative, not degenerate
    assert(both.select(countDistinct(col("fused"))).as[Long].head() > 100)
  }

  test("length mismatch and null elements give all-zero signatures; null array is null") {
    val df = Seq(
      (1L, Some(Seq[Option[Float]](Some(1f), Some(2f)))),          // len 2 != dim 4
      (2L, Some(Seq[Option[Float]](Some(1f), None, Some(3f), Some(4f)))), // null elem
      (3L, Option.empty[Seq[Option[Float]]]),                      // null array
      (4L, Some(Seq[Option[Float]](Some(1f), Some(2f), Some(3f), Some(4f))))
    ).toDF("id", "embedding")
    val got = df.select(col("id"),
      HyperplaneBandSigs.hyperplaneBandSigs(col("embedding"), 4, 4, 4).as("sigs"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(got(1L) == Some(Seq(0L, 0L, 0L, 0L)))
    assert(got(2L) == Some(Seq(0L, 0L, 0L, 0L)))
    assert(got(3L) == None)
    assert(got(4L).get.exists(_ != 0L), "a real vector gets non-trivial signatures")
  }
}
