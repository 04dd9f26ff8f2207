package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** quantileBuckets + clusterDiversitySample contracts: band membership
  * matches a hand percentile, NULLs tag NULL, the diversity sample
  * keeps the farthest-from-centroid members, and caps bind per
  * cluster.
  */
class QuantileClusterSampleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("quantileBuckets tags tercile bands with NULLs excluded") {
    // values 1..9: terciles over round(v,6); DuckDB/Spark interpolated
    // cutoffs at p=1/3, 2/3 of n=9 are 3.666.. and 6.333..
    val df = ((1 to 9).map(i => (i.toLong, Some(i.toDouble))) :+
      (10L, None: Option[Double]))
      .toDF("id", "v")
    val out = CurationOps.quantileBuckets(
        df, "v", "id", Seq(1.0 / 3, 2.0 / 3), Seq("head", "middle", "tail"))
      .select("id", "bucket").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert((1 to 3).forall(i => out(i.toLong).contains("head")))
    assert((4 to 6).forall(i => out(i.toLong).contains("middle")))
    assert((7 to 9).forall(i => out(i.toLong).contains("tail")))
    assert(out(10L).isEmpty, "NULL value must tag NULL")
  }

  test("quantileBuckets label count must be probs count + 1") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      CurationOps.quantileBuckets(df, "v", "id", Seq(0.5), Seq("only"))
    }
  }

  private val Dim = 8

  /** id 0 sits ON axis `axis`; higher wobble = farther from it. */
  private def wobbled(axis: Int, wobble: Float): Seq[Float] = {
    val v = Array.fill(Dim)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % Dim) = wobble
    v.toSeq
  }

  // two angular groups of 5 on axes 0 and 4, wobble grows with rank
  private def planted = (0L until 10L).map { id =>
    (id, wobbled(if (id < 5) 0 else 4, 0.1f * (id % 5)))
  }.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("diversity sample keeps the farthest-from-centroid members per cluster") {
    val kept = SimilarityOps.clusterDiversitySample(
        planted, "embedding", "vec_id", k = 2, iters = 3, dim = Dim, cap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(kept.length == 4)
    // the centroid sits at the mean wobble (0.2), so the farthest
    // members per group are the wobble EXTREMES 0.0 and 0.4 — ids 0,4
    // and 5,9 — not the largest wobbles
    assert(kept.map(_._1).toSet == Set(0L, 4L, 5L, 9L), kept.mkString(", "))
    // within each cluster every kept cosine is <= every dropped one
    val keptIds = kept.map(_._1).toSet
    val all = SimilarityOps.clusterDiversitySample(
        planted, "embedding", "vec_id", k = 2, iters = 3, dim = Dim, cap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    for (cl <- all.map(_._2).distinct) {
      val (in, outv) = all.filter(_._2 == cl).partition(t => keptIds(t._1))
      assert(in.map(_._3).max <= outv.map(_._3).min + 1e-12)
    }
  }

  test("cap larger than any cluster keeps every valid vector") {
    val kept = SimilarityOps.clusterDiversitySample(
        planted, "embedding", "vec_id", k = 2, iters = 2, dim = Dim, cap = 100)
    assert(kept.count() == 10)
  }
}
