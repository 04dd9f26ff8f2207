package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.PortableHash

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — exact; the O(|Q|·|C|) baseline. Fine
  *    when |Q| is small or as the verify stage after blocking.
  *  - random-hyperplane LSH bucketing — the scale path: sign-bit
  *    signatures from deterministic pseudo-random hyperplanes, equi-join
  *    on bucket, exact cosine re-rank inside buckets. At 100 TB the
  *    bucket join replaces the cross product with a shuffle on
  *    (band, bucket) keys.
  */
object SimilarityOps {

  /** Exact cosine top-k: for every row of `queries`, the `k` nearest
    * `corpus` rows by cosine (self-pairs excluded when ids collide).
    * Broadcast the queries side when it is small — Catalyst then plans a
    * broadcast nested-loop join and the corpus streams through one pass.
    */
  def bruteCosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1), derived from md5 so any engine can reproduce it.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    PortableHash.uniform01(lit(s"plane_$plane"), dim) * 2.0 - 1.0

  /** Sign-bit LSH signature: bit p = sign(v · plane_p). Returns a long
    * with `numPlanes` (<= 60) bits. Buckets group vectors by angular
    * region; cosine-similar vectors collide with high probability.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val dotP = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dotP > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** LSH-bucketed approximate top-k: `bands` independent signatures of
    * `planesPerBand` bits; candidates share a (band, signature) bucket;
    * exact cosine re-rank keeps the best k per query. Recall rises with
    * `bands`; cost scales with bucket occupancy, not |corpus|².
    */
  def lshCosineTopK(
      df: DataFrame, k: Int, bands: Int = 8, planesPerBand: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = array((0 until bands).map { b =>
      // distinct plane sets per band: offset the plane index
      (0 until planesPerBand).map { p =>
        val plane = b * planesPerBand + p
        val dotP = aggregate(
          zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
            (x, i) => x.cast("double") * planeComponent(plane, i)),
          lit(0.0), (acc, x) => acc + x)
        when(dotP > 0, shiftleft(lit(1L), p)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
    }: _*)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"), posexplode(sigs))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("id").as("query_id"), col("vec").as("q_vec"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("neighbor_id"), col("vec").as("c_vec"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_vec"), col("c_vec"))
      .distinct()
      .withColumn("cosine", VectorOps.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
