package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scratch diagnostic for LSH occupancy tuning: candidate-pair counts
  * and hot-bucket histogram for the b_tfidf_ann fixture at a given cap.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.LshProbe <cap...>
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = graft.ops.SearchOps.hashedTfidf(
      Tables.documents(spark, sfDir), "text", "doc_id", dim = 256)
    val t0v = System.nanoTime()
    vecs.persist().count()
    println(s"tfidf once: ${(System.nanoTime() - t0v) / 1e9}")
    args.map(_.toInt).foreach { cap =>
      val t0 = System.nanoTime()
      val topk = graft.ops.SimilarityOps.lshCosineTopK(
        vecs, k = 10, idCol = "doc_id", vecCol = "embedding",
        dim = 256, maxBucket = cap)
      val n = topk.count()
      println(s"cap=$cap topkRows=$n sec=${(System.nanoTime() - t0) / 1e9}")
      if (cap == args.head.toInt) {
        val plan = topk.queryExecution.executedPlan.toString
        println("ReusedExchange in plan: " + plan.contains("ReusedExchange"))
        println("Exchange count: " + "Exchange".r.findAllIn(plan).length)
      }
    }
    spark.stop()
  }
}
