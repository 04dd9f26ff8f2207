package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{DedupOps, GraphOps}

/** Stage-level prober for the b_dup_components composition (r13
  * follow-up: the row read 23–62 s across fresh JVMs on a box whose
  * canary, pair stage (b_minhash_pairs) and CC stage (b_cc_alternating)
  * all read their committed values): times the verified-pair
  * materialization, each star-contraction round with its edge count,
  * and the convergence check separately, so a regression names a STAGE
  * instead of a composition.
  *
  * Usage: runMain graft.tools.CcProbe [attempts=2] with
  * SPARK_GRAFT_SF_DIR pointing at the fixture.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val attempts = if (args.nonEmpty) args(0).toInt else 2
    val spark = graft.core.GraftSession.build(appName = "graft-cc-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (i <- 1 to attempts) {
      println(s"== attempt $i")
      val pairs = t("pairs (minHashDedup)") {
        DedupOps.minHashDedup(
          Tables.documents(spark, dir), "text", "doc_id",
          threshold = 0.6, bands = 4, rowsPerBand = 4).localCheckpoint()
      }
      println(s"[ccprobe] pairs rows: ${pairs.count()}")
      var cur = t("e0 canonicalize") {
        pairs
          .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
          .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
          .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
          .distinct().localCheckpoint()
      }
      var round = 0
      var converged = false
      while (round < 25 && !converged) {
        val small = t(s"round $round contraction") {
          GraphOps.starContractionRound(cur).localCheckpoint()
        }
        converged = t(s"round $round convergence") {
          small.count() == cur.count() && small.except(cur).isEmpty
        }
        println(s"[ccprobe] round $round edges: ${small.count()}")
        cur = small
        round += 1
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
