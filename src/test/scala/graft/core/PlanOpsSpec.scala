package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The r14 optimization levers keep VALUES identical and only move
  * plan/lineage shape — pinned here so a future edit can't silently
  * turn a staging helper into a semantic one.
  */
class PlanOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("stageNarrow returns the exact input rows (lineage-only change)") {
    val df = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("k"),
        col("l_extendedprice").cast("double").as("x"))
    val staged = PlanOps.stageNarrow(df)
    assert(staged.schema == df.schema)
    // exact multiset equality, both directions
    assert(staged.exceptAll(df).isEmpty && df.exceptAll(staged).isEmpty)
  }

  test("stageNarrow feeds repeated passes without re-reading the source") {
    val staged = PlanOps.stageNarrow(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey")))
    // the staged frame's plan must be a checkpoint scan, not a file scan
    val plan = staged.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected a checkpoint-backed scan, got:\n$plan")
  }

  test("fanOutSmall fans a single-split estimate out to default parallelism") {
    val df = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    val fanned = PlanOps.fanOutSmall(df)
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(fanned.count() == df.count())
  }

  test("fanOutSmall is a structural no-op when the input exceeds one scan split") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // shrink the split size so the same frame estimates ABOVE it
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      val df = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
      val fanned = PlanOps.fanOutSmall(df)
      // no repartition node injected: same logical plan object
      assert(fanned.queryExecution.logical eq df.queryExecution.logical)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
