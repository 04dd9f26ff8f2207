package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** One SparkSession for the whole test JVM (suites share it; Spark
  * session startup dominates test wall-clock otherwise).
  */
object SharedSpark {
  lazy val spark: SparkSession =
    GraftSession.build(master = "local[4]", appName = "graft-test", shufflePartitions = 4)
}
