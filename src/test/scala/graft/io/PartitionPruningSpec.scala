package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.Tables

/** The 100 TB layout claim behind [[Sources.writeHivePartitioned]]:
  * a filter on the partition column must become a planner-level
  * PartitionFilter that selects only the matching directories — not a
  * row-level filter over every file.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.head
  }

  test("lang filter prunes to the matching partition directories") {
    val out = Files.createTempDirectory("hive-part").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sources.writeHivePartitioned(docs, out, Seq("lang"))

    // layout: one lang=<value> directory per distinct lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSet
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(dirs == langs.map(l => s"lang=$l"))

    val filtered = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang filter must be a PartitionFilter, got ${scan.partitionFilters}")
    // the scan's selected partitions are ONLY the en directory
    val selected = scan.selectedPartitions
    assert(selected.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${selected.partitionCount}")
    assert(selected.toPartitionArray
      .forall(_.filePath.toString.contains("lang=en")))

    // and the data round-trips
    val want = docs.filter(col("lang") === "en").count()
    assert(filtered.count() == want)
  }

  test("no filter scans all partitions; non-partition filter stays row-level") {
    val out = Files.createTempDirectory("hive-part-all").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sources.writeHivePartitioned(docs, out, Seq("lang"))
    val nLangs = docs.select("lang").distinct().count().toInt

    assert(scanOf(spark.read.parquet(out)).selectedPartitions.partitionCount == nLangs)

    val rowFiltered = spark.read.parquet(out).filter(col("n_chars") > 100)
    val scan = scanOf(rowFiltered)
    assert(scan.selectedPartitions.partitionCount == nLangs,
      "a non-partition filter must not prune directories")
    assert(scan.dataFilters.nonEmpty, "n_chars must remain a data filter")
  }
}
