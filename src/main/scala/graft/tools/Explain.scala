package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * so shuffle count, broadcast choices, pushed filters, and
  * whole-stage-codegen coverage can be reviewed (the "is this the plan
  * you'd want at 100 TB" check).
  *
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // registry queries + the bench-only production scale paths
    val all = SparkEntry.queries ++ graft.Bench.scaleBenches
    val names = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    names.foreach { name =>
      all.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          fn(spark, dir).explain("formatted")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
