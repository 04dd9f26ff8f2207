package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import graft.core.GraftSession

/** Verify a SUBSET of the query registry — used to correctness-check
  * the scale-sensitive queries at sf0.1 without paying for the
  * quadratic-by-design pairwise validators.
  *
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <name1> <name2> ...
  * (then: python3 tools/check.py <sfDir> <outDir>)
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = GraftSession.build(appName = "graft-verify-subset")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => names.contains(q._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
