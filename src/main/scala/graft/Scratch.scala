package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val li = Tables.lineitem(spark, dir)
    li.count()

    // warm
    graft.ops.StatsOps.corrMatrix(li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).collect()

    time("corrMatrix full (2nd run)") {
      graft.ops.StatsOps.corrMatrix(li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).collect()
    }

    // plain decimal sums, no round
    val xs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c => col(c).cast("double"))
    val clean = li.filter(xs.map(_.isNotNull).reduce(_ && _))
      .select(xs.zipWithIndex.map { case (c, i) => c.as(s"x$i") }: _*)
    def t9(c: org.apache.spark.sql.Column) = round(c, 9).cast("decimal(38,9)")
    val aggsDec = Seq(count(lit(1)).as("n")) ++
      (0 until 4).flatMap(i => Seq(sum(t9(col(s"x$i"))).as(s"s$i"), sum(t9(col(s"x$i") * col(s"x$i"))).as(s"ss$i"))) ++
      (0 until 4).flatMap(i => (i + 1 until 4).map(j => sum(t9(col(s"x$i") * col(s"x$j"))).as(s"p${i}_$j")))
    clean.agg(aggsDec.head, aggsDec.tail: _*).collect()
    time("16 decimal(38,9) sums") { clean.agg(aggsDec.head, aggsDec.tail: _*).collect() }

    val aggsDbl = Seq(count(lit(1)).as("n")) ++
      (0 until 4).flatMap(i => Seq(sum(col(s"x$i")).as(s"s$i"), sum(col(s"x$i") * col(s"x$i")).as(s"ss$i"))) ++
      (0 until 4).flatMap(i => (i + 1 until 4).map(j => sum(col(s"x$i") * col(s"x$j")).as(s"p${i}_$j")))
    clean.agg(aggsDbl.head, aggsDbl.tail: _*).collect()
    time("16 double sums") { clean.agg(aggsDbl.head, aggsDbl.tail: _*).collect() }

    val aggsDec18 = Seq(count(lit(1)).as("n")) ++
      (0 until 4).flatMap(i => Seq(sum(round(col(s"x$i"), 9).cast("decimal(28,9)")).as(s"s$i"),
        sum(round(col(s"x$i") * col(s"x$i"), 9).cast("decimal(28,9)")).as(s"ss$i"))) ++
      (0 until 4).flatMap(i => (i + 1 until 4).map(j =>
        sum(round(col(s"x$i") * col(s"x$j"), 9).cast("decimal(28,9)")).as(s"p${i}_$j")))
    clean.agg(aggsDec18.head, aggsDec18.tail: _*).collect()
    time("16 decimal(28,9) sums") { clean.agg(aggsDec18.head, aggsDec18.tail: _*).collect() }

    println("=== corrMatrix explain ===")
    graft.ops.StatsOps.corrMatrix(li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).explain("formatted")

    spark.stop()
  }
}
