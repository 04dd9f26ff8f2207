package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling (the Deequ/data-quality shape): per-column
  * completeness and domain statistics computed in ONE pass, emitted as
  * a stats dim of |columns| rows.
  *
  * Scale notes: the single aggregation carries (4 × |columns|) partial
  * cells; the exact distinct counts ride Spark's EXPAND strategy (one
  * shuffle, input × |distinct-aggs| rows). For very wide tables or
  * when approximate distincts suffice, swap the `countDistinct` cells
  * for [[SketchOps.hllRegistersBy]] estimates — the profile schema is
  * unchanged. min/max are cast to string so heterogeneous column
  * types share one stats frame (binary/UTF8 comparison semantics are
  * identical in Spark and the DuckDB oracle).
  */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stats = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }: _*)
    one.select(explode(stats).as("s")).select("s.*")
  }
}
