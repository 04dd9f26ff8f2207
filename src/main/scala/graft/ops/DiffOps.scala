package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the incremental-ingest primitive: given two versions
  * of a keyed table (yesterday's landed corpus, today's), classify every
  * key as `added` (new only), `removed` (old only) or `changed` (present
  * in both with any compared column differing). Unchanged keys are
  * dropped — at 100 TB the diff output is proportional to the churn,
  * not the corpus.
  *
  * Scale shape: ONE full-outer sort-merge join co-partitioned on the key
  * (both sides shuffle once on the same key, no broadcast assumption —
  * snapshots are both corpus-sized); the change classification is a
  * narrow codegen'd projection using null-safe comparison (`<=>`), so
  * NULL → NULL counts as equal and NULL → value as changed. Keys are
  * assumed unique per snapshot (primary-key contract); duplicate keys
  * would fan out the join like any relational diff.
  */
object DiffOps {

  /** `(keyCols..., change)` for every non-identical key, `change ∈`
    * {`added`, `removed`, `changed`}. `compareCols` defaults to every
    * non-key column shared by both frames (in `oldDf`'s column order).
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: at least one key column")
    val shared = if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c =>
        !keyCols.contains(c) && newDf.columns.contains(c)).toSeq
    val o = oldDf.select((keyCols ++ shared).map(col): _*)
      .withColumn("__old", lit(1))
    val n0 = newDf.select((keyCols ++ shared).map(col): _*)
      .withColumn("__new", lit(1))
    val nn = shared.foldLeft(n0)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = o.join(nn, keyCols, "full_outer")
    val sameVals = shared.map(c => col(c) <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    joined
      .withColumn("change",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!sameVals, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
