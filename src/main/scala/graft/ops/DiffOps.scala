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

  /** CDC MERGE-APPLY: fold an insert/update/delete change log into a
    * base snapshot — the Delta-`MERGE`/Hudi-upsert verb as a plain
    * two-step plan: (1) collapse the log to each key's LATEST change
    * (one keyed max-timestamp window; ties break on the op string
    * then every value column, so same-timestamp writes resolve
    * deterministically under any partitioning), (2) full-outer join with
    * the base and resolve: latest `D` drops the key, latest `I`/`U`
    * wins over the base row, untouched base rows pass through. A
    * delete for an absent key is a no-op (idempotent replay
    * semantics).
    *
    * Scale shape: ONE keyed window over the (small) change log + ONE
    * co-partitioned full-outer join on the key — the base never
    * shuffles more than the join demands, and the output is exactly
    * the next snapshot (pipe it back in tomorrow).
    *
    * `changes` must carry `opCol` ∈ {I, U, D}, `tsCol`, the key, and
    * the base's value columns (ignored for D).
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keyCol: String, tsCol: String,
      opCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "applyChanges: at least one value column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc +: col(opCol).desc +:
        valueCols.map(col(_).desc): _*)
    val latest = changes
      .select(col(keyCol) +: col(tsCol) +: col(opCol) +:
        valueCols.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", tsCol)
    val ch = valueCols.foldLeft(latest)((d, c) =>
      d.withColumnRenamed(c, s"__c_$c"))
      .withColumnRenamed(opCol, "__op")
    base.join(ch, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("__op").isNotNull, col(s"__c_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Slowly-changing-dimension TYPE 2 build from an append-only change
    * log: collapse each key's attribute timeline into closed validity
    * intervals — `(key, attrs..., valid_from, valid_to, is_current)`
    * with half-open `[valid_from, valid_to)` semantics and a NULL
    * `valid_to` on the live row. Consecutive log rows with identical
    * attributes (no-op upserts — the bulk of real CDC streams) are
    * collapsed into their first occurrence, so the dimension's size
    * tracks the CHANGE count, not the log volume.
    *
    * Determinism contract: rows order by `(tsCol, attrs...)` within a
    * key, so same-timestamp writes resolve identically under any
    * partitioning (same-timestamp same-attrs duplicates collapse; a
    * real changelog has at most one write per key per timestamp).
    * Attribute comparison is null-safe (`<=>`): NULL → value and
    * value → NULL both open a new version.
    *
    * Scale shape: one shuffle on the key; the change-collapse lag and
    * the interval lead are BOTH windows over the same
    * (partition, order) spec, so Catalyst reuses the exchange and the
    * sort — the log streams through a single keyed sort at any scale.
    */
  def scd2FromChangeLog(
      df: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2FromChangeLog: at least one attribute")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: attrCols.map(col): _*)
    val cur = struct(attrCols.map(col): _*)
    val changed = df
      .select(col(keyCol) +: col(tsCol) +: attrCols.map(col): _*)
      .withColumn("__prev", lag(cur, 1).over(w))
      .filter(col("__prev").isNull || !(cur <=> col("__prev")))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }
}
