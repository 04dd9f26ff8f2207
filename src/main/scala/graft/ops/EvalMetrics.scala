package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification metric block — the reference's `evaluate`
  * (`src/util.py:136-156`) rewritten as pure relational algebra, no UDAF:
  * per-class TP/FP/FN via conditional sums, micro-F1 from global counts,
  * macro-F1 as the unweighted mean of per-class F1 with sklearn's
  * zero-division→0 rule, accuracy as mean(pred == label).
  *
  * The class set for macro averaging is the union of classes present in
  * labels or predictions (sklearn `f1_score(average='macro')` default).
  *
  * Scales: one shuffle (groupBy class) over pre-aggregated counts, then a
  * tiny (|classes|-row) reduction — no per-row state, streaming-friendly.
  */
object EvalMetrics {

  /** From a (pred, label) DataFrame, one row:
    * (micro_f1, macro_f1, accuracy) — all double.
    *
    * In single-label multiclass, micro-F1 == accuracy; both are computed
    * independently here anyway (micro from TP/FP/FN totals) so the
    * equality is a test invariant rather than an assumption.
    */
  def f1Block(df: DataFrame, pred: String, label: String): DataFrame = {
    val p = col(pred)
    val l = col(label)
    // one row per (class, side) contribution: count rows where the class
    // appears as pred (tp+fp) / as label (tp+fn) / as both (tp).
    val perClass = df
      .select(explode(array_distinct(array(p, l))).as("cls"), p.as("p"), l.as("l"))
      .groupBy("cls")
      .agg(
        sum(when(col("p") === col("cls") && col("l") === col("cls"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") === col("cls") && col("l") =!= col("cls"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("l") === col("cls") && col("p") =!= col("cls"), 1L).otherwise(0L)).as("fn"))
    val f1 = safeDiv(lit(2.0) * col("tp"), lit(2.0) * col("tp") + col("fp") + col("fn"))
    val macroDf = perClass.agg(
      avg(f1).as("macro_f1"),
      sum("tp").cast("double").as("tps"),
      sum("fp").cast("double").as("fps"),
      sum("fn").cast("double").as("fns"))
    val micro = safeDiv(lit(2.0) * col("tps"), lit(2.0) * col("tps") + col("fps") + col("fns"))
    val acc = df.agg(avg(when(p === l, 1.0).otherwise(0.0)).as("accuracy"))
    macroDf.select(micro.as("micro_f1"), col("macro_f1")).crossJoin(acc)
  }

  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0.0, 0.0).otherwise(num / den)
}
