package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: tumbling time buckets
  * and gap-based sessionization. Batch formulations here are the source
  * of truth (SURVEY §2.7); `graft.streaming` runs the same logic under
  * Structured Streaming.
  */
object SessionOps {

  /** Tumbling bucket of width `unit` (e.g. "hour") via date_trunc —
    * batch-equivalent of a Structured Streaming `window($"ts", ...)`.
    * Emitted as a formatted string for cross-engine hash parity.
    */
  def timeBucket(ts: Column, unit: String): Column =
    date_format(date_trunc(unit, ts), "yyyy-MM-dd HH:mm:ss")

  /** Gap sessionization: a new session starts when the gap from the
    * previous event of the same `keyCol` exceeds `gapSeconds`; session id
    * is the running count of boundary flags (first event of a key is
    * boundary 1, so ids are 1-based per key).
    *
    * One shuffle on `keyCol`; the two window functions share the same
    * (key, ts-order) frame so Spark evaluates them in a single sort.
    *
    * @param tieBreakCol deterministic order for same-timestamp events
    *        within a key (default matches the events fixture). Pass the
    *        caller's own unique column on frames without `event_id`.
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long,
      tieBreakCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieBreakCol)
    // microsecond integers, not unix_timestamp: second-truncation would
    // misclassify gaps within 1s of the threshold vs the oracle.
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    val boundary = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
