package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch ATTRIBUTION: distribute each conversion's credit over
  * the touchpoints that preceded it within a horizon — the batch
  * counterpart of [[graft.streaming.StreamingOps.streamingAttribution]]
  * (which emits the raw touch→conversion pairs continuously; these
  * operators turn pairs into channel credit under the standard
  * position models).
  *
  * Scale shape: the conv×touch pairing is a per-user time-range join
  * (shuffles key on `user_id` — same co-partitioning as the funnel
  * family); position ranks ride ONE window keyed by the conversion id.
  * Output is one row per (conversion, touch) edge — bounded by the
  * horizon, not the corpus — and the channel rollup is a
  * |channels|-row dim.
  */
object AttributionOps {

  /** Per-(conversion, touch) credit under four standard models:
    *
    *  - `credit_linear`  — 1/n to each of the n touches
    *  - `credit_first`   — all credit to the earliest touch
    *  - `credit_last`    — all credit to the latest touch
    *  - `credit_position`— U-shaped 40/20/40: 0.4 to first and last,
    *    the middle n−2 split 0.2 evenly (n=1 → 1.0, n=2 → 0.5/0.5)
    *
    * A touch qualifies when `conv_ts − horizon < touch_ts ≤ conv_ts`
    * for the same user. Ordering within a conversion is
    * `(touch_ts, touch_id)` — deterministic under ties. Conversions
    * with NO qualifying touch are absent (their credit belongs to
    * "direct"/unattributed, a caller-side anti-join).
    */
  def touchCredits(
      events: DataFrame, touchTypes: Seq[String], convType: String,
      horizonSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchCredits: at least one touch type")
    val touches = events
      .filter(col("event_type").isin(touchTypes.map(lit): _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"), col("event_type").as("channel"))
    val convs = events
      .filter(col("event_type") === convType)
      .select(col("user_id").as("__cu"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"), col("value").as("conv_value"))
    val paired = touches.join(convs,
      col("user_id") === col("__cu") &&
        col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - expr(s"INTERVAL $horizonSec seconds"))
    val byConv = Window.partitionBy(col("conv_id"))
    val ordered = byConv.orderBy(col("touch_ts"), col("touch_id"))
    val n = count(lit(1)).over(byConv)
    val pos = row_number().over(ordered)
    val nd = n.cast("double")
    paired
      .withColumn("pos", pos).withColumn("n_touches", n)
      .withColumn("credit_linear", lit(1.0) / nd)
      .withColumn("credit_first",
        when(col("pos") === 1, 1.0).otherwise(0.0))
      .withColumn("credit_last",
        when(col("pos") === col("n_touches"), 1.0).otherwise(0.0))
      .withColumn("credit_position",
        when(col("n_touches") === 1, 1.0)
          .when(col("n_touches") === 2, 0.5)
          .when(col("pos") === 1 || col("pos") === col("n_touches"), 0.4)
          .otherwise(lit(0.2) / (nd - lit(2.0))))
      .select("user_id", "conv_id", "conv_value", "touch_id", "channel",
        "pos", "n_touches", "credit_linear", "credit_first", "credit_last",
        "credit_position")
  }

  /** Channel rollup of [[touchCredits]]: per-channel credit totals
    * under each model (round-then-DECIMAL sums — exact and order-free,
    * the cross-engine parity pattern) plus the touch count. Each
    * model's column sums to the number of attributed conversions.
    */
  def channelAttribution(credits: DataFrame): DataFrame = {
    def dsum(c: String) =
      sum(round(col(c), 9).cast("decimal(38,9)")).cast("double").as(c)
    credits.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), dsum("credit_linear"),
        dsum("credit_first"), dsum("credit_last"), dsum("credit_position"))
  }
}
