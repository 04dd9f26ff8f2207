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

  /** First-order journey TRANSITION PROBABILITIES (the Markov model
    * behind removal-effect attribution, Anderl et al. 2014): per
    * user, journeys split after each conversion; within a journey the
    * state sequence is `START → ch₁ → … → chₙ → CONV|NULL` (`CONV`
    * when the journey ends with a conversion event, `NULL` when the
    * data ends first). Output: `(src, dst, n, p)` with `p` the
    * row-normalized probability.
    *
    * Scale shape: two user-keyed windows (journey id = running prior
    * conversions; lag within journey) over the same sort, then one
    * (src, dst) count — the output is a |states|²-bounded dim
    * regardless of corpus size.
    */
  def transitionProbs(
      events: DataFrame, touchTypes: Seq[String],
      convType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val j = events
      .filter(col("event_type").isin((convType +: touchTypes).map(lit): _*))
      .withColumn("jid", coalesce(
        sum(when(col("event_type") === convType, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wj = Window.partitionBy(col("user_id"), col("jid"))
      .orderBy(col("ts"), col("event_id"))
    val touches = j.filter(col("event_type") =!= convType)
      .select(col("user_id"), col("jid"), col("ts"), col("event_id"),
        col("event_type").as("ch"))
    val steps = touches
      .select(coalesce(lag(col("ch"), 1).over(wj), lit("START")).as("src"),
        col("ch").as("dst"))
    val convFlag = j.groupBy("user_id", "jid")
      .agg(max(when(col("event_type") === convType, 1).otherwise(0))
        .as("has_conv"))
    val lastTouch = touches
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"), col("jid"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("jid"), col("ch"))
    val endSteps = convFlag
      .join(lastTouch, Seq("user_id", "jid"), "left")
      .select(coalesce(col("ch"), lit("START")).as("src"),
        when(col("has_conv") === 1, "CONV").otherwise("NULL").as("dst"))
    val trans = steps.unionByName(endSteps)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("src"))
    trans.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(bySrc).cast("double"))
  }

  /** REMOVAL-EFFECT attribution over the [[transitionProbs]] chain:
    * for each channel, rebuild the chain with that channel deleted
    * (its outgoing rows dropped, transitions INTO it redirected to
    * `NULL`) and compare the probability of reaching `CONV` from
    * `START` within `steps` hops — `removal_effect =
    * 1 − p_removed/p_full`. The k-step truncation (default 8) is the
    * PINNED, replayable form of the absorbing-chain solve: it
    * converges geometrically and every quantity is a finite float
    * expression a SQL oracle re-derives with k chained
    * join+aggregate stages — no linear solver in the contract.
    *
    * The transition dim is |states|²-bounded, so the driver-side fold
    * is the broadcast-dim contract (constant work), NOT a data-sized
    * collect. Output: `(channel, p_full, p_removed, removal_effect)`
    * per touch channel.
    */
  def markovRemovalEffects(
      events: DataFrame, touchTypes: Seq[String], convType: String,
      steps: Int = 8): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = events.sparkSession
    val probs = transitionProbs(events, touchTypes, convType)
      .select("src", "dst", "p")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def hitProb(removed: Option[String]): Double = {
      val adj = probs.iterator
        .filter { case (s, _, _) => !removed.contains(s) }
        .map { case (s, d, p) =>
          (s, if (removed.contains(d)) "NULL" else d, p) }
        .toSeq
        // deterministic fold order under any upstream partitioning
        .sortBy(t => (t._1, t._2))
        .groupBy(t => (t._1, t._2))
        .map { case ((s, d), ts) => (s, d, ts.map(_._3).sum) }
        .toSeq.sortBy(t => (t._1, t._2))
      var p = Map("CONV" -> 1.0).withDefaultValue(0.0)
      (1 to steps).foreach { _ =>
        val next = adj.groupBy(_._1).map { case (s, out) =>
          s -> out.sortBy(_._2).map(t => t._3 * p(t._2)).sum
        }
        p = (next ++ Map("CONV" -> 1.0, "NULL" -> 0.0)).withDefaultValue(0.0)
      }
      p("START")
    }
    val pFull = hitProb(None)
    val rows = touchTypes.sorted.map { c =>
      val pRem = hitProb(Some(c))
      (c, pFull, pRem,
        if (pFull > 0) 1.0 - pRem / pFull else 0.0)
    }
    import spark.implicits._
    rows.toDF("channel", "p_full", "p_removed", "removal_effect")
  }
}
