package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trend analytics over pre-aggregated integer axes (days, weeks,
  * buckets) — the rolling-window family, built WITHOUT window
  * functions so the plan has no unpartitioned Window (all rows in one
  * task) and no range self-join: each source row contributes to the
  * `window` axis points it covers via a narrow explode, and one
  * map-side-combined aggregation per target point reassembles the
  * rolling frame. At 100 TB the input here is already a per-bucket
  * aggregate (a dim), so the explode factor is `window ×` a SMALL
  * frame — the event-sized table never re-shuffles.
  */
object TrendOps {

  /** Runtime-enforced one-row-per-axis-point precondition (ADVICE r6):
    * a duplicated `orderCol` value would silently double-count
    * contributions AND fan out the join-back — plausible wrong numbers.
    * The guard joins a per-point count and `assert_true`s it to 1, so
    * violated input ABORTS the query inside the same job (no extra
    * action); the filter on the assert's null result keeps the check
    * alive through column pruning. The axis frame is a small dim by
    * contract, so the extra keyed count is noise at any scale.
    */
  private def assertUniqueAxis(
      df: DataFrame, orderCol: String, op: String): DataFrame =
    df.join(
        df.groupBy(col(orderCol)).agg(count(lit(1)).as("__c"))
          .select(col(orderCol),
            assert_true(col("__c") === 1,
              concat(lit(s"$op: one row per '$orderCol' required; duplicated axis point "),
                col(orderCol).cast("string"))).as("__axis_ok")),
        Seq(orderCol))
      .filter(col("__axis_ok").isNull)
      .drop("__axis_ok")

  /** Rolling sum/avg over the trailing `window` axis points
    * (`RANGE BETWEEN window-1 PRECEDING AND CURRENT ROW` semantics,
    * partial windows included — the first points average over what
    * exists). `df` must hold ONE row per `orderCol` value (the
    * per-bucket aggregate — ENFORCED at runtime, violated input fails
    * the query); `valueCol` should be a DECIMAL for exact,
    * order-free accumulation (the float-parity rule) — the emitted
    * sum/avg are double casts of exact decimals.
    */
  def rollingAgg(
      df: DataFrame, orderCol: String, valueCol: String,
      window: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val u = assertUniqueAxis(df, orderCol, "rollingAgg")
    val contrib = u
      .select(col(orderCol).as("__src"), col(valueCol).as("__v"))
      .withColumn(orderCol,
        explode(sequence(col("__src"), col("__src") + lit(window - 1))))
    val rolled = contrib.groupBy(orderCol)
      .agg(sum(col("__v")).as("__sum"), count(lit(1)).as("n_terms"))
    // inner join back to the real axis points: contributions land on
    // every covered point, including ones absent from the data
    u.join(rolled, Seq(orderCol))
      .select(col(orderCol), col(valueCol),
        col("__sum").cast("double").as("roll_sum"),
        (col("__sum").cast("double") / col("n_terms")).as("roll_avg"),
        col("n_terms"))
  }

  /** Trailing-window anomaly score: each point's deviation from the
    * PRECEDING `window` points (current point excluded — the detector
    * must not condition on the value it judges), as a z-score against
    * the trailing population mean/std. Points with fewer than
    * `minPoints` trailing observations, or zero trailing variance,
    * get a NULL score. Same contribution-explode shape as
    * [[rollingAgg]] (targets `order+1 .. order+window`), decimal-exact
    * sum and sum-of-squares, one shared double formula — replays
    * bit-level in the oracle.
    */
  def rollingZScore(
      df: DataFrame, orderCol: String, valueCol: String,
      window: Int, minPoints: Int): DataFrame = {
    require(window > 0 && minPoints > 0, "window/minPoints must be positive")
    val u = assertUniqueAxis(df, orderCol, "rollingZScore")
    val contrib = u
      .select(col(orderCol).as("__src"), col(valueCol).as("__v"))
      .withColumn(orderCol,
        explode(sequence(col("__src") + 1, col("__src") + lit(window))))
    val rolled = contrib.groupBy(orderCol)
      .agg(count(lit(1)).as("n_prev"),
        sum(col("__v")).as("__sum"),
        sum(col("__v") * col("__v")).as("__sumsq"))
    val n = col("n_prev").cast("double")
    val mean = col("__sum").cast("double") / n
    // population variance; clamp the tiny negative float residue a
    // near-constant window can produce
    val variance = greatest(
      col("__sumsq").cast("double") / n - mean * mean, lit(0.0))
    u.join(rolled, Seq(orderCol), "left")
      .select(col(orderCol), col(valueCol),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        when(col("n_prev") >= minPoints && variance > 0,
          (col(valueCol).cast("double") - mean) / sqrt(variance)).as("z"))
  }

  /** Time-weighted average (TWAP): per key, each observation weighted
    * by how long it was "current" — the duration to the NEXT
    * observation of the same key (the last observation has no
    * duration and is dropped, the standard left-closed convention;
    * pass a sentinel end-of-horizon row to include it). The
    * irregular-sampling mean for sensor readings, prices, state
    * gauges — where the plain `avg` over-weights bursty periods.
    *
    * Portability: values are `round(·, 6)` then DECIMAL, weights are
    * exact micros, so every product and both sums are exact decimals;
    * the TWAP is one double division. One (key, ts) sort + one keyed
    * aggregation.
    */
  def twap(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieBreakCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieBreakCol)
    val dur = unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol))
    df.select(col(keyCol),
        round(col(valueCol), 6).cast(DecimalType(19, 6)).as("__v"),
        dur.as("__w"))
      .filter(col("__w").isNotNull)
      .groupBy(keyCol)
      .agg(
        (sum(col("__v") * col("__w")).cast("double") /
          sum(col("__w")).cast("double")).as("twap"),
        count(lit(1)).as("n_obs"))
  }
}
