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

  /** Rolling sum/avg over the trailing `window` axis points
    * (`RANGE BETWEEN window-1 PRECEDING AND CURRENT ROW` semantics,
    * partial windows included — the first points average over what
    * exists). `df` must hold ONE row per `orderCol` value (the
    * per-bucket aggregate); `valueCol` should be a DECIMAL for exact,
    * order-free accumulation (the float-parity rule) — the emitted
    * sum/avg are double casts of exact decimals.
    */
  def rollingAgg(
      df: DataFrame, orderCol: String, valueCol: String,
      window: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val contrib = df
      .select(col(orderCol).as("__src"), col(valueCol).as("__v"))
      .withColumn(orderCol,
        explode(sequence(col("__src"), col("__src") + lit(window - 1))))
    val rolled = contrib.groupBy(orderCol)
      .agg(sum(col("__v")).as("__sum"), count(lit(1)).as("n_terms"))
    // inner join back to the real axis points: contributions land on
    // every covered point, including ones absent from the data
    df.join(rolled, Seq(orderCol))
      .select(col(orderCol), col(valueCol),
        col("__sum").cast("double").as("roll_sum"),
        (col("__sum").cast("double") / col("n_terms")).as("roll_avg"),
        col("n_terms"))
  }
}
