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

  /** AUTOCORRELATION per key at lags `1..maxLag` — the seasonality
    * probe over a per-bucket series (daily revenue, hourly events):
    * `acf(k) = Σ_t d_t·d_{t+k} / Σ_t d_t²` with `d = x − x̄` (the
    * variance-normalized estimator — the denominator runs over the
    * FULL series, so acf(k) ∈ [−1, 1] and decays with lag). Pairs come
    * from a keyed equi-join on `(key, idx + k)` — exact-offset
    * semantics, so axis GAPS simply contribute no pair (never a
    * silently misaligned `lag()`-row pair), and the plan is
    * partition-parallel with NO window at all. Means and both sums
    * accumulate round-then-DECIMAL (exact, order-free); lags with no
    * pairs emit `n_pairs = 0` and NULL acf only when the series has
    * zero variance.
    *
    * `df` must hold one row per `(key, idx)` (the per-bucket
    * aggregate); `idxCol` is an integer axis.
    */
  def acfByKey(
      df: DataFrame, keyCol: String, idxCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag > 0, s"maxLag must be positive, got $maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    def d6(c: org.apache.spark.sql.Column) =
      sum(round(c, 6).cast("decimal(38,6)")).cast("double")
    def d9(c: org.apache.spark.sql.Column) =
      sum(round(c, 9).cast("decimal(38,9)")).cast("double")
    val s = df.select(col(keyCol).as("__k"),
        col(idxCol).cast("long").as("__i"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val st = s.groupBy("__k").agg(count(lit(1)).as("n"),
      (d6(col("__x")) / count(lit(1)).cast("double")).as("__mean"))
    val dev = s.join(st, Seq("__k"))
      .select(col("__k"), col("__i"), (col("__x") - col("__mean")).as("__d"))
    val den = dev.groupBy("__k").agg(d9(col("__d") * col("__d")).as("__den"))
    val lags = (1 to maxLag).toDF("lag_k")
    val num = dev.crossJoin(broadcast(lags))
      .select(col("__k"), (col("__i") + col("lag_k")).as("__i2"),
        col("lag_k"), col("__d"))
      .join(dev.select(col("__k"), col("__i").as("__i2"),
        col("__d").as("__d2")), Seq("__k", "__i2"))
      .groupBy("__k", "lag_k")
      .agg(count(lit(1)).as("n_pairs"), d9(col("__d") * col("__d2")).as("__num"))
    st.join(den, Seq("__k")).crossJoin(broadcast(lags))
      .join(num, Seq("__k", "lag_k"), "left")
      .select(col("__k").as(keyCol), col("lag_k"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("__den") > 0,
          coalesce(col("__num"), lit(0.0)) / col("__den")).as("acf"))
  }

  /** CUSUM CHANGEPOINT per key: the index maximizing the absolute
    * cumulative deviation `|S_t|`, `S_t = Σ_{i≤t} (x_i − x̄)` — the
    * classic level-shift locator over a per-bucket series (a metric
    * that jumps mid-window pulls the cumulative sum to an extreme at
    * the shift point). The mean is exact (round-then-DECIMAL / n) and
    * the cumulative sum accumulates DECIMAL deviations in one KEYED
    * ordered window, so `|S|` compares exactly and the argmax
    * (smallest index on ties, via a max-struct with negated index) is
    * deterministic under any partitioning. Output per key:
    * `(n, cp_idx, max_abs_cusum)`.
    */
  def cusumChangepoint(
      df: DataFrame, keyCol: String, idxCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def d6(c: org.apache.spark.sql.Column) =
      sum(round(c, 6).cast("decimal(38,6)")).cast("double")
    val s = df.select(col(keyCol).as("__k"),
        col(idxCol).cast("long").as("__i"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val st = s.groupBy("__k").agg(
      (d6(col("__x")) / count(lit(1)).cast("double")).as("__mean"))
    val cum = s.join(st, Seq("__k"))
      .withColumn("__s",
        sum(round(col("__x") - col("__mean"), 9).cast("decimal(38,9)"))
          .over(w))
    cum.groupBy("__k")
      .agg(count(lit(1)).as("n"),
        max(struct(abs(col("__s")).as("a"), (-col("__i")).as("ni"))).as("__m"))
      .select(col("__k").as(keyCol), col("n"),
        (-col("__m.ni")).as("cp_idx"),
        col("__m.a").cast("double").as("max_abs_cusum"))
  }

  /** EXPONENTIALLY TIME-DECAYED SUM per key:
    * `Σ v·2^(−Δt/halfLife)` with Δt measured back from the corpus
    * max timestamp — the recency-weighted engagement/quality score
    * (training-data sampling weights, churn features) where a plain
    * sum lets dead history dominate. The decay factor is the pinned
    * double `exp(−Δdays·ln2/halfLifeDays)`; weighted terms are
    * round-then-DECIMAL summed (exact, order-free), and the reference
    * timestamp rides a 1-row broadcast — so the whole thing is ONE
    * keyed aggregation over one pass. NULL value/ts rows are
    * excluded.
    */
  def decayedSum(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val ts = unix_micros(col(tsCol))
    val clean = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), ts.as("__t"),
        col(valueCol).cast("double").as("__v"))
    val ref = clean.agg(max(col("__t")).as("__ref"))
    val dtDays = (col("__ref") - col("__t")).cast("double") /
      lit(86400000000.0)
    val wv = col("__v") *
      exp(dtDays * lit(-math.log(2.0) / halfLifeDays))
    clean.crossJoin(broadcast(ref))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(round(wv, 9).cast("decimal(38,9)")).cast("double")
          .as("decayed_sum"))
  }

  /** CLASSICAL SEASONAL DECOMPOSITION (additive, moving-average
    * trend): `x = trend + seasonal + residual` per key over an
    * integer axis — the "is Monday always low, or is this a real
    * dip?" splitter. Trend is the centered `period`-point moving
    * average over a RANGE frame (gap-correct: axis holes shrink the
    * frame and a partial frame emits NULL trend rather than a
    * neighbor-shifted fake); seasonal is the per-phase
    * (`idx mod period`) mean of the detrended values, centered would
    * require a second pass the additive form doesn't need; residual
    * is what's left. All means are round-then-DECIMAL sums over one
    * double division — exact, order-free. `period` must be odd (the
    * centered window is symmetric); one row per `(key, idx)` is the
    * [[rollingAgg]] axis contract.
    */
  def seasonalDecompose(
      df: DataFrame, keyCol: String, idxCol: String, valueCol: String,
      period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3, got $period")
    val half = period / 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__i"))
      .rangeBetween(-half, half)
    def d9s(c: org.apache.spark.sql.Column) =
      sum(round(c, 9).cast("decimal(38,9)")).cast("double")
    val s = df.select(col(keyCol).as("__k"),
        col(idxCol).cast("long").as("__i"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val tr = s
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("__cnt") === period,
          sum(round(col("__x"), 6).cast("decimal(38,6)")).over(w)
            .cast("double") / lit(period.toDouble)))
      .withColumn("__phase", pmod(col("__i"), lit(period.toLong)))
    val seas = tr.filter(col("trend").isNotNull)
      .groupBy("__k", "__phase")
      .agg((d9s(col("__x") - col("trend")) /
        count(lit(1)).cast("double")).as("seasonal"))
    tr.join(seas, Seq("__k", "__phase"), "left")
      .select(col("__k").as(keyCol), col("__i").as(idxCol),
        col("__x").as(valueCol), col("trend"), col("seasonal"),
        (col("__x") - col("trend") - col("seasonal")).as("residual"))
  }

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

  /** LAST-OBSERVATION-CARRIED-FORWARD null repair per key — the
    * sensor/gauge gap-fill sibling of [[resampleInterpolate]] (which
    * builds a new axis; this repairs nulls IN PLACE on the existing
    * rows): each null in `valueCols` takes the latest non-null value
    * at or before it in `(orderCol, tieBreakCol)` order. Leading
    * nulls (nothing to carry) stay null — no back-fill by default,
    * because inventing a past from the future is usually a leak.
    *
    * One keyed sort; ALL columns fill from the same window pass
    * (CollapseWindow fuses the IGNORE NULLS `last` expressions), so
    * the cost is one exchange regardless of how many columns repair.
    */
  def fillForward(
      df: DataFrame, keyCol: String, orderCol: String,
      valueCols: Seq[String], tieBreakCol: String = "event_id"): DataFrame = {
    require(valueCols.nonEmpty, "fillForward: at least one value column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieBreakCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val filled = valueCols.map(c =>
      last(col(c), ignoreNulls = true).over(w).as(c))
    val keep = df.columns.filterNot(valueCols.contains).map(col)
    df.select(keep ++ filled: _*)
  }

  /** RESAMPLE to a regular grid with LINEAR INTERPOLATION per key —
    * the gap-fill primitive (irregular sensor/price observations →
    * one value every `stepSec`) that time-series stores ship as
    * `time_bucket_gapfill`/`interpolate`. Grid points span each key's
    * own [min, max] observation range (epoch seconds floored to the
    * step), so no key extrapolates beyond its data; a grid point
    * landing exactly on an observation reproduces it bit-for-bit.
    *
    * Duplicate (key, second) observations collapse to their MAX value
    * first (a pinned, order-free choice — same contract spirit as
    * [[rollingAgg]]'s axis guard, but resampling tolerates dupes by
    * construction so it collapses instead of aborting).
    *
    * Scale shape: the grid explode is `range/step` rows per key
    * (output-sized, not corpus-sized); observations and grid points
    * merge into ONE (key, t)-sorted window pass — the
    * [[graft.ops.JoinOps.asOfJoin]] union trick, so there is no
    * per-grid-point probe join: a running last-observation carries
    * forward, a symmetric first-observation looks back, both from the
    * same sort. Output: `(key, grid_ts, value)` with interior gaps
    * linearly interpolated; `value` is a plain double expression of
    * the two surrounding observations, identical cross-engine.
    */
  def resampleInterpolate(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    import org.apache.spark.sql.expressions.Window
    val obs = df
      .select(col(keyCol).as("k"),
        floor(unix_micros(col(tsCol)) / lit(1000000.0)).cast("long").as("t"),
        col(valueCol).cast("double").as("v"))
      .groupBy("k", "t").agg(max(col("v")).as("v"))
    val grid = obs.groupBy("k")
      .agg(min(col("t")).as("__mn"), max(col("t")).as("__mx"))
      // integer floor-to-step via t - t%step (epoch seconds are
      // non-negative); a leading grid point before the first
      // observation drops later via the prev-null filter
      .select(col("k"), explode(sequence(
        col("__mn") - pmod(col("__mn"), lit(stepSec)),
        col("__mx") - pmod(col("__mx"), lit(stepSec)),
        lit(stepSec))).as("t"))
    val u = obs.select(col("k"), col("t"), col("v"), lit(1).as("__obs"))
      .unionByName(grid.select(col("k"), col("t"),
        lit(null).cast("double").as("v"), lit(0).as("__obs")))
    // obs sorts BEFORE the grid row at the same second, so a
    // coincident observation is its own "previous" (factor 0)
    val wPrev = Window.partitionBy("k")
      .orderBy(col("t"), col("__obs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("k")
      .orderBy(col("t"), col("__obs").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // one select so CollapseWindow fuses the same-frame pairs: two
    // Window nodes total over the single keyed sort
    val marked = u.select(col("k"), col("t"), col("__obs"),
      last(when(col("__obs") === 1, col("t")), ignoreNulls = true)
        .over(wPrev).as("__pt"),
      last(when(col("__obs") === 1, col("v")), ignoreNulls = true)
        .over(wPrev).as("__pv"),
      first(when(col("__obs") === 1, col("t")), ignoreNulls = true)
        .over(wNext).as("__nt"),
      first(when(col("__obs") === 1, col("v")), ignoreNulls = true)
        .over(wNext).as("__nv"))
    marked.filter(col("__obs") === 0 && col("__pt").isNotNull)
      .select(col("k").as(keyCol),
        timestamp_seconds(col("t")).as("grid_ts"),
        when(col("__pt") === col("t"), col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (col("t") - col("__pt")).cast("double") /
            (col("__nt") - col("__pt")).cast("double"))
          .as("value"))
  }
}
