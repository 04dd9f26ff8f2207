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

  /** Gaps-and-islands: collapse CONSECUTIVE equal values of `valueCol`
    * (in (key, order) sequence) into one row per run — the classic
    * state-interval builder (SCD-2 validity ranges, status-change
    * tracking, streak analysis). A new island starts where the value
    * differs from its predecessor (null-safe compare, so null runs
    * collapse too); island ids are 1-based per key in order.
    *
    * Same plan as [[sessionize]]: one shuffle on `keyCol`, the lag and
    * running-sum windows share a single (key, order) sort, then one
    * map-side-combined aggregation per island. Output is one row per
    * island: (key, island_id, value, n, start/end order values).
    */
  def islands(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      tieBreakCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol, tieBreakCol)
    val changed = when(
      col(valueCol) <=> lag(col(valueCol), 1).over(w), 0L).otherwise(1L)
    df.withColumn("__island",
        sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island").as("island_id"))
      .agg(
        first(col(valueCol)).as(valueCol),
        count(lit(1)).as("n"),
        min(col(orderCol)).as("start_" + orderCol),
        max(col(orderCol)).as("end_" + orderCol))
  }

  /** PER-KEY INTERVAL UNION: merge every key's overlapping/touching
    * `[startCol, endCol]` spans into maximal disjoint intervals —
    * union of sessions / GPU-busy spans / ad-exposure windows, the
    * "total covered time" question a plain duration sum double-counts.
    * Classic sweep: order spans by (start, end), a span OPENS a new
    * merged interval iff its start exceeds the running max of all
    * previous ends (strictly — touching spans merge); the running-max
    * prefix and the interval ids are keyed windows, the merge one
    * keyed agg. Output per merged interval:
    * `(keyCol, interval_id 1-based, start, end, n_spans)` — total
    * coverage = `sum(end - start)` over it. Inverted spans
    * (`end < start`) are a caller error and excluded; NULL bounds
    * excluded.
    *
    * Scale shape: two keyed windows + one keyed agg, all partitioned
    * by `keyCol` — narrow (key, long, long) rows, partition-parallel,
    * no global sort.
    */
  def intervalUnion(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(
      prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L)
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__open", opens)
      .withColumn("__iv",
        sum(col("__open")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__iv").as("interval_id"))
      .agg(min(col(startCol)).as("start"),
        max(col(endCol)).as("end"),
        count(lit(1)).as("n_spans"))
  }

  /** Per-key ordered event-symbol sequence: every key's events
    * collapsed, in (order, tiebreak) order, into ONE string of
    * caller-supplied symbols — the MATCH_RECOGNIZE-lite substrate:
    * compose with `regexp_count`/`regexp_extract_all` for sequence
    * pattern mining (funnel regexes with tolerated interruptions,
    * cycle detection, etc.).
    *
    * Scale contract: one (key, symbol-struct) shuffle of three narrow
    * fields, then the per-key sort+join inside the aggregation. The
    * sequence string is per-key-event-count-sized BY DEFINITION —
    * that's the sequence-mining contract, same as collect-based
    * session features; cap upstream (e.g. a time window) for keys
    * with unbounded histories.
    */
  def eventSequence(
      df: DataFrame, keyCol: String, orderCol: String,
      symbol: Column, tieBreakCol: String = "event_id"): DataFrame =
    df.groupBy(col(keyCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(orderCol), col(tieBreakCol),
            symbol.as("c")))),
          x => x.getField("c")), "").as("seq"))

  /** First-order Markov transition matrix over per-key event
    * sequences: counts and conditional probabilities of value v →
    * next value w within each key's (order, tiebreak) sequence — the
    * sequence-analytics complement of [[islands]] (which collapses
    * the self-transitions this matrix measures).
    *
    * One (key, order) sort for the lead pairing, one (from, to) keyed
    * count, and the per-from totals broadcast back (a ≤ |vocabulary|²
    * dim). The probability is one exact-count double division.
    */
  def transitionMatrix(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      tieBreakCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol, tieBreakCol)
    val pairs = df
      .select(col(valueCol).as("from_" + valueCol),
        lead(col(valueCol), 1).over(w).as("to_" + valueCol))
      .filter(col("to_" + valueCol).isNotNull)
    val counts = pairs.groupBy("from_" + valueCol, "to_" + valueCol)
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_" + valueCol)
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), Seq("from_" + valueCol))
      .select(col("from_" + valueCol), col("to_" + valueCol), col("n"),
        (col("n").cast("double") / col("__tot").cast("double")).as("p"))
  }

  /** Sliding (hopping) window aggregation — `window(ts, w, s)` with
    * `slideSeconds < windowSeconds`, the other standard streaming
    * window family next to [[timeBucket]]'s tumbling form: every event
    * lands in `windowSeconds / slideSeconds` overlapping windows
    * (epoch-aligned starts, `[start, start + w)` half-open), and the
    * output has one row per (key, window) with `n` and a
    * DECIMAL(38,6)-accumulated `sum_value` (the q12 float-parity rule).
    * The window start is emitted as a formatted string for
    * cross-engine hash parity. The same transform runs unchanged under
    * Structured Streaming (`window()` is the streaming-native
    * grouping; add a watermark for append mode).
    *
    * Scale shape: the explode-into-hops is narrow (w/s rows per event,
    * a small constant); one map-side-combined shuffle keyed by
    * (key, window) — identical to the tumbling plan times the hop
    * factor.
    */
  /** KAPLAN–MEIER survival estimator per cohort — the churn/retention
    * curve with CENSORING handled correctly (users still active at
    * the observation edge aren't counted as churned, which a naive
    * retention ratio gets wrong): at each observed duration `t`,
    * `S(t) = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i)` with `n_i` the
    * at-risk count (subjects whose observed duration ≥ t_i).
    *
    * Input is one row per subject: `(cohort, duration, event)` with
    * `event` 1 = the terminal event was OBSERVED, 0 = censored.
    * Output: one row per (cohort, observed duration) with the risk
    * set, event/censor counts, and the survival estimate.
    *
    * Scale shape: one (cohort, duration) keyed count, then two
    * cohort-keyed windows over the (tiny) duration axis — the
    * cumulative product runs as `exp(Σ round(ln factor, 9))` with the
    * DECIMAL cumsum exact and order-free (ties impossible: the axis
    * is grouped), and a zero factor (everyone at risk dies) pins
    * S = 0 from that point via a running flag instead of feeding
    * `ln(0)` into the sum.
    */
  def kaplanMeier(
      df: DataFrame, cohortCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(cohortCol).as("cohort"),
        col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("n_obs"))
    val wPrev = Window.partitionBy("cohort").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("cohort").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("cohort")
    val withRisk = g
      .withColumn("n_risk",
        sum(col("n_obs")).over(tot) -
          coalesce(sum(col("n_obs")).over(wPrev), lit(0L)))
    val factor = lit(1.0) -
      col("d").cast("double") / col("n_risk").cast("double")
    withRisk
      .withColumn("__f", factor)
      .withColumn("__zero",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .withColumn("__lnsum",
        sum(when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(col("__f")), 9).cast("decimal(38,9)"))).over(wCum))
      .select(col("cohort"), col("t"), col("n_risk"), col("d").as("d_events"),
        (col("n_obs") - col("d")).as("n_censored"),
        when(col("__zero") === 1, 0.0)
          .otherwise(exp(coalesce(col("__lnsum").cast("double"), lit(0.0))))
          .as("survival"))
  }

  def slidingCounts(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowSeconds: Long, slideSeconds: Long): DataFrame = {
    require(windowSeconds > 0 && slideSeconds > 0 &&
      windowSeconds % slideSeconds == 0,
      "slidingCounts: windowSeconds must be a positive multiple of slideSeconds")
    df.groupBy(col(keyCol),
        window(col(tsCol), s"$windowSeconds seconds", s"$slideSeconds seconds"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,6)")).cast("double").as("sum_value"))
      .select(col(keyCol),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("n"), col("sum_value"))
  }

  /** TOP ENTRY PATHS — the "how do journeys start" report: each key's
    * first `pathLen` events (ordered by `(ts, tieCol)` — fully
    * deterministic) joined into a `>`-separated path string, the most
    * common paths ranked by (count desc, path asc). Keys with fewer
    * than `pathLen` events contribute their shorter prefix — a real
    * journey shape, not noise to drop.
    *
    * Scale shape: one keyed rank window keeps `pathLen` rows per key,
    * a keyed `sort_array(collect_list(struct(rank, step)))` rebuilds
    * the ordered prefix (deterministic under any partitioning — the
    * sort is ON the rank), one path-keyed count, and a distributed
    * take-ordered cut.
    */
  def topPaths(
      df: DataFrame, keyCol: String, tsCol: String, stepCol: String,
      tieCol: String, pathLen: Int, topK: Int): DataFrame = {
    require(pathLen >= 1 && topK >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val paths = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col(keyCol))
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("__rn"),
            col(stepCol).cast("string").as("__s")))),
          x => x.getField("__s"))).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path")).limit(topK)
  }
}
