package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming execution of the event-time operators (SURVEY §2.7): the
  * SAME logical definitions serve batch and streaming — the transforms
  * below accept either a batch DataFrame or a `readStream` DataFrame,
  * so batch results (oracle-checked in Q12/Q19) pin the semantics and
  * streaming adds watermarks/state on top.
  *
  * Scale notes: tumbling windows shuffle on (window, key) like any
  * hash-agg; session windows keep per-key state bounded by the
  * watermark delay — at 1000 executors state is range-partitioned by
  * key and evicted as the watermark advances.
  */
object StreamingOps {

  /** Streaming source over an events parquet directory.
    *
    * A file stream needs a declared schema; the physical form of `ts`
    * has drifted across driver data generations (long nanos vs
    * TIMESTAMP_NTZ micros vs proper timestamp — see
    * `Tables.normalizeTs`), so the schema is taken from a one-time
    * batch footer read of the SAME directory and `ts` is normalized
    * with the same scan-boundary rule batch uses. The footer read is a
    * driver-side metadata operation (no data scan) done once at stream
    * construction — irrelevant at any scale.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables.normalizeTs(
      spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))

  /** Tumbling 1-hour counts per event type — streaming analog of Q12.
    * Works identically on a batch DataFrame.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** [[tumblingCounts]] with a WATERMARK, append mode — the run-forever
    * form: complete-mode state holds one row per window EVER seen
    * (unbounded on an endless stream; fine for the batch-parity check),
    * while here windows older than the watermark are finalized, emitted
    * once, and EVICTED — state is bounded by open windows ×
    * event_types, independent of stream age. Same aggregation
    * definitions as the batch/complete form, so Q12 still pins the
    * semantics.
    */
  def tumblingCountsAppend(events: DataFrame, watermark: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark))

  /** Gap-based session counts per user via `session_window` — streaming
    * analog of Q19 (which pins the same semantics with lag+cumsum in
    * batch). Watermark bounds state; late events beyond `watermark` are
    * dropped in streaming mode.
    */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        col("session_window.start").as("session_start"))

  /** Streaming exact dedup over a document stream: one doc per
    * normalized text (lower(trim), same key as
    * [[graft.ops.DedupOps.exactDupGroups]]) is emitted — the earlier
    * micro-batch wins across batches; within a micro-batch the surviving
    * row is arbitrary (engine contract of `dropDuplicates*`).
    * `dropDuplicatesWithinWatermark` keeps one state row per
    * distinct key and EVICTS it once the watermark passes — so state is
    * bounded by the watermark horizon, not corpus size, which is what
    * makes this runnable forever on an ingest firehose. Duplicates
    * farther apart than the watermark delay can both be emitted (the
    * documented streaming contract); the batch operator remains the
    * exact-final-answer path.
    *
    * Works on a `readStream` DataFrame (append mode) and, semantics-
    * pinned by the spec, on a batch DataFrame via `dropDuplicates` on
    * the same key.
    */
  def streamingExactDedup(
      docs: DataFrame, textCol: String, tsCol: String, watermark: String): DataFrame = {
    val keyed = docs.withColumn("__norm_h",
      xxhash64(graft.ops.DedupOps.normText(col(textCol))))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("__norm_h")
      else keyed.dropDuplicates("__norm_h")
    deduped.drop("__norm_h")
  }

  /** Streaming NEAR-dedup by SimHash signature equality: one doc per
    * 64-bit [[graft.functions.SimHash64]] signature within the
    * watermark horizon — the streaming counterpart of the batch
    * decision paths ([[graft.ops.DedupOps.simHashKeepers]]). Signature
    * EQUALITY (Hamming 0) is the streamable contract: banded
    * Hamming-neighborhood matching needs a rep-per-bucket state join
    * that `dropDuplicates*` cannot express, so docs a few bits apart
    * both pass here — the batch operator remains the recall path; this
    * one bounds state to one row per distinct signature and catches
    * exact and boilerplate-identical near-dups on an ingest firehose.
    * Same first-arrival-wins / watermark-eviction contract as
    * [[streamingExactDedup]]; works on a batch DataFrame via
    * `dropDuplicates` on the same signature.
    */
  /** Streaming curation gate — the STATELESS curation stages composed
    * as one stream-safe projection + filter: quality-score floor,
    * repetition (top-bigram) ceiling, PII scrub, weighted Bernoulli
    * down-sampling. Every stage is per-row pure column algebra (no
    * aggregation state, key-derived randomness), so the transform runs
    * IDENTICALLY on a batch frame and an ingest `readStream` — chain
    * [[streamingExactDedup]]/[[streamingSimHashDedup]] after it for the
    * stateful dedup tail. Corpus-level stages (frequent-span sets, eval
    * gram sets, bucket caps) are precomputed batch-side and joined as
    * static broadcasts at stream time — the
    * [[graft.ops.DedupOps.corpusBucketReps]] deployment pattern.
    */
  def streamingCurationGate(
      docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double, maxTopBigram: Double,
      sampleProb: Double, seed: Long = 42L): DataFrame = {
    import graft.ops.{CurationOps, TextAnalysis}
    docs
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.repetitionSignals(col(textCol))
          .getField("top_bigram_frac") <= maxTopBigram)
      .withColumn(textCol, CurationOps.scrubPii(col(textCol)))
      .filter(graft.core.PortableHash.uniform01(col(idCol), lit(seed)) <
        lit(sampleProb))
  }

  /** STREAMING DRIFT GATE: per-window categorical PSI of `catCol`
    * against a STATIC reference distribution — the production monitor
    * that pages before a bad ingest batch lands ("did the language mix
    * shift in the last hour?"). Same add-one-smoothed formula as
    * [[graft.ops.DriftOps.categoricalDrift]] with the union domain of
    * (reference ∪ window), so the batch operator pins the arithmetic
    * (spec: batch-mode run of this code vs per-window categoricalDrift).
    *
    * Plan: TWO chained event-time aggregations in append mode (the
    * Spark ≥ 3.4 multiple-stateful-operator feature — the second
    * groups on `window_time` of the first's window): (window, cat)
    * counts, then per-window count maps + totals; the PSI itself is
    * STATELESS column algebra over the ≤ |domain|-element map against
    * the reference shipped as a literal map (collected from the
    * `reference` dim — the broadcast-dim contract; a reference is a
    * few categories by construction). State is bounded by open
    * windows × categories, evicted by the watermark. Output one row
    * per closed window: (bucket, k, n_new, psi_total).
    */
  def streamingDrift(
      events: DataFrame, catCol: String, reference: DataFrame,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val ref = reference.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(ref.nonEmpty, "streamingDrift: empty reference")
    val refTot = ref.map(_._2).sum
    val refMap = map(ref.flatMap { case (c, n) =>
      Seq(lit(c), lit(n)) }: _*)
    val refCats = array(ref.map(c => lit(c._1)): _*)
    val c1 = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col(catCol).as("cat"))
      .agg(count(lit(1)).as("n_new"))
    val c2 = c1
      .groupBy(window(window_time(col("window")), windowDur).as("w2"))
      .agg(map_from_entries(collect_list(struct(col("cat"), col("n_new")))).as("m"),
        sum(col("n_new")).as("n_tot"))
    val domain = array_union(map_keys(col("m")), refCats)
    val k = size(domain)
    val terms = transform(domain, c => {
      val pn = (coalesce(element_at(col("m"), c), lit(0L)) + lit(1L))
        .cast("double") / (col("n_tot") + k).cast("double")
      val po = (coalesce(element_at(refMap, c), lit(0L)) + lit(1L))
        .cast("double") / (lit(refTot) + k).cast("double")
      (pn - po) * log(pn / po)
    })
    c2.select(
      date_format(col("w2.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
      k.as("k"), col("n_tot").as("n_new"),
      aggregate(terms, lit(0.0), (acc, t) => acc + t).as("psi_total"))
  }

  def streamingSimHashDedup(
      docs: DataFrame, textCol: String, tsCol: String, watermark: String): DataFrame = {
    val keyed = docs.withColumn("__sig",
      graft.functions.SimHash64.simHash64(
        graft.ops.TextOps.whitespaceTokenize(col(textCol))))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("__sig")
      else keyed.dropDuplicates("__sig")
    deduped.drop("__sig")
  }

  /** Rows for [[streamingExactDedupOptOut]]: one tagged event per doc
    * or opt-out (kind 0 = ingest, 1 = removal), keyed by the normalized
    * content hash; output is the kept ingest rows' (id, ord).
    */
  case class DedupOptEvent(key: Long, id: Long, kind: Int, ord: Long,
      wm: java.sql.Timestamp)
  case class DedupKeep(id: Long, ord: Long)

  /** Streaming exact dedup with a LIVE OPT-OUT channel — the removal
    * verb extended to the fourth standing state, the dedup state of a
    * run-forever ingest job (the batch legs:
    * [[graft.ops.PqOps.ivfPqDelete]],
    * [[graft.ops.SimilarityOps.deleteFromLshIndex]],
    * [[graft.ops.DedupOps.removedBucketReps]]). A long-lived stream
    * holds one state row per live content; opt-out/contamination/
    * licensing removals must purge that state WITHOUT restarting the
    * query, or the content stays suppressed forever after its document
    * is deleted downstream.
    *
    * `docs` and `removals` are two streams (or two batch frames) with
    * the same (idCol, textCol, ordCol[, tsCol]) columns — an opt-out
    * carries the document it removes (realistic: a
    * right-to-be-forgotten request identifies the content; hashing it
    * client-side works identically since only the 64-bit key enters
    * the fold). Both are tagged, unioned and folded per content key in
    * (ord, kind)-order within a micro-batch, arrival order across
    * batches (the [[streamingEma]] ordering contract):
    *  - INGEST with no live winner: KEPT (emitted), id becomes the
    *    winner. With a live winner: dropped (dup of live content).
    *  - REMOVAL of the live winner: the slot is FREED — the content is
    *    gone from the corpus, so tomorrow's ingest may legitimately
    *    re-introduce it ([[graft.ops.DedupOps.removedBucketReps]]'s
    *    exact semantics, q254's contract).
    *  - REMOVAL of a non-winner or absent id: no-op — a previously
    *    DROPPED dup never entered the corpus, so there is nothing to
    *    free (the batch leg's non-rep no-op; the asymmetry with the
    *    standing-corpus promotion rule is inherent, not a gap — there
    *    the next member is still IN the corpus to promote, here the
    *    dropped doc was discarded at the gate).
    * State per key is O(1) (the winner id) and shrinks on removal —
    * the spec asserts state rows = live contents EXACTLY. With the
    * [[streamingEma]] TTL trio (`tsCol`/`watermarkDelay`/`idleTtlMs`)
    * idle contents are additionally watermark-evicted (the
    * run-forever bound: state tracks the active horizon like
    * [[streamingExactDedup]]'s `dropDuplicatesWithinWatermark`);
    * without it, state = live contents ever seen (the exact standing
    * contract). Works identically on batch frames (state simply never
    * persists), which the differential spec uses.
    */
  def streamingExactDedupOptOut(
      docs: DataFrame, removals: DataFrame, textCol: String, idCol: String,
      ordCol: String, tsCol: String = null, watermarkDelay: String = null,
      idleTtlMs: Long = -1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttl = ttlActive(docs, tsCol, watermarkDelay, idleTtlMs)
    def tag(df: DataFrame, kind: Int): DataFrame = df.select(
      xxhash64(graft.ops.DedupOps.normText(col(textCol))).as("key"),
      col(idCol).cast("long").as("id"),
      lit(kind).as("kind"),
      col(ordCol).cast("long").as("ord"),
      (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm"))
    val unioned0 = tag(docs, 0).unionByName(tag(removals, 1))
    val unioned =
      if (ttl) unioned0.withWatermark("wm", watermarkDelay) else unioned0
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    unioned.as[DedupOptEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, DedupKeep](
        OutputMode.Append, timeout) { (_, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var winner = state.getOption
          val kept = Array.newBuilder[DedupKeep]
          // (ord, kind): at equal ord the ingest lands before its own
          // removal — "remove then re-add at one instant" is undefined
          // input, not a contract
          rows.toArray.sortBy(e => (e.ord, e.kind)).foreach { e =>
            if (e.kind == 0) {
              if (winner.isEmpty) { winner = Some(e.id); kept += DedupKeep(e.id, e.ord) }
            } else if (winner.contains(e.id)) winner = None
          }
          winner match {
            case Some(w) =>
              state.update(w)
              if (ttl) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
            case None => if (state.exists) state.remove()
          }
          kept.result().iterator
        }
      }
      .toDF(idCol, ordCol)
  }

  /** Input/output/state rows for [[streamingEma]] (case classes so the
    * typed `flatMapGroupsWithState` path gets product encoders).
    */
  case class EmaEvent(key: String, ord: Long, value: Double,
      wm: java.sql.Timestamp)
  case class EmaPoint(key: String, ord: Long, ema: Double)

  /** Idle-key state TTL for the typed `flatMapGroupsWithState` trio
    * (VERDICT r6 "what's missing" #1): with `NoTimeout`, per-key state
    * is O(1) but KEYS are never evicted — a run-forever stream over an
    * unbounded key space (user churn) accumulates one state row per
    * key ever seen. Passing `watermarkDelay` + `idleTtlMs` switches the
    * operator to `EventTimeTimeout`: the event-time watermark rides
    * `tsCol`, and a key whose state goes untouched while the watermark
    * advances `idleTtlMs` past its last batch is timed out and REMOVED
    * — state tracks recently-active keys, independent of stream age.
    *
    * Contract trade (documented, caller-chosen): an evicted key that
    * reappears restarts fresh (EMA re-seeds, funnel depth 0, TWAP
    * accumulators zero), so pick a TTL comfortably above the key
    * silence horizon the pipeline must bridge. Turning the watermark on
    * also turns on Spark's late-row filter for this operator: input
    * rows whose event time is at or below the current watermark are
    * DROPPED before the fold (measured on Spark 4: a first-batch row at
    * the epoch origin is already on the boundary) — so the TTL form
    * trades exactness under late/out-of-order replay for bounded state,
    * and the defaults (TTL off = NoTimeout, no watermark, no late
    * filtering, batch mode unaffected) remain the exact path.
    */
  private def ttlActive(
      events: DataFrame, tsCol: String, watermarkDelay: String,
      idleTtlMs: Long): Boolean =
    events.isStreaming && tsCol != null && watermarkDelay != null && idleTtlMs > 0

  /** Streaming per-key EMA via `flatMapGroupsWithState` — the custom-
    * state analog of [[graft.ops.VectorOps.emaByKey]] (OP-33's linear
    * scale path, oracle-checked by q40): same recurrence
    * `e_t = decay·e_{t-1} + (1−decay)·x_t`, same left-to-right double
    * fold, but the running value lives in GroupState so it carries
    * ACROSS micro-batches. State is O(1) per key (one double) and never
    * grows with stream length — this runs forever on an ingest firehose
    * with no watermark needed; at 1000 executors state is hash-
    * partitioned by key like any stateful operator.
    *
    * Ordering contract: within a micro-batch events fold in `ordCol`
    * order; across micro-batches they fold in ARRIVAL order (streaming
    * cannot re-sort the past). When files arrive in `ordCol` order —
    * the ingest norm — the result is exactly the batch fold, which the
    * spec pins against [[graft.ops.VectorOps.emaByKey]]. For arbitrary
    * historical re-orders, the batch operator is the exact path.
    *
    * Works on a batch DataFrame too (state is simply never present —
    * Spark runs the same function per group), which the spec uses as a
    * differential check. `valueCol` must be non-null; output columns
    * are (`keyCol` STRING, `ordCol` LONG, ema DOUBLE).
    */
  def streamingEma(
      events: DataFrame, keyCol: String, ordCol: String, valueCol: String,
      decay: Double, tsCol: String = null, watermarkDelay: String = null,
      idleTtlMs: Long = -1L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlActive(events, tsCol, watermarkDelay, idleTtlMs)
    val src = if (ttl) events.withWatermark(tsCol, watermarkDelay) else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    // the watermarked COLUMN must reach the stateful operator's input
    // (Spark's event-time-timeout check looks for the delay metadata on
    // the child's output, not just an upstream watermark node), so the
    // raw timestamp rides along unused by the fold itself
    val ds = src.select(
      col(keyCol).cast("string").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value"),
      (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm")).as[EmaEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Double, EmaPoint](
        OutputMode.Append, timeout) { (key, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var cur = state.getOption
          val pts = rows.toArray.sortBy(_.ord).map { e =>
            val next = cur match {
              case Some(prev) => prev * decay + e.value * (1 - decay)
              case None => e.value
            }
            cur = Some(next)
            EmaPoint(key, e.ord, next)
          }
          cur.foreach(state.update)
          if (ttl) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
          pts.iterator
        }
      }
      .toDF(keyCol, ordCol, "ema")
  }

  /** Rows for [[streamingFunnel]]. */
  case class FunnelEvent(key: String, ts: Long, typ: String,
      wm: java.sql.Timestamp)
  case class FunnelHit(key: String, step_idx: Int, ts: Long)
  case class FunnelState(depth: Int, chainTs: Long)

  /** Streaming ordered-funnel tracker via `flatMapGroupsWithState` —
    * the live twin of [[graft.ops.FunnelOps.funnelCounts]]: each key
    * advances through `steps` on its FIRST qualifying occurrence
    * (type matches the next step, timestamp at-or-after the previous
    * completion) and emits a (key, step_idx, ts) hit the moment a
    * level completes. State is O(1) per key — current depth + chain
    * timestamp, two fields, no watermark needed.
    *
    * Within a micro-batch events process in (ts, step-priority)
    * order — earlier funnel steps first at equal timestamps, so a
    * same-instant view+click chains exactly like the batch
    * operator's `>=` joins. Across micro-batches arrival order rules
    * (the streamingEma contract): with in-order files the emitted
    * hits per level equal batch funnelCounts, which the spec pins.
    */
  def streamingFunnel(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], watermarkDelay: String = null,
      idleTtlMs: Long = -1L): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, s"bad steps: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlActive(events, tsCol, watermarkDelay, idleTtlMs)
    val src = if (ttl) events.withWatermark(tsCol, watermarkDelay) else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val stepIdx = steps.zipWithIndex.toMap
    val ds = src
      .filter(col(typeCol).isin(steps: _*))
      .select(col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("ts"), col(typeCol).as("typ"),
        (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm"))
      .as[FunnelEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, timeout) { (key, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val hits = rows.toArray
            .sortBy(e => (e.ts, stepIdx(e.typ)))
            .flatMap { e =>
              if (st.depth < steps.size && e.typ == steps(st.depth) &&
                  (st.depth == 0 || e.ts >= st.chainTs)) {
                st = FunnelState(st.depth + 1, e.ts)
                Some(FunnelHit(key, st.depth, e.ts))
              } else None
            }
          state.update(st)
          if (ttl) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
          hits.iterator
        }
      }
      .toDF(keyCol, "step_idx", "ts_us")
  }

  /** Rows for [[streamingTwap]]. `ord` is the same-timestamp tiebreak
    * (the batch operator's `event_id` column), carried so streaming and
    * batch fold same-instant events in the SAME order.
    */
  case class TwapEvent(key: String, ts: Long, ord: Long, value: Double,
      wm: java.sql.Timestamp)
  case class TwapPoint(key: String, ts: Long, twap: Double, n_obs: Long)
  case class TwapState(lastTs: Long, lastV: Double, sumVW: Double, sumW: Double, n: Long)

  /** Streaming time-weighted average via `flatMapGroupsWithState` —
    * the live-monitoring twin of [[graft.ops.TrendOps.twap]]: each
    * arriving event closes the previous observation's interval and
    * emits the running TWAP. State is O(1) per key (last observation +
    * two accumulators) with no watermark needed — runs forever on an
    * ingest firehose; at 1000 executors state hash-partitions by key.
    *
    * Accumulation contract: sums here fold in DOUBLE in arrival order
    * (streaming cannot re-sort the past), so this is the monitoring
    * path; [[graft.ops.TrendOps.twap]]'s decimal-exact batch fold
    * remains the oracle path (the streamingSimHashDedup honesty
    * pattern). With in-order files the running value at each key's
    * last event matches the batch TWAP to double-fold tolerance,
    * which the spec pins. Same-timestamp events fold in `ordCol`
    * order — the batch operator's (ts, event_id) tiebreak, so the two
    * paths cannot diverge on same-instant bursts. While every closed
    * interval so far has ZERO total duration (same-instant prefix:
    * sumW == 0, TWAP undefined), nothing is emitted — intervals still
    * close and n_obs advances, so the first positive-duration event
    * emits the correct weighted average rather than 0/0 = NaN.
    */
  def streamingTwap(
      events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, ordCol: String = "event_id",
      watermarkDelay: String = null, idleTtlMs: Long = -1L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlActive(events, tsCol, watermarkDelay, idleTtlMs)
    val src = if (ttl) events.withWatermark(tsCol, watermarkDelay) else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val ds = src.select(
      col(keyCol).cast("string").as("key"),
      unix_micros(col(tsCol)).as("ts"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value"),
      (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm")).as[TwapEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[TwapState, TwapPoint](
        OutputMode.Append, timeout) { (key, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var st = state.getOption
          val out = rows.toArray.sortBy(e => (e.ts, e.ord)).flatMap { e =>
            val (emitted, next) = st match {
              case Some(s) =>
                val w = (e.ts - s.lastTs).toDouble
                val sumVW = s.sumVW + s.lastV * w
                val sumW = s.sumW + w
                val n = s.n + 1
                (if (sumW > 0) Some(TwapPoint(key, e.ts, sumVW / sumW, n)) else None,
                  TwapState(e.ts, e.value, sumVW, sumW, n))
              case None =>
                (None, TwapState(e.ts, e.value, 0.0, 0.0, 0L))
            }
            st = Some(next)
            emitted
          }
          st.foreach(state.update)
          if (ttl) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
          out.iterator
        }
      }
      .toDF(keyCol, "ts_us", "twap", "n_obs")
  }

  /** Input/output/state rows for [[streamingBootstrapGauge]]. */
  case class BootEvent(key: String, ord: Long, k: String, value: Double,
      w: Array[Int], wm: java.sql.Timestamp)
  case class BootGauge(key: String, n: Long, mean: Double, boot_lo: Double,
      boot_hi: Double, boot_se: Double)
  case class BootState(n: Long, sv: Double, s: Seq[Double], c: Seq[Long])

  /** STREAMING POISSON-BOOTSTRAP GAUGE via `flatMapGroupsWithState` —
    * the live-monitoring twin of
    * [[graft.ops.StatsOps.poissonBootstrapCIByGroup]]: per group a
    * RUNNING mean with a bootstrap CI, re-emitted every micro-batch
    * the group receives data. The metric an experiment dashboard
    * actually wants — "is the lift real yet?" needs the uncertainty,
    * not just the point estimate, and the Poisson bootstrap is the
    * only bootstrap whose state is streamable: each row contributes
    * independently to every replicate, so per group the FULL
    * bootstrap collapses to `O(B)` running sums — `(Σ w_b·v, Σ w_b)`
    * per replicate plus `(n, Σv)` — never the data.
    *
    * The per-row replicate weights are staged UPSTREAM as stateless
    * projection columns using the exact batch machinery (key-derived
    * [[graft.core.PortableHash.uniform01]] draw over
    * `rowKey#replicate#seed`, the shared
    * [[graft.ops.StatsOps.poisson1Cdf]] inverse-CDF when-chain, draws
    * staged before the chain — the CSE lesson), so the draws are
    * BIT-IDENTICAL to the batch operator's and stay in codegen; the
    * stateful operator only accumulates. State per key is `2B+2`
    * numbers — O(1) in stream length, hash-partitioned by group at
    * 1000 executors; optional event-time TTL evicts idle groups like
    * [[streamingEma]].
    *
    * Accumulation contract (the [[streamingTwap]] honesty pattern):
    * replicate sums fold in DOUBLE in arrival order — monitoring
    * path; the batch operator's round-then-DECIMAL form is the oracle
    * path (q237). With the same rows the final emitted gauge matches
    * batch `exact=false` to double-fold tolerance, which the spec
    * pins. CI algebra mirrors the batch driver exactly: means of the
    * `c_b > 0` replicates, ascending; `floor(α/2·(B−1))` trimmed from
    * each end; SE over the ascending means.
    */
  def streamingBootstrapGauge(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      rowKeyCol: String, reps: Int = 40, seed: String = "boot",
      alpha: Double = 0.05,
      uniform: (Column, Column) => Column =
        graft.core.PortableHash.uniform01,
      watermarkDelay: String = null, idleTtlMs: Long = -1L): DataFrame = {
    require(reps >= 4, s"need reps >= 4, got $reps")
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlActive(events, tsCol, watermarkDelay, idleTtlMs)
    val src = if (ttl) events.withWatermark(tsCol, watermarkDelay) else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val v = col(valueCol).cast("double")
    // fan the NARROW pre-draw projection out to the session's cores
    // before the draw stage: the `reps` hash draws per event are the
    // CPU-heavy stage of this operator, and left on the source's file
    // partitioning they run at whatever parallelism the replay/ingest
    // happens to deliver per micro-batch (the bench replay reads 2
    // files per trigger → 2 tasks computing reps·rows draws while the
    // rest of the box idles; the 100× fixture pays the same mechanism
    // for minutes per batch). The exchange moves ~40-byte rows — the
    // draw columns are computed AFTER it — and the draws stay
    // key-derived, so the fan-out cannot change any value (guide §2.2:
    // parallelism of the compute-bound stage should come from the
    // session, not the accident of input file layout).
    val base = src.filter(v.isNotNull).select(
      col(keyCol).cast("string").as("key"),
      unix_micros(col(tsCol)).as("ord"),
      col(rowKeyCol).cast("string").as("k"),
      v.as("value"),
      (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm"))
      .repartition(spark.sparkContext.defaultParallelism)
    val us = base.select(
      col("key") +: col("ord") +: col("k") +: col("value") +: col("wm") +:
        (0 until reps).map(b =>
          graft.ops.StatsOps.bootstrapDraw(col("k"), lit(b), seed, uniform)
            .as(s"__u$b")): _*)
    val ds = us.select(col("key"), col("ord"), col("k"), col("value"),
        array((0 until reps).map(b =>
          graft.ops.StatsOps.poissonWeight(col(s"__u$b")).cast("int")): _*)
          .as("w"),
        col("wm")).as[BootEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BootState, BootGauge](
        OutputMode.Append, timeout) { (key, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(
            BootState(0L, 0.0, Seq.fill(reps)(0.0), Seq.fill(reps)(0L)))
          var n = prev.n
          var sv = prev.sv
          val s = prev.s.toArray
          val c = prev.c.toArray
          rows.toArray.sortBy(e => (e.ord, e.k)).foreach { e =>
            n += 1
            sv += e.value
            var b = 0
            while (b < reps) {
              val wb = e.w(b)
              if (wb > 0) { s(b) += wb * e.value; c(b) += wb }
              b += 1
            }
          }
          state.update(BootState(n, sv, s.toIndexedSeq, c.toIndexedSeq))
          if (ttl)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
          val means = (0 until reps)
            .flatMap(b => if (c(b) == 0L) None else Some(s(b) / c(b))).sorted
          if (n == 0 || means.isEmpty) Iterator.empty
          else {
            val bl = means.length
            val kk = math.floor(alpha / 2.0 * (bl - 1)).toInt
            val mm = means.reduceLeft(_ + _) / bl
            val se =
              if (bl > 1)
                math.sqrt(means.map(m => (m - mm) * (m - mm))
                  .reduceLeft(_ + _) / (bl - 1))
              else 0.0
            Iterator.single(
              BootGauge(key, n, sv / n, means(kk), means(bl - 1 - kk), se))
          }
        }
      }
      .toDF(keyCol, "n", "mean", "boot_lo", "boot_hi", "boot_se")
  }

  /** Input/output/state rows for [[streamingHeavyHitters]]. */
  case class HhEvent(key: String, ord: Long, value: String,
      wm: java.sql.Timestamp)
  case class HhTop(key: String, value: String, mg_count: Long, n_seen: Long)
  case class HhState(keys: Seq[String], counts: Seq[Long], n: Long)

  /** STREAMING HEAVY HITTERS via `flatMapGroupsWithState` — a live
    * per-slice Misra–Gries top-k gauge (the trending-items dashboard):
    * per group a k-bounded candidate buffer fed in arrival order;
    * after every micro-batch the group re-emits its current buffer as
    * `(key, value, mg_count, n_seen)` rows, count-descending. The MG
    * guarantee holds per group at every emission: any value with true
    * frequency > n/(k+1) IS in the buffer, and `mg_count`
    * underestimates the true count by at most n/(k+1) — so the gauge
    * has no false negatives above the frequency bar, ever, with state
    * that never grows past k entries per group (the reason a
    * value-keyed streaming aggregation — whose state is the full
    * distinct-value set — is the wrong shape for an open vocabulary).
    *
    * Honesty split (the [[streamingTwap]] pattern): MG counts are
    * arrival-order-dependent lower bounds — the MONITORING path; the
    * batch [[graft.ops.SketchOps.heavyHitters]] two-pass form (same
    * Misra–Gries core, exact recount behind a semi-join) is the exact
    * path, and the spec pins that every batch-qualifying value is
    * present in the final gauge with `mg_count` inside the MG error
    * band. State per group: ≤ k (value, count) pairs + one counter,
    * hash-partitioned by group at 1000 executors; idle groups
    * TTL-evictable like [[streamingEma]].
    */
  def streamingHeavyHitters(
      events: DataFrame, keyCol: String, valueCol: String, k: Int,
      tsCol: String = null, ordCol: String = "event_id",
      watermarkDelay: String = null, idleTtlMs: Long = -1L): DataFrame = {
    require(k >= 1, s"streamingHeavyHitters: k must be >= 1, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlActive(events, tsCol, watermarkDelay, idleTtlMs)
    val src = if (ttl) events.withWatermark(tsCol, watermarkDelay) else events
    val timeout =
      if (ttl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val ds = src.filter(col(valueCol).isNotNull).select(
      col(keyCol).cast("string").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("string").as("value"),
      (if (ttl) col(tsCol) else lit(null).cast("timestamp")).as("wm"))
      .as[HhEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[HhState, HhTop](
        OutputMode.Append, timeout) { (key, rows, state) =>
        if (ttl && state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(HhState(Nil, Nil, 0L))
          val buf = scala.collection.mutable.LinkedHashMap[String, Long](
            prev.keys.zip(prev.counts): _*)
          var n = prev.n
          rows.toArray.sortBy(e => (e.ord, e.value)).foreach { e =>
            n += 1
            buf.get(e.value) match {
              case Some(c) => buf(e.value) = c + 1
              case None if buf.size < k => buf(e.value) = 1L
              case None =>
                // decrement-all; drop exhausted candidates
                buf.keys.toArray.foreach { kk =>
                  val c = buf(kk) - 1
                  if (c <= 0) buf.remove(kk) else buf(kk) = c
                }
            }
          }
          state.update(HhState(buf.keys.toIndexedSeq,
            buf.values.toIndexedSeq, n))
          if (ttl)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTtlMs)
          buf.toArray.sortBy { case (v, c) => (-c, v) }.iterator
            .map { case (v, c) => HhTop(key, v, c, n) }
        }
      }
      .toDF(keyCol, "value", "mg_count", "n_seen")
  }

  /** STREAM-STREAM interval self-join: attribute each `convType`
    * event to every preceding `touchType` event by the same user
    * within `horizonSec` — the click→purchase attribution join, run
    * continuously. Both sides carry their own watermark, which is
    * what makes this deployable forever: Spark derives a state
    * retention bound from the watermark + the time-range predicate,
    * so each side's join state holds only rows inside
    * `watermark + horizon`, independent of stream age (the
    * stream-stream analog of the typed ops' TTL story). Inner join →
    * append mode; a conversion is emitted once per matching touch
    * (multi-touch attribution — downstream credit models divide it).
    *
    * The SAME code path works on batch frames (watermarks become
    * no-ops), and the spec pins streaming == batch on an identical
    * event set. At 100 TB-scale streams the join keys on `user_id`,
    * so state and shuffle partition by user exactly like the batch
    * range join.
    */
  def streamingAttribution(
      events: DataFrame, touchType: String, convType: String,
      horizonSec: Long, watermark: String,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner or left_outer, got $joinType")
    val touches = events
      .filter(col("event_type") === touchType)
      .select(col("user_id"), col("ts").as("touch_ts"),
        col("event_id").as("touch_id"))
      .withWatermark("touch_ts", watermark)
    val convs = events
      .filter(col("event_type") === convType)
      .select(col("user_id").as("__cu"), col("ts").as("conv_ts"),
        col("event_id").as("conv_id"), col("value").as("conv_value"))
      .withWatermark("conv_ts", watermark)
    // left_outer: a touch whose retention window closes with no
    // matching conversion is emitted ONCE with null conversion
    // columns — the "unattributed reach" stream that an inner join
    // silently drops; emission waits for the watermark to prove no
    // match can still arrive, so late output = watermark + horizon
    touches.join(convs,
        col("user_id") === col("__cu") &&
          col("conv_ts") >= col("touch_ts") &&
          col("conv_ts") <= col("touch_ts") +
            expr(s"INTERVAL $horizonSec seconds"),
        joinType)
      .select(col("user_id"), col("touch_id"), col("touch_ts"),
        col("conv_id"), col("conv_ts"), col("conv_value"))
  }

  /** Drain a streaming DataFrame into an in-memory table synchronously
    * (test/local harness): returns the materialized result.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String): DataFrame =
    runToMemoryMaxState(df, name, outputMode)._1

  /** [[runToMemory]] plus the MAX state rows across the run's progress
    * reports — the bounded-state evidence: for watermarked operators
    * state must track open windows / live keys, never input size, and
    * returning the observed max lets specs and the bench ASSERT that
    * bound instead of just recording it.
    */
  def runToMemoryMaxState(
      df: DataFrame, name: String, outputMode: String): (DataFrame, Long) =
    runToMemoryStats(df, name, outputMode) match { case (t, s, _) => (t, s) }

  /** [[runToMemoryMaxState]] plus the TOTAL rows dropped by the
    * watermark across the run — the late-data evidence: an
    * out-of-order replay can assert exactly how many
    * late-beyond-watermark rows the engine discarded (and therefore
    * that emissions equal the batch twin minus those documented
    * drops), not just that state stayed bounded.
    */
  def runToMemoryStats(
      df: DataFrame, name: String, outputMode: String): (DataFrame, Long, Long) = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ops = q.recentProgress.iterator
      .flatMap(p => Option(p.stateOperators).iterator.flatten).toList
    val maxState = ops.map(_.numRowsTotal).foldLeft(0L)(math.max)
    val dropped = ops.map(_.numRowsDroppedByWatermark).sum
    (df.sparkSession.table(name), maxState, dropped)
  }
}
